package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skyline (Pareto-frontier) query over `part`: the parts not
  * dominated on (price ↓, size ↑) — cheaper-or-equal AND
  * bigger-or-equal with one strict inequality dominates.
  *
  * Two-phase distributed skyline (the standard shape from the skyline
  * literature, cf. "Integration of Skyline Queries into Spark SQL",
  * EDBT 2023 — PAPERS.md):
  *   1. local skyline per partition via `mapPartitions` — no shuffle,
  *      shrinks n to the per-partition frontier (the one legitimately
  *      imperative per-partition step, SURVEY's mapPartitions escape
  *      hatch);
  *   2. global pass: a dominance anti-join of the small local-skyline
  *      union against its broadcast self.
  * The result is set-unique (dominance is a strict partial order), so
  * output is deterministic regardless of partitioning.
  */
object Skyline {

  final case class P(p_partkey: Long, p_retailprice: Double, p_size: Int)

  private def dominates(a: P, b: P): Boolean =
    a.p_retailprice <= b.p_retailprice && a.p_size >= b.p_size &&
      (a.p_retailprice < b.p_retailprice || a.p_size > b.p_size)

  def q48(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val parts = Tables.load(spark, sfDir, "part")
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
      .as[P]
    val local = parts.mapPartitions { it =>
      val frontier = scala.collection.mutable.ArrayBuffer.empty[P]
      it.foreach { x =>
        if (!frontier.exists(y => dominates(y, x))) {
          frontier.filterInPlace(y => !dominates(x, y))
          frontier += x
        }
      }
      frontier.iterator
    }
    val l = local.toDF()
    val r = local.toDF().select(col("p_partkey").as("k2"),
      col("p_retailprice").as("price2"), col("p_size").as("size2"))
    l.join(broadcast(r),
        col("price2") <= col("p_retailprice") && col("size2") >= col("p_size") &&
          (col("price2") < col("p_retailprice") || col("size2") > col("p_size")),
        "left_anti")
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
      .orderBy(col("p_partkey"))
  }

  val q48Sql: String =
    """SELECT p_partkey, p_retailprice, p_size
      |FROM part p
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM part q
      |  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
      |    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
      |ORDER BY p_partkey""".stripMargin

  val registry: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q48_skyline", q48 _, Some(q48Sql)))
}
