package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._

/** Skyline (Pareto-frontier) operator: the rows not dominated on a set
  * of minimize/maximize dimensions — dominance means at-least-as-good
  * on every dimension and strictly better on one.
  *
  * Two-phase distributed shape (cf. "Integration of Skyline Queries
  * into Spark SQL", EDBT 2023 — PAPERS.md):
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

  /** Generic Pareto frontier of `df` on numeric dimension columns
    * (schema preserved). `minimize` dims prefer smaller values,
    * `maximize` dims larger.
    */
  def pareto(df: DataFrame, minimize: Seq[String], maximize: Seq[String]): DataFrame = {
    require(minimize.nonEmpty || maximize.nonEmpty, "need at least one dimension")
    val schema = df.schema
    val minIdx = minimize.map(schema.fieldIndex).toArray
    val maxIdx = maximize.map(schema.fieldIndex).toArray

    def dim(r: Row, i: Int): Double = r.get(i) match {
      case n: Number => n.doubleValue()
      case other => throw new IllegalArgumentException(
        s"skyline dimension ${schema(i).name} must be numeric, got $other")
    }
    // a dominates b: ≤ on every minimized dim, ≥ on every maximized
    // dim, with at least one strict inequality
    def dominates(a: Row, b: Row): Boolean = {
      var strict = false
      var i = 0
      while (i < minIdx.length) {
        val (x, y) = (dim(a, minIdx(i)), dim(b, minIdx(i)))
        if (x > y) return false
        if (x < y) strict = true
        i += 1
      }
      i = 0
      while (i < maxIdx.length) {
        val (x, y) = (dim(a, maxIdx(i)), dim(b, maxIdx(i)))
        if (x < y) return false
        if (x > y) strict = true
        i += 1
      }
      strict
    }

    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      ExpressionEncoder(RowEncoder.encoderFor(schema))
    val local = df.mapPartitions { it =>
      val frontier = scala.collection.mutable.ArrayBuffer.empty[Row]
      it.foreach { x =>
        if (!frontier.exists(y => dominates(y, x))) {
          frontier.filterInPlace(y => !dominates(x, y))
          frontier += x
        }
      }
      frontier.iterator
    }

    // global dominance anti-join over the (small) local-skyline union
    val right = local.toDF(schema.fieldNames.toIndexedSeq.map("__r_" + _): _*)
    val minConds = minimize.map(c => col(s"__r_$c") <= col(c))
    val maxConds = maximize.map(c => col(s"__r_$c") >= col(c))
    val strict = (minimize.map(c => col(s"__r_$c") < col(c)) ++
      maximize.map(c => col(s"__r_$c") > col(c))).reduce(_ || _)
    val cond = (minConds ++ maxConds).reduce(_ && _) && strict
    local.toDF().join(broadcast(right), cond, "left_anti")
  }

  def q48(spark: SparkSession, sfDir: String): DataFrame =
    pareto(
      Tables.load(spark, sfDir, "part")
        .select(col("p_partkey"), col("p_retailprice"), col("p_size")),
      minimize = Seq("p_retailprice"), maximize = Seq("p_size"))
      .orderBy(col("p_partkey"))

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
