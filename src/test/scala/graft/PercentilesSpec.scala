package graft

import graft.operators.Percentiles
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.operators.Percentiles]] must be bit-identical to Spark's
  * built-in `percentile()` — it exists to reproduce that result
  * WITHOUT the per-group value-map buffer, so equality is exact
  * (== on doubles), not approximate.
  */
class PercentilesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.hive
  private lazy val li = Tables.load(spark, "/root/testdata/sf0.01", "lineitem")

  private val ps = Seq("p10" -> 0.10, "p25" -> 0.25, "p50" -> 0.50,
    "p66" -> 0.66, "p90" -> 0.90, "p100" -> 1.0, "p0" -> 0.0)

  private def assertBitEqual(df: org.apache.spark.sql.DataFrame,
                             groupCol: String, valCol: String): Unit = {
    val ours = Percentiles.exactInterpolated(df, groupCol, col(valCol), ps)
      .collect().map(r => r.get(0) -> r).toMap
    val builtin = df.groupBy(col(groupCol))
      .agg(ps.map { case (n, p) => expr(s"percentile($valCol, $p)").as(n) }.head,
        ps.tail.map { case (n, p) => expr(s"percentile($valCol, $p)").as(n) }: _*)
      .collect().map(r => r.get(0) -> r).toMap
    assert(ours.keySet == builtin.keySet)
    ours.foreach { case (g, r) =>
      val b = builtin(g)
      ps.indices.foreach { i =>
        val x = r.getDouble(i + 1)
        val y = b.getDouble(i + 1)
        assert(java.lang.Double.doubleToLongBits(x) ==
          java.lang.Double.doubleToLongBits(y),
          s"group $g ${ps(i)._1}: ours $x != percentile() $y")
      }
    }
  }

  test("bit-identical to percentile() on a discrete column") {
    assertBitEqual(li, "l_returnflag", "l_quantity")
  }

  test("bit-identical to percentile() on a near-continuous column") {
    assertBitEqual(li, "l_returnflag", "l_extendedprice")
  }

  test("bit-identical on adversarial groups: singletons, ties, tiny") {
    import spark.implicits._
    val df = Seq(
      ("single", 42.5), ("pair", 1.0), ("pair", 2.0),
      ("ties", 3.0), ("ties", 3.0), ("ties", 3.0), ("ties", 7.0),
      ("neg", -5.5), ("neg", -1.25), ("neg", 0.0), ("neg", 8.75)
    ).toDF("g", "v")
    assertBitEqual(df, "g", "v")
  }

  test("plan has no unbounded per-group buffer (no Percentile aggregate)") {
    val plan = Percentiles.exactInterpolated(li, "l_returnflag",
      col("l_quantity"), Seq("p50" -> 0.5))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("percentile("), s"built-in percentile leaked in:\n$plan")
  }
}
