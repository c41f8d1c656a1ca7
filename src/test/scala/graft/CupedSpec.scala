package graft

import org.scalatest.funsuite.AnyFunSuite

/** Property pins for q177 — CUPED variance-reduced experiment
  * readout. On the real sf0.001 events: the adjusted per-user metric
  * must not have HIGHER variance than the raw one (the operator's
  * whole point — θ is the least-squares minimizer, so var(y_adj) =
  * var(y)·(1−ρ²) ≤ var(y)), and the per-variant CUPED means must
  * stay finite (the zero-variance θ guard).
  */
class CupedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.hive

  test("CUPED adjustment never increases variance; means stay finite") {
    import org.apache.spark.sql.functions._
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val perUser = ev
      .withColumn("vc", expr("CAST(round(value * 100) AS BIGINT)"))
      .groupBy(col("user_id"))
      .agg(
        sum(when(dayofmonth(col("ts")) <= 15, col("vc")).otherwise(0L)).as("x"),
        sum(when(dayofmonth(col("ts")) > 15, col("vc")).otherwise(0L)).as("y"))
      .collect().map(r => (r.getLong(1).toDouble, r.getLong(2).toDouble))
    val n = perUser.length.toDouble
    val (xs, ys) = (perUser.map(_._1), perUser.map(_._2))
    val (xb, yb) = (xs.sum / n, ys.sum / n)
    val varx = xs.map(v => (v - xb) * (v - xb)).sum / n
    val vary = ys.map(v => (v - yb) * (v - yb)).sum / n
    val cov = perUser.map { case (x, y) => (x - xb) * (y - yb) }.sum / n
    assume(varx > 0 && vary > 0)
    val theta = cov / varx
    val adj = perUser.map { case (x, y) => y - theta * (x - xb) }
    val ab = adj.sum / n
    val vara = adj.map(v => (v - ab) * (v - ab)).sum / n
    assert(vara <= vary * (1.0 + 1e-12))

    val out = graft.queries.Events.q177(spark, "/root/testdata/sf0.001").collect()
    assert(out.length === 2)
    out.foreach { r =>
      assert(!r.getDouble(3).isNaN && !r.getDouble(3).isInfinite) // mean_cuped
      assert(!r.getDouble(4).isNaN && !r.getDouble(4).isInfinite) // theta
    }
  }
}
