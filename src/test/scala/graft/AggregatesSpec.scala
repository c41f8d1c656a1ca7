package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Approximate aggregates (SURVEY §2.2 aggregation row): sketch-based
  * results are engine-specific, so they are asserted against exact
  * values with tolerance here instead of the cross-engine oracle.
  */
class AggregatesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.hive
  private lazy val li = Tables.load(spark, "/root/testdata/sf0.01", "lineitem")

  test("approx_count_distinct within 5% of exact") {
    val row = li.agg(
      countDistinct(col("l_orderkey")).as("exact"),
      approx_count_distinct(col("l_orderkey")).as("approx")).head()
    val exact = row.getLong(0).toDouble
    val approx = row.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("percentile_approx brackets the exact median") {
    val approx = li.agg(percentile_approx(col("l_quantity"), lit(0.5), lit(1000)))
      .head().getDouble(0)
    val Array(lo, hi) = li.stat.approxQuantile("l_quantity", Array(0.4, 0.6), 0.0)
    assert(approx >= lo && approx <= hi, s"median approx $approx outside [$lo,$hi]")
  }

  test("HLL sketches merge across groups like the partial/final contract") {
    // per-group sketches unioned must approximate the global distinct
    val grouped = li.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_orderkey")).as("d"))
      .agg(sum(col("d"))).head().getLong(0).toDouble
    val global = li.agg(countDistinct(col("l_orderkey"))).head().getLong(0).toDouble
    // flags partition orders only loosely; the summed sketch counts must
    // at least cover the global distinct count
    assert(grouped >= global * 0.95)
  }

  test("q56 sketch aggregates stay inside the error envelope vs exact") {
    // q56 carries its own envelope checks as boolean output columns
    // (so the driver's hash compare sees sketch drift); here: every
    // flag present, every envelope boolean true, exact counts sane
    val rows = queries.Relational.q56(spark, "/root/testdata/sf0.01").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      Seq("hll_orderkey_ok", "hll_partkey_ok", "p50_ok", "p90_ok").foreach { c =>
        assert(r.getAs[Boolean](c), s"${r.getString(0)}: $c false")
      }
      assert(r.getAs[Long]("nd_orderkey") > 0)
      assert(r.getAs[Long]("n") >= r.getAs[Long]("nd_orderkey"))
    }
  }
}
