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
      approx_count_distinct(col("l_orderkey")).as("approx")).head
    val exact = row.getLong(0).toDouble
    val approx = row.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("percentile_approx brackets the exact median") {
    val approx = li.agg(percentile_approx(col("l_quantity"), lit(0.5), lit(1000)))
      .head.getDouble(0)
    val Array(lo, hi) = li.stat.approxQuantile("l_quantity", Array(0.4, 0.6), 0.0)
    assert(approx >= lo && approx <= hi, s"median approx $approx outside [$lo,$hi]")
  }

  test("HLL sketches merge across groups like the partial/final contract") {
    // per-group sketches unioned must approximate the global distinct
    val grouped = li.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_orderkey")).as("d"))
      .agg(sum(col("d"))).head.getLong(0).toDouble
    val global = li.agg(countDistinct(col("l_orderkey"))).head.getLong(0).toDouble
    // flags partition orders only loosely; the summed sketch counts must
    // at least cover the global distinct count
    assert(grouped >= global * 0.95)
  }

  test("q56 sketch aggregates stay inside the error envelope vs exact") {
    val approx = queries.Relational.q56(spark, "/root/testdata/sf0.01")
      .collect().map(r => r.getString(0) -> r).toMap
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("orderkeys"),
        countDistinct(col("l_partkey")).as("partkeys"),
        expr("percentile(l_extendedprice, array(0.5, 0.9))").as("ps"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (flag, e) =>
      val a = approx(flag)
      // HLL++ at default rsd 0.05: generous 3-sigma envelope
      assert(math.abs(a.getLong(1) - e.getLong(1)).toDouble / e.getLong(1) < 0.15)
      assert(math.abs(a.getLong(2) - e.getLong(2)).toDouble / e.getLong(2) < 0.15)
      // approx_percentile at accuracy 10000 on ~200k rows: ±2% of value
      val ap = Seq(a.getDouble(3), a.getDouble(4))
      val ep = e.getSeq[Double](3)
      ap.zip(ep).foreach { case (av, ev) =>
        assert(math.abs(av - ev) / ev < 0.02, s"$flag: approx $av vs exact $ev")
      }
      assert(a.getLong(5) == e.getLong(4))
    }
  }
}
