package graft.queries

import graft.{Num, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TPC-H-flavoured relational inventory over the driver testdata.
  *
  * Every query is deterministic (total ORDER BY) and numerically
  * oracle-safe (decimal-cast sums, see [[graft.Num]]). Each has a
  * matching DuckDB oracle in [[graft.SparkEntry.oracleSql]] with
  * identical output column names.
  */
object Relational {

  /** TPC-H Q1: pricing summary report.
    * Scan + filter (pushed to parquet) + hash aggregate with partial
    * (map-side) aggregation — the canonical "survives 100×" shape: one
    * shuffle of 4 grouping keys regardless of input size.
    */
  def q01PricingSummary(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Num.dsum(col("l_quantity")).as("sum_qty"),
        Num.dsum(col("l_extendedprice")).as("sum_base_price"),
        Num.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        Num.davg(col("l_quantity")).as("avg_qty"),
        Num.davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q01Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${Num.dsumSql("l_quantity")} AS sum_qty,
       |  ${Num.dsumSql("l_extendedprice")} AS sum_base_price,
       |  ${Num.dsumSql("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
       |  ${Num.davgSql("l_quantity")} AS avg_qty,
       |  ${Num.davgSql("l_discount")} AS avg_disc,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin
}
