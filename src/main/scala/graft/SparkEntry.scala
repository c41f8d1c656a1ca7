package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Relational

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator names (SURVEY.md §2 inventory) to functions
  * `(spark, sfDir) => DataFrame`; `oracleSql` carries the equivalent
  * DuckDB SQL over the same parquet tables with IDENTICAL output column
  * names and ordering.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01PricingSummary(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (Relational.q01PricingSummary _)
  )

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" -> Relational.q01Sql
  )
}
