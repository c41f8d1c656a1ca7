package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Analytics, Capstone, CatalogQuery, Dedup, Events, Relational, Similarity, Skyline, Streaming, Text, TextClassifierEval, TextRetrieval, TextTokenizers}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator names (SURVEY.md §2 inventory) to functions
  * `(spark, sfDir) => DataFrame`; `oracleSql` carries the equivalent
  * DuckDB SQL over the same parquet tables with IDENTICAL output column
  * names and ordering. Entries without an oracle get the driver's
  * weaker rows-only check.
  */
object SparkEntry {

  private def registry: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    Relational.registry ++ Events.registry ++ Dedup.registry ++
      Similarity.registry ++ Text.registry ++ TextRetrieval.registry ++
      TextTokenizers.registry ++ TextClassifierEval.registry ++ Streaming.registry ++
      graft.multimodal.Multimodal.registry ++ Skyline.registry ++
      CatalogQuery.registry ++ Analytics.registry ++ Capstone.registry

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (name, fn, _) => name -> fn }.toMap

  def oracleSql: Map[String, String] =
    registry.collect { case (name, _, Some(sql)) => name -> sql }.toMap
}
