package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE-style upsert as a distributed operator: `updates` rows
  * override `base` rows with the same key (WHEN MATCHED → UPDATE),
  * keys only in `updates` are inserts (WHEN NOT MATCHED → INSERT),
  * keys only in `base` pass through.
  *
  * Shape: one full-outer shuffle join on the key with whole-row
  * `struct` payloads and a single `coalesce` — no per-column coalesce
  * list to drift out of sync with the schema. At 100 TB this is the
  * snapshot-maintenance shuffle; with both sides bucketed by the key
  * the exchange disappears entirely (see `BucketingSpec`), which
  * is how a nightly 100 TB upsert avoids re-shuffling the snapshot.
  */
object Merge {

  /** Both inputs must share the schema; `key` must be unique per side. */
  def upsert(base: DataFrame, updates: DataFrame, key: String): DataFrame = {
    require(base.columns.sameElements(updates.columns),
      s"upsert requires identical schemas, got ${base.columns.mkString(",")} vs ${updates.columns.mkString(",")}")
    val cols = base.columns.map(col).toIndexedSeq
    val b = base.select(col(key).as("__k"), struct(cols: _*).as("__b"))
    val u = updates.select(col(key).as("__k"), struct(cols: _*).as("__u"))
    b.join(u, Seq("__k"), "full_outer")
      .select(coalesce(col("__u"), col("__b")).as("__m"))
      .select(col("__m.*"))
  }
}
