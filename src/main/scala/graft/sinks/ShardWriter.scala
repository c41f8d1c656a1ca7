package graft.sinks

import org.apache.spark.sql.{DataFrame, functions => F}

/** Size-controlled, key-sorted training-shard output — the layout
  * operator at the end of a data pipeline. Training jobs want shards
  * that are (a) bounded in size so stragglers and OOMs don't track the
  * largest file, (b) globally range-ordered on a key so a shard maps
  * to a contiguous key range, and (c) internally sorted so sequential
  * readers stream in order.
  *
  * Implementation is pure Spark layout control, no custom I/O:
  * `repartitionByRange` gives contiguous, balanced key ranges (range
  * partitioner samples the key distribution — skewed keys still yield
  * ~equal shard sizes), `sortWithinPartitions` orders rows inside each
  * shard at shuffle time (no extra pass), and `maxRecordsPerFile`
  * caps any shard the sampler misjudged. At 100 TB this is one
  * shuffle — the same cost as any global organization of the output.
  */
object ShardWriter {

  /** Writes `df` as range-sharded parquet: ~`targetShards` files,
    * none over `maxRecordsPerFile` rows, each sorted by `keyCol`.
    */
  def writeRangeSharded(df: DataFrame, path: String, keyCol: String,
                        targetShards: Int,
                        maxRecordsPerFile: Long): Unit = {
    require(targetShards >= 1, "targetShards must be >= 1")
    require(maxRecordsPerFile >= 1, "maxRecordsPerFile must be >= 1")
    df.repartitionByRange(targetShards, F.col(keyCol))
      .sortWithinPartitions(F.col(keyCol))
      .write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .parquet(path)
  }
}
