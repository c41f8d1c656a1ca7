package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sweep-line interval concurrency: given half-open spans
  * `[start_s, end_s)`, the maximum number of simultaneously-open spans
  * within each bucket (e.g. day).
  *
  * The classic single-machine form sorts ALL ±1 boundary points by
  * time and takes a running sum — one global sort, one partition, dead
  * at scale. This operator decomposes it into the two-level prefix sum
  * (same shape as [[Percentiles]]): points carry their bucket, each
  * bucket's running sum is computed under a bucket-partitioned window,
  * and the carry-in (spans still open at bucket start) is the
  * cumulative sum of per-bucket delta totals over the tiny bucket
  * dimension. Every step is exact integer arithmetic; the only
  * non-bucket-parallel work is the prefix over |buckets| rows.
  *
  * Tie semantics: at equal time an end (−1) applies before a start
  * (+1) — half-open intervals; two spans touching end-to-start never
  * count as concurrent.
  */
object Sweep {

  /** @param spans   DataFrame with long columns `start_s` < `end_s`
    * @param bucketOf maps a point-time column to its bucket (e.g.
    *                 `s => to_date(timestamp_seconds(s))`)
    * @return one row per bucket: `bucket`, `max_concurrent` — the max
    *         over points INSIDE the bucket (a bucket with no boundary
    *         points does not appear; its concurrency is constant and
    *         equals the next bucket's carry-in)
    */
  def maxConcurrent(spans: DataFrame, bucketOf: Column => Column): DataFrame = {
    val points = spans
      .select(col("start_s").as("t"), lit(1L).as("delta"))
      .union(spans.select(col("end_s").as("t"), lit(-1L).as("delta")))
      .withColumn("bucket", bucketOf(col("t")))
    // within-bucket running sum; ends sort before starts at equal t
    val inBucket = Window.partitionBy(col("bucket"))
      .orderBy(col("t"), col("delta"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val perPoint = points
      .withColumn("running_in_bucket", sum(col("delta")).over(inBucket))
    // carry-in per bucket: cumulative total delta of all prior buckets
    val perBucket = points.groupBy(col("bucket"))
      .agg(sum(col("delta")).as("bucket_delta"))
    val carryW = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = perBucket
      .withColumn("carry", coalesce(sum(col("bucket_delta")).over(carryW), lit(0L)))
      .select(col("bucket"), col("carry"))
    perPoint
      .join(broadcast(carries), "bucket")
      .groupBy(col("bucket"))
      .agg(max(col("carry") + col("running_in_bucket")).as("max_concurrent"))
  }
}
