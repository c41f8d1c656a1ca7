package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Contiguous global ranking without a single-partition window.
  *
  * `row_number() OVER (ORDER BY …)` with no PARTITION BY moves every
  * row to one partition — the classic scale cliff. This operator
  * computes the same contiguous 1..n rank fully partition-parallel:
  *
  *   1. range-repartition on the sort key (Spark's parallel sort
  *      layout: equal keys co-locate, partitions cover disjoint key
  *      ranges in order);
  *   2. per-partition `row_number` (parallel, no data movement);
  *   3. per-partition row counts → prefix-sum offsets (a partition-
  *      count-sized table, window-scanned on the driver-side scale of
  *      hundreds of rows, never data rows);
  *   4. global rank = partition offset + local row number.
  *
  * The range-partitioned frame is `localCheckpoint`ed before step 2:
  * range boundaries come from sampling, so two lazy evaluations of the
  * same plan could otherwise disagree on partition membership between
  * the offsets pass and the join-back.
  *
  * The total order must be deterministic — pass a tie-breaking unique
  * column last in `sortCols`.
  */
object GlobalRank {

  /** Adds `rankCol` (bigint, contiguous from 1) ranking by `sortCols`. */
  def withGlobalRank(df: DataFrame, sortCols: Seq[Column], rankCol: String): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(parts, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val local = ranged.withColumn("__rn",
      row_number().over(Window.partitionBy(col("__pid")).orderBy(sortCols: _*)))
    val offsets = ranged.groupBy(col("__pid")).agg(count(lit(1)).as("__cnt"))
      .withColumn("__offset",
        coalesce(sum(col("__cnt")).over(
          Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__pid"), col("__offset"))
    local.join(broadcast(offsets), "__pid")
      .withColumn(rankCol, (col("__offset") + col("__rn")).cast("long"))
      .drop("__pid", "__rn", "__offset")
  }
}
