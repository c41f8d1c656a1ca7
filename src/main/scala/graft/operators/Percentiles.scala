package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe exact interpolated percentiles.
  *
  * Spark's built-in `percentile()` buffers a value→count map *per
  * group inside one aggregation buffer* and sorts it on the driver
  * side of the final merge — unbounded state that makes a 100 TB
  * group a single-reducer OOM. This operator computes the identical
  * result through distributed relational steps with bounded
  * per-reducer state:
  *
  *   1. histogram: `GROUP BY (group, value)` — the only state per
  *      reducer is one row per distinct value, hash-partitioned over
  *      the cluster, never a per-group in-memory map;
  *   2. cumulative rank: a prefix-sum window over the (small)
  *      per-group distinct-value histogram;
  *   3. lookup: the value covering sorted position `i` (0-based) is
  *      the minimum value whose cumulative count ≥ i+1 — a
  *      conditional `min` aggregate, no sort of raw rows;
  *   4. interpolation: Spark's own formula
  *      (`PercentileBase.getPercentile`): for `pos = p·(n-1)`,
  *      `lower = floor(pos)`, `higher = ceil(pos)` the result is
  *      `lowerKey` when `lower == higher` or the two keys are equal,
  *      else `(higher-pos)·lowerKey + (pos-lower)·higherKey` — the
  *      same double arithmetic in the same order, so results are
  *      bit-identical to `percentile()` (asserted in
  *      `PercentilesSpec`).
  *
  * The remaining scale assumption is that each group's *distinct
  * value* histogram fits a window partition — true for bounded
  * domains (quantities, scores, prices at fixed precision); for
  * genuinely continuous columns the approximate sketch
  * (`approx_percentile`) is the scale path.
  */
object Percentiles {

  /** Exact interpolated percentiles of `valCol` per `groupCol`.
    *
    * @param ps  (outputColumn, percentage) pairs, 0 ≤ p ≤ 1
    * @return one row per group: groupCol, ps..., n (group row count)
    */
  def exactInterpolated(df: DataFrame, groupCol: String, valCol: Column,
                        ps: Seq[(String, Double)]): DataFrame = {
    val h = df.groupBy(col(groupCol), valCol.cast("double").as("v"))
      .agg(count(lit(1)).as("c"))
    val cum = h
      .withColumn("cum", sum(col("c")).over(
        Window.partitionBy(col(groupCol)).orderBy(col("v"))))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col(groupCol))))
    def pos(p: Double): Column = lit(p) * (col("n") - 1).cast("double")
    val lookups = ps.flatMap { case (name, p) =>
      val lower = floor(pos(p))
      val higher = ceil(pos(p))
      Seq(min(when(col("cum") >= lower + 1, col("v"))).as(s"__${name}_vl"),
        min(when(col("cum") >= higher + 1, col("v"))).as(s"__${name}_vh"))
    } :+ max(col("n")).as("n")
    val looked = cum.groupBy(col(groupCol)).agg(lookups.head, lookups.tail: _*)
    val interpolated = ps.foldLeft(looked) { case (d, (name, p)) =>
      val vl = col(s"__${name}_vl")
      val vh = col(s"__${name}_vh")
      val lower = floor(pos(p))
      val higher = ceil(pos(p))
      d.withColumn(name,
        when(lower === higher || vl === vh, vl)
          .otherwise((higher.cast("double") - pos(p)) * vl +
            (pos(p) - lower.cast("double")) * vh))
    }
    interpolated.select(col(groupCol) +: ps.map(p => col(p._1)) :+ col("n"): _*)
  }
}
