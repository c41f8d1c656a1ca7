package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-dimensional data layout —
  * the clustering step behind lakehouse `OPTIMIZE ZORDER BY`: rows
  * close in BOTH dimensions get close z-values, so range-sharding on
  * the z-value gives every shard locality in every dimension at once,
  * and predicates on either dimension prune shards instead of
  * scanning all of them.
  *
  * The interleave is a pure in-row bit permutation (codegen'd shifts,
  * no UDF): bit `i` of `x` lands at position `2i`, bit `i` of `y` at
  * `2i+1`. Pair with `graft.sinks.ShardWriter` (range-shard on the
  * z-value) to materialize the layout; at 100 TB the payoff is scan
  * pruning on the second dimension that a single-column sort cannot
  * give.
  */
object ZOrder {

  /** 2-D Morton code of two non-negative integer columns, `bits` low
    * bits each (default 16 → a 32-bit z-value). */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val xs = x.cast("long")
    val ys = y.cast("long")
    (0 until bits).map { i =>
      (shiftleft(shiftrightunsigned(xs, i) % 2, 2 * i) +
        shiftleft(shiftrightunsigned(ys, i) % 2, 2 * i + 1)): Column
    }.reduce(_ + _)
  }

  /** Adds `z` and a `shard` id taking the top `log2(shards)` z-bits —
    * the range-shard assignment for a 2^k shard count. */
  def shardByZ(df: DataFrame, x: Column, y: Column,
               bits: Int = 16, shardBits: Int = 6): DataFrame = {
    require(shardBits >= 1 && shardBits <= 2 * bits, "bad shardBits")
    df.withColumn("z", zValue(x, y, bits))
      .withColumn("shard",
        shiftrightunsigned(col("z"), 2 * bits - shardBits).cast("int"))
  }
}
