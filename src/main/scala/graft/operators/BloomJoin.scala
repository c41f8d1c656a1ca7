package graft.operators

import graft.functions.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-prefiltered join — the runtime-filter pattern for the regime
  * where the build side's key set is too large to broadcast as rows
  * but its membership fits in a few MB of bits.
  *
  * Shape: one aggregation folds the build side's keys into an
  * `array<bigint>` bitset ([[graft.functions.BloomBuildAgg]], task-
  * local OR + partial merge); the single-row bitset is broadcast onto
  * the probe side (a broadcast nested-loop join of one row — free) and
  * probed inside whole-stage codegen
  * ([[graft.functions.BloomMightContain]]) BEFORE the probe side's
  * shuffle for the exact join. At 100 TB this is the difference
  * between shuffling every fact row and shuffling only rows whose key
  * probably matches: false positives (tunable via bits-per-key) cost
  * only wasted shuffle, false negatives are impossible, so the final
  * equi-join keeps exact semantics — which is also why the oracle for
  * a prefiltered join is the PLAIN join SQL.
  *
  * Spark's own `spark.sql.optimizer.runtime.bloomFilter` applies the
  * same idea automatically when stats justify it; this operator is the
  * explicit, stats-independent form with a pluggable key expression.
  */
object BloomJoin {

  /** Returns `probe` reduced to rows whose `probeKey` is probably in
    * `build`'s `buildKey` set (no false negatives). */
  def prefilter(probe: DataFrame, build: DataFrame,
                probeKey: String, buildKey: String,
                numBits: Int = 1 << 20, numHashes: Int = 5): DataFrame = {
    GraftFunctions.ensureRegistered(probe.sparkSession)
    val bloom = build.agg(
      expr(s"bloom_build(cast($buildKey as bigint), $numBits, $numHashes)")
        .as("__bloom"))
    probe.crossJoin(broadcast(bloom))
      .where(expr(s"bloom_contains(__bloom, cast($probeKey as bigint), $numHashes)"))
      .drop("__bloom")
  }

  /** Bloom-prefiltered inner equi-join: exact results, pre-shuffled
    * probe side reduced by the build side's key membership. */
  def join(probe: DataFrame, build: DataFrame,
           probeKey: String, buildKey: String,
           numBits: Int = 1 << 20, numHashes: Int = 5): DataFrame =
    prefilter(probe, build, probeKey, buildKey, numBits, numHashes)
      .join(build, col(probeKey) === col(buildKey))
}
