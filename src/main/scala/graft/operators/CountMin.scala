package graft.operators

import graft.functions.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-Min sketch — the mergeable point-frequency estimator
  * (Cormode & Muthukrishnan, "An improved data stream summary: the
  * count-min sketch and its applications", J. Algorithms 2005). A d×w
  * counter grid; every occurrence of a term increments one counter
  * per row (bucket = h_r(term) mod w), and a term's estimate is the
  * MIN over its d counters — an overestimate by construction (other
  * terms can only ADD to a counter, never subtract), within εN with
  * probability 1−δ at w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.
  *
  * Where it sits in the engine's sketch family: HLL (q56/q78) answers
  * distinct-count, Misra–Gries ([[graft.functions.FreqItemsAgg]],
  * q85) answers "which terms are heavy" with a candidate set that
  * needs an exact re-count pass, CMS answers POINT frequency for any
  * term with no second pass and no per-term state — the grid is
  * O(d·w) regardless of cardinality.
  *
  * Scale design (100 TB lens): a sketch is one aggregation to d·w
  * cells — partial aggregation does the map-side combine, the shuffle
  * moves at most partitions×d·w cell rows, and the grid itself is a
  * few KB however large the corpus. Sketches MERGE BY CELL-WISE
  * ADDITION (the linearity that makes them the distributed/streaming
  * counter of choice): per-partition, per-day, or per-stream-batch
  * partials sum to exactly the sketch of the union, so history is
  * never rescanned — [[merge]] of per-day sketches is bit-identical
  * to one global build, the q78/q87 re-aggregation discipline.
  *
  * Hashes are the engine's portable [[graft.functions.PolyHash]] over
  * `"r:term"` (one independent function per grid row by prefix
  * salting), so the grid — and therefore every estimate — is exactly
  * reproducible by any SQL engine: no sampling, no RNG, no
  * platform-dependent hash.
  */
object CountMin {

  /** Per-group d×w sketch grids: one pass over `df`, output
    * (`grpCols`*, r, b, c) — the count of `termCol` occurrences
    * hashing to bucket `b` on grid row `r` within each group. Empty
    * cells are absent (sparse form); [[merge]]/[[estimates]] treat
    * absent as zero. `grpCols` empty builds one global grid.
    */
  def sketch(df: DataFrame, termCol: String, d: Int, w: Int,
             grpCols: Seq[String] = Nil): DataFrame = {
    require(d >= 1 && w >= 2, s"need d >= 1 rows and w >= 2 buckets; got d=$d w=$w")
    GraftFunctions.ensureRegistered(df.sparkSession)
    val keyed = df
      .select((grpCols.map(col) :+ col(termCol).cast("string").as("t")): _*)
      .withColumn("r", explode(sequence(lit(0), lit(d - 1))))
      .withColumn("b", pmod(
        call_function("poly_hash",
          concat(col("r").cast("string"), lit(":"), col("t"))), lit(w.toLong)))
    keyed.groupBy((grpCols.map(col) :+ col("r")) :+ col("b"): _*)
      .agg(count(lit(1)).as("c"))
  }

  /** Cell-wise addition of per-group sketch grids into one grid —
    * CMS linearity: merge(sketch(A), sketch(B)) = sketch(A ∪ B)
    * exactly, whatever the grouping that produced the partials.
    * Output: (r, b, c). */
  def merge(sketches: DataFrame): DataFrame =
    sketches.groupBy(col("r"), col("b")).agg(sum(col("c")).as("c"))

  /** Point-frequency estimates for `terms` (a 1-column frame of
    * distinct terms) against a merged grid: est = MIN over the d grid
    * rows of the term's cell. Terms join the d·w-cell grid on (r, b)
    * — the grid side is broadcast-sized by construction. A term none
    * of whose cells exist in the sparse grid was never observed;
    * inner-joining keeps est for observed terms only (an absent cell
    * for an OBSERVED term is impossible — its own increments are in
    * every row). Output: (term string, est long). */
  def estimates(grid: DataFrame, terms: DataFrame, termCol: String,
                d: Int, w: Int): DataFrame = {
    GraftFunctions.ensureRegistered(terms.sparkSession)
    val probes = terms
      .select(col(termCol).cast("string").as("term")).distinct()
      .withColumn("r", explode(sequence(lit(0), lit(d - 1))))
      .withColumn("b", pmod(
        call_function("poly_hash",
          concat(col("r").cast("string"), lit(":"), col("term"))), lit(w.toLong)))
    probes.join(broadcast(grid), Seq("r", "b"))
      .groupBy(col("term"))
      .agg(min(col("c")).as("est"))
  }

  // ------------------------------------------------------------------
  // Persisted grid store with streaming incremental maintenance
  // ------------------------------------------------------------------

  /** Absorbs one batch into a persisted grid store at `store`: the
    * batch's d×w grid lands under `grids/` — with `batchId` set (the
    * `foreachBatch` id), idempotently in `grids/batch_<id>/` guarded
    * by the `_SUCCESS` marker (the q171/ANN-store replay discipline:
    * a replayed micro-batch whose subdirectory already committed
    * skips the write, so counts are exactly-once). History is never
    * read, let alone rescanned — CMS linearity means absorbing a
    * batch is writing its own grid.
    */
  def appendBatchGrid(batch: DataFrame, termCol: String, d: Int, w: Int,
                      store: String, batchId: Option[Long] = None): Unit = {
    val spark = batch.sparkSession
    val g = sketch(batch, termCol, d, w)
    batchId match {
      case Some(id) =>
        val sub = s"$store/grids/batch_$id"
        val success = new org.apache.hadoop.fs.Path(s"$sub/_SUCCESS")
        val fs = success.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(success))
          g.write.mode("overwrite").parquet(sub)
      case None =>
        g.write.mode("append").parquet(s"$store/grids")
    }
  }

  /** The store's merged grid: every persisted partial summed
    * cell-wise — equal to the one-shot grid over everything absorbed,
    * whatever the batch boundaries were. */
  def readMergedGrid(spark: org.apache.spark.sql.SparkSession,
                     store: String): DataFrame =
    merge(graft.llm.TextDedup.readStore(spark, s"$store/grids"))

  /** Folds the per-batch partials into one merged grid file-set
    * (write-then-swap, the shared store discipline). UNLIKE the
    * row-granular stores (dedup signatures, ANN codes), a grid store
    * has no per-row identity to self-heal on: compacting flattens the
    * per-batch `_SUCCESS` markers, so a micro-batch replayed AFTER
    * its directory was compacted away would double-count. Two things
    * make this safe in practice: the sprawl is d·w cells per batch
    * (not corpus-sized), so compaction is a rare maintenance action,
    * not a per-cycle need — and it must run only once the stream's
    * checkpoint has committed past every absorbed batch (between
    * runs, not inside `foreachBatch`), which is when replays can no
    * longer occur. */
  def compactGridStore(spark: org.apache.spark.sql.SparkSession,
                       store: String): Unit = {
    if (!graft.llm.TextDedup.storeNonEmpty(spark, s"$store/grids")) return
    graft.llm.TextDedup.compactSwap(spark, s"$store/grids",
      readMergedGrid(spark, store).coalesce(1))
  }
}
