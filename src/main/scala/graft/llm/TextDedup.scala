package graft.llm

import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Parameterized deduplication operators over any document corpus —
  * the library API behind the declared q27–q30 queries (which pin one
  * configuration each against the DuckDB oracle). All operators take
  * (df, idCol, textCol) plus algorithm parameters and return plain
  * DataFrames, so they compose with arbitrary pipelines.
  *
  * Scale designs are documented per operator in
  * [[graft.queries.Dedup]]; thresholds are rationals (num/den) so
  * prefix lengths use exact integer arithmetic.
  */
object TextDedup {

  /** Exact dedup: content-hash grouping with a min-id survivor policy.
    * Output: idCol, text_sha, n_copies, kept.
    */
  def exactDuplicates(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val d = df.select(col(idCol), sha2(col(textCol), 256).as("text_sha"))
    val g = d.groupBy(col("text_sha"))
      .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("keep_id"))
    d.join(g, "text_sha")
      .select(col(idCol), col("text_sha"), col("n_copies"),
        (col(idCol) === col("keep_id")).as("kept"))
  }

  /** Spreads a narrow source across the full shuffle parallelism
    * before a CPU-heavy per-row stage. A small parquet file arrives as
    * ONE input partition, and AQE coalesces by *bytes*, so without an
    * explicit partition count the expensive projection (higher-order
    * shingle/gram lambdas) runs single-threaded regardless of cores.
    * The O(rows) shuffle is noise next to the projection it feeds; the
    * explicit count is honored (not re-coalesced) by AQE.
    */
  private def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sessionState.conf.numShufflePartitions)

  /** Forces a persisted plan to materialize NOW. When a cached subplan
    * fans out into several downstream branches, AQE materializes those
    * branch stages concurrently — and every one of them recomputes the
    * not-yet-populated cache (the cache fills on first completion, but
    * concurrent readers race past it and duplicate the most expensive
    * stage of the whole pipeline). One synchronous count() populates
    * the cache before the fan-out starts.
    */
  private def materialize(df: DataFrame): DataFrame = { df.count(); df }

  /** Per-document distinct word n-gram shingles, poly-hashed:
    * (idCol, hs: sorted array<long>, sz).
    */
  def hashedShingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    GraftFunctions.ensureRegistered(df.sparkSession)
    spread(df).select(col(idCol), split(col(textCol), " ").as("toks"))
      .where(size(col("toks")) >= n)
      .select(col(idCol), array_distinct(expr(
        s"transform(sequence(0, size(toks)-$n), i -> concat_ws(' ', ${(0 until n).map(k => s"toks[i+$k]").mkString(", ")}))"))
        .as("shingles"))
      .select(col(idCol),
        expr("array_sort(array_distinct(transform(shingles, s -> poly_hash(s))))").as("hs"))
      .withColumn("sz", size(col("hs")))
  }

  /** Exact Jaccard near-dup pairs at threshold `tNum/tDen`, via
    * prefix + length filtering (both lossless). Output: d1, d2, jac.
    */
  def jaccardNearDupPairs(df: DataFrame, idCol: String, textCol: String,
                          n: Int = 3, tNum: Int = 3, tDen: Int = 5): DataFrame = {
    require(tNum > 0 && tNum <= tDen, "threshold must be in (0, 1]")
    val sh = materialize(hashedShingles(df, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val ex = sh.select(col(idCol), col("sz"), explode(col("hs")).as("h"))
    val dfreq = ex.groupBy(col("h")).agg(count(lit(1)).as("dfreq"))
    val prefix = ex.join(dfreq, "h")
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("dfreq"), col("h"))))
      .where(col("rnk") <= col("sz") - expr(s"($tNum*sz + ${tDen - 1}) div $tDen") + 1)
      .select(col(idCol), col("h"), col("sz"))
    val cand = prefix.as("a").join(prefix.as("b"),
        col(s"a.h") === col(s"b.h") && col(s"a.$idCol") < col(s"b.$idCol") &&
          col("a.sz") * tDen >= col("b.sz") * tNum &&
          col("b.sz") * tDen >= col("a.sz") * tNum)
      .select(col(s"a.$idCol").as("d1"), col(s"b.$idCol").as("d2")).distinct()
    val s1 = sh.select(col(idCol).as("d1"), col("hs").as("hs1"), col("sz").as("sz1"))
    val s2 = sh.select(col(idCol).as("d2"), col("hs").as("hs2"), col("sz").as("sz2"))
    cand.join(s1, "d1").join(s2, "d2")
      .withColumn("inter", size(array_intersect(col("hs1"), col("hs2"))))
      .withColumn("jac", col("inter") / (col("sz1") + col("sz2") - col("inter")))
      .where(col("jac") >= lit(tNum.toDouble / tDen))
      .select(col("d1"), col("d2"), col("jac"))
  }

  /** MinHash signatures (one-pass UDAF) + LSH band candidates with
    * signature-estimated and exact Jaccard similarity.
    * Output: d1, d2, est_sim, jac. `k` must be `bands * rowsPerBand`.
    */
  def minHashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, k: Int = 12, bands: Int = 4): DataFrame = {
    require(k % bands == 0, "k must be divisible by bands")
    val rows = k / bands
    val minhash = udaf(new graft.functions.MinHashAggregator(k))
    val sh = materialize(hashedShingles(df, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val sig = sh.select(col(idCol), col("sz"), col("hs"), explode(col("hs")).as("x"))
      .groupBy(col(idCol))
      .agg(minhash(col("x")).as("sig"), first(col("sz")).as("sz"),
        first(col("hs")).as("hs"))
    val bandKeyExpr = (0 until rows)
      .map(r => s"cast(sig[band*$rows+$r] as string)").mkString("concat_ws(',', ", ", ", ")")
    val banded = sig.select(col(idCol), col("sig"), col("sz"), col("hs"),
        explode(expr(s"sequence(0, ${bands - 1})")).as("band"))
      .withColumn("bkey", expr(bandKeyExpr))
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("d1"), col(s"b.$idCol").as("d2"),
        col("a.sig").as("sig1"), col("b.sig").as("sig2"),
        col("a.hs").as("hs1"), col("b.hs").as("hs2"),
        col("a.sz").as("sz1"), col("b.sz").as("sz2"))
      .dropDuplicates("d1", "d2")
    cand
      .withColumn("est_sim",
        expr("size(filter(zip_with(sig1, sig2, (x, y) -> x = y), b -> b))") / k.toDouble)
      .withColumn("inter", size(array_intersect(col("hs1"), col("hs2"))))
      .withColumn("jac", col("inter") / (col("sz1") + col("sz2") - col("inter")))
      .select(col("d1"), col("d2"), col("est_sim"), col("jac"))
  }

  /** Connected components over a near-dup pair list: every document in
    * a component gets the component's minimum id as `cluster_id` — the
    * step that turns pairwise matches into dedup groups (keep one doc
    * per cluster). Iterative min-label propagation; the iteration
    * count is bounded by the largest component's diameter — for
    * near-dup graphs that is tiny.
    *
    * Scale shape: ONE Spark job per round. The previous label is
    * carried through the propagation aggregate (self rows tag it, the
    * `min` ignores the neighbor rows' null tag), so convergence
    * detection is a filter over the same materialized result instead
    * of a second join+count job. Each round is `localCheckpoint`ed:
    * the logical plan stays one join deep instead of growing by one
    * join per round (unbounded lineage re-analysis is the classic
    * iterative-algorithm driver bottleneck at scale).
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val edges = pairs.select(col(aCol).as("u"), col(bCol).as("v"))
      .union(pairs.select(col(bCol).as("u"), col(aCol).as("v")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val idType = edges.schema("u").dataType
    // (u, cluster_id) — eagerly checkpointed so every round starts
    // from materialized blocks, not the upstream pair pipeline
    var labels = edges.select(col("u")).distinct()
      .select(col("u"), col("u").as("cluster_id"))
      .localCheckpoint()
    var prev = labels
    var converged = edges.isEmpty
    while (!converged) {
      // each node adopts the min label among itself and its neighbors;
      // the self rows also carry the old label (tagged; neighbor rows
      // contribute null, which min() skips) so one aggregation yields
      // both the new labels and the convergence signal
      val nbr = edges
        .join(labels.select(col("u").as("v"), col("cluster_id")), "v")
        .select(col("u"), col("cluster_id"), lit(null).cast(idType).as("old"))
      val self = labels.select(col("u"), col("cluster_id"),
        col("cluster_id").as("old"))
      val next = nbr.union(self)
        .groupBy(col("u"))
        .agg(min(col("cluster_id")).as("cluster_id"), min(col("old")).as("old"))
        .localCheckpoint(eager = false)
      // single action per round: the full-scan count materializes every
      // checkpoint partition AND yields the convergence signal
      converged = next.where(col("cluster_id") =!= col("old")).count() == 0L
      prev.unpersist(blocking = false)
      prev = next
      labels = next.select(col("u"), col("cluster_id"))
    }
    edges.unpersist(blocking = false)
    labels.select(col("u").as("doc_id"), col("cluster_id"))
  }

  /** SimHash fingerprints (weighted n-gram bits) and near-dup pairs by
    * banded blocking + XOR popcount. Blocking is lossless for
    * `maxHamming < bands`. Output: d1, d2, fp1, fp2, hamming.
    */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String,
                   n: Int = 2, bits: Int = 32, bands: Int = 4,
                   maxHamming: Int = 3): DataFrame = {
    require(maxHamming < bands, "banded blocking is lossless only for hamming < bands")
    require(bits % bands == 0, "bits must be divisible by bands")
    GraftFunctions.ensureRegistered(df.sparkSession)
    val bandBits = bits / bands
    val grams = spread(df).select(col(idCol), split(col(textCol), " ").as("toks"))
      .where(size(col("toks")) >= n)
      .select(col(idCol), explode(expr(
        s"transform(sequence(0, size(toks)-$n), i -> concat_ws(' ', ${(0 until n).map(j => s"toks[i+$j]").mkString(", ")}))")).as("gram"))
      .groupBy(col(idCol), col("gram")).agg(count(lit(1)).as("w"))
      .select(col(idCol), GraftFunctions.polyHash("gram").as("x"), col("w"))
    val fps = grams
      .select(col(idCol), col("x"), col("w"),
        explode(expr(s"sequence(0, ${bits - 1})")).as("j"))
      .groupBy(col(idCol), col("j"))
      .agg(sum(expr("(((x >> j) & 1) * 2 - 1) * w")).as("s"))
      .groupBy(col(idCol))
      .agg(sum(expr("if(s > 0, cast(1 as bigint) << j, 0)")).as("fp"))
    val banded = fps.select(col(idCol), col("fp"),
        explode(expr(s"sequence(0, ${bands - 1})")).as("band"))
      .withColumn("bkey", expr(s"(fp >> (band * $bandBits)) & ${(1L << bandBits) - 1}"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("d1"), col(s"b.$idCol").as("d2"),
        col("a.fp").as("fp1"), col("b.fp").as("fp2")).distinct()
      .withColumn("hamming", expr("bit_count(fp1 ^ fp2)"))
      .where(col("hamming") <= maxHamming)
      .select(col("d1"), col("d2"), col("fp1"), col("fp2"),
        col("hamming").cast("int").as("hamming"))
  }
}
