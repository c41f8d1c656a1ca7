package graft.llm

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The operators composed as one training-data cleaning pipeline:
  * language-ID → quality gate → reproducible sample → near-dup
  * clustering → survivor fingerprints. Asserts stage-by-stage
  * cardinality behavior and full-pipeline determinism.
  */
class PipelineSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.hive
  private lazy val docs = Tables.load(spark, "/root/testdata/sf0.01", "documents")

  private def runPipeline() = {
    val enriched = TextStats.withSampleBucket(
      TextStats.withQualityScore(
        TextStats.withPredictedLanguage(docs, "text",
          Seq("de" -> Seq("der", "die", "das"), "en" -> Seq("the", "a", "of"))),
        "text", Seq("the", "a", "of", "der", "die")),
      "text", buckets = 100)
    val gated = enriched.where(col("score") >= 0.4 && col("sample_bucket") < 80)
    val pairs = TextDedup.jaccardNearDupPairs(gated, "doc_id", "text")
    val clusters = TextDedup.connectedComponents(pairs, "d1", "d2")
    val survivors = gated.join(
      clusters.where(col("doc_id") =!= col("cluster_id")), Seq("doc_id"), "left_anti")
    val fingerprinted = TextStats.withWinnowStats(survivors, "text")
    (enriched, gated, survivors, fingerprinted)
  }

  test("stages gate monotonically and keep one survivor per dup cluster") {
    val (enriched, gated, survivors, fingerprinted) = runPipeline()
    val nAll = enriched.count()
    val nGated = gated.count()
    val nSurvivors = survivors.count()
    assert(nAll == 500)
    assert(nGated < nAll && nGated > 0, s"quality+sample gate kept $nGated")
    assert(nSurvivors <= nGated)
    assert(fingerprinted.count() <= nSurvivors) // too-short docs drop
    // every enrichment column made it through
    assert(Seq("predicted", "score", "sample_bucket", "ws")
      .forall(fingerprinted.columns.contains))
    // no near-dup pair survives intact among survivors
    val leftoverPairs = TextDedup.jaccardNearDupPairs(survivors, "doc_id", "text").count()
    assert(leftoverPairs == 0, s"$leftoverPairs near-dup pairs survived dedup")
  }

  test("dedup-against-history reads the store, not history text, and matches the self-join") {
    val s = spark
    import s.implicits._
    val store = java.nio.file.Files
      .createTempDirectory("graft_sigstore_spec").toString
    // history ids 1..6 (< 10), batch ids 11..13; doc 11 duplicates doc 1,
    // doc 12 is a near-dup of doc 2, doc 13 matches nothing
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val hist = Seq(
      (1L, base), (2L, base + " extra tail words here"),
      (3L, "completely different text about spark catalyst plans and shuffles"),
      (4L, "yet another unrelated document body with enough words to shingle"),
      (5L, "five six seven eight nine ten eleven twelve thirteen fourteen"),
      (6L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (11L, base), (12L, base + " extra tail words"),
      (13L, "nothing in common with any history document at all frankly"))
      .toDF("doc_id", "text")
    TextDedup.writeSignatureStore(hist, "doc_id", "text", store)
    // the store carries no text — signatures suffice for the next run
    val storeDf = s.read.parquet(store)
    assert(storeDf.columns.toSet == Set("doc_id", "sz", "hs", "sig"))
    assert(storeDf.count() == 6)
    val inc = TextDedup.dedupAgainstStore(batch, "doc_id", "text", store)
    // plan-level incrementality: the history side is a parquet scan of
    // the store path; history TEXT is nowhere in the plan
    val plan = inc.queryExecution.executedPlan.toString
    assert(plan.contains(new java.io.File(store).getName),
      "history side must scan the signature store")
    val got = inc.collect().map(r =>
      (r.getAs[Long]("d_hist"), r.getAs[Long]("d_new"),
        r.getAs[Double]("est_sim"), r.getAs[Double]("jac"))).sortBy(p => (p._1, p._2))
    assert(got.map(p => (p._1, p._2)).contains((1L, 11L)))
    val exact = got.find(p => p._1 == 1L && p._2 == 11L).get
    assert(exact._3 == 1.0 && exact._4 == 1.0) // identical docs
    assert(got.forall(_._2 != 13L), "unrelated batch doc must not pair")
    // equivalence with the one-shot self-join restricted to the
    // history→batch boundary (hist ids < batch ids by construction)
    val all = TextDedup.minHashLshPairs(hist.union(batch), "doc_id", "text")
      .where(col("d1") < 10 && col("d2") >= 10)
      .collect().map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2")))
      .sorted.toSeq
    assert(got.map(p => (p._1, p._2)).toSeq == all)
  }

  test("incremental refresh cycle: dedup batch, append its signatures, store covers both") {
    val s = spark
    import s.implicits._
    val store = java.nio.file.Files
      .createTempDirectory("graft_sigstore_cycle").toString
    val hist = Seq((1L, "one two three four five six seven eight"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val batch = Seq((11L, "one two three four five six seven eight"),
      (12L, "totally new content with no historical match at all"))
      .toDF("doc_id", "text")
    TextDedup.writeSignatureStore(hist, "doc_id", "text", store)
    val pairs = TextDedup.dedupAgainstStore(batch, "doc_id", "text", store)
      .collect().map(r => (r.getAs[Long]("d_hist"), r.getAs[Long]("d_new")))
    assert(pairs.toSeq == Seq((1L, 11L)))
    // the refresh: survivors (non-dup batch docs) append their own
    // signatures so the NEXT batch dedups against history ∪ this batch
    val survivors = batch.join(
      s.createDataFrame(pairs.map(p => Tuple1(p._2)).toSeq.distinct).toDF("doc_id"),
      Seq("doc_id"), "left_anti")
    TextDedup.writeSignatureStore(survivors, "doc_id", "text", store, append = true)
    val storeIds = s.read.parquet(store).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(storeIds == Seq(1L, 2L, 12L), "store must now cover history + new uniques")
    // a re-run of doc 12's content must now hit the appended signature
    val next = Seq((21L, "totally new content with no historical match at all"))
      .toDF("doc_id", "text")
    val hits = TextDedup.dedupAgainstStore(next, "doc_id", "text", store)
      .collect().map(r => (r.getAs[Long]("d_hist"), r.getAs[Long]("d_new")))
    assert(hits.toSeq == Seq((12L, 21L)))
  }

  test("banded bucketed store: same pairs as the plain store, history side unshuffled") {
    val s = spark
    import s.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val hist = Seq(
      (1L, base), (2L, base + " extra tail words here"),
      (3L, "completely different text about spark catalyst plans and shuffles"),
      (4L, "yet another unrelated document body with enough words to shingle"),
      (5L, "five six seven eight nine ten eleven twelve thirteen fourteen"),
      (6L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (11L, base), (12L, base + " extra tail words"),
      (13L, "nothing in common with any history document at all frankly"))
      .toDF("doc_id", "text")
    val plain = java.nio.file.Files
      .createTempDirectory("graft_sigstore_plainref").toString
    TextDedup.writeSignatureStore(hist, "doc_id", "text", plain)
    val want = TextDedup.dedupAgainstStore(batch, "doc_id", "text", plain)
      .collect().map(r => (r.getAs[Long]("d_hist"), r.getAs[Long]("d_new"),
        r.getAs[Double]("est_sim"), r.getAs[Double]("jac"))).sorted.toSeq
    TextDedup.writeBandedSignatureStore(hist, "doc_id", "text", "graft_banded_spec")
    // pin the join shape: at test scale the batch side would broadcast
    // (also shuffle-free, but then the plan proves nothing about the
    // history side), so force the SMJ path the 100 TB refresh takes
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val inc = TextDedup.dedupAgainstBandedStore(batch, "doc_id", "text", "graft_banded_spec")
      val got = inc.collect().map(r => (r.getAs[Long]("d_hist"), r.getAs[Long]("d_new"),
        r.getAs[Double]("est_sim"), r.getAs[Double]("jac"))).sorted.toSeq
      assert(got == want, "banded store must reproduce the plain store's pairs")
      // the physical point: exactly ONE exchange on the band key — the
      // batch side shuffling into the store's bucketing; the history
      // scan is bucket-aligned with no exchange above it
      // AQE's toString prints the final AND the initial plan — count
      // exchanges in the final section only
      val plan = inc.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(plan.contains("Bucketed: true"),
        "history side must be read as a bucketed scan")
      val bbkeyExchanges = "Exchange hashpartitioning\\([^)]*bbkey"
        .r.findAllIn(plan).size
      assert(bbkeyExchanges == 1,
        s"expected 1 band-key exchange (batch side only), found $bbkeyExchanges")
    } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("exact-hash maintenance cycle: in-batch classify, idempotent replay, store growth") {
    val s = spark
    import s.implicits._
    val store = java.nio.file.Files
      .createTempDirectory("graft_hashstore_cycle").toString + "/store"
    def run(bid: Long, docs: (Long, String)*) = TextDedup
      .exactDedupBatchAndMaintain(docs.toDF("doc_id", "text"), "doc_id", "text",
        store, batchId = Some(bid))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("status"),
        r.getAs[Long]("canonical_id"))).sortBy(_._1).toSeq
    def storeRows() = s.read.option("recursiveFileLookup", "true").parquet(store)
      .collect().map(r => r.getAs[Long]("keep_id")).sorted.toSeq
    // batch 0: empty store — a twin pair inside the batch + one unique
    assert(run(0L, (5L, "aaa"), (7L, "aaa"), (9L, "bbb")) == Seq(
      (5L, "unique", 5L), (7L, "dup_in_batch", 5L), (9L, "unique", 9L)))
    assert(storeRows() == Seq(5L, 9L), "only canonical owners enter the store")
    // batch 1: history dup + novel
    assert(run(1L, (11L, "aaa"), (12L, "ccc")) == Seq(
      (11L, "dup_of_history", 5L), (12L, "unique", 12L)))
    assert(storeRows() == Seq(5L, 9L, 12L))
    // replay batch 1: classification re-derived without self-dup
    // artifacts, store unchanged (committed batch_1 dir is skipped)
    assert(run(1L, (11L, "aaa"), (12L, "ccc")) == Seq(
      (11L, "dup_of_history", 5L), (12L, "unique", 12L)))
    assert(storeRows() == Seq(5L, 9L, 12L), "replay must not double-append")
    // compaction folds the three batch dirs and preserves the store
    TextDedup.compactHashStore(s, store)
    assert(storeRows() == Seq(5L, 9L, 12L))
    assert(run(2L, (21L, "ccc")) == Seq((21L, "dup_of_history", 12L)))
  }

  test("micro-batch replay after the store append reproduces the SAME pairs") {
    // the crash window a batchId-scoped pairs sink must survive: the
    // signature-store append committed but the downstream pairs write
    // did not, so the replay recomputes pairs against a store that
    // ALREADY holds this batch's survivors — the recomputed list must
    // equal the original (no self matches, no batch-sibling pairs
    // double-counted through the store)
    val s = spark
    import s.implicits._
    val store = java.nio.file.Files
      .createTempDirectory("graft_sigstore_replay").toString + "/store"
    val hist = Seq((1L, "one two three four five six seven eight"))
      .toDF("doc_id", "text")
    TextDedup.dedupBatchAndMaintain(hist, "doc_id", "text", store,
      batchId = Some(0L))
    // batch 1: a history dup (21 ~ 1) and an intra-batch dup pair
    // (22, 23); survivor 22 enters the store when the append commits
    val b1 = Seq(
      (21L, "one two three four five six seven eight"),
      (22L, "alpha beta gamma delta epsilon zeta eta theta"),
      (23L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    def pairs() = TextDedup
      .dedupBatchAndMaintain(b1, "doc_id", "text", store, batchId = Some(1L))
      .select("d_hist", "d_new").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val first = pairs()
    assert(first == Seq((1L, 21L), (22L, 23L)))
    val replay = pairs() // store already holds batch 1's survivors
    assert(replay == first,
      "replayed pairs must match the original batch's pairs exactly")
  }

  test("a recurring doc_id keeps its genuine against-history pair") {
    // the id-only replay suppression this pins against: doc_id 7
    // legitimately RECURS in a later batch with new content (re-crawl
    // / CDC update); a pair whose d_hist is the STORED doc 7 is
    // genuine history dedup, not a replay artifact, and must survive
    val s = spark
    import s.implicits._
    val store = java.nio.file.Files
      .createTempDirectory("graft_sigstore_recur").toString + "/store"
    TextDedup.dedupBatchAndMaintain(
      Seq((7L, "alpha beta gamma delta epsilon zeta eta theta"))
        .toDF("doc_id", "text"), "doc_id", "text", store, batchId = Some(0L))
    // batch 1: doc 7 recurs with DIFFERENT content; doc 30 duplicates
    // the STORED content of doc 7
    val b1 = Seq(
      (7L, "one two three four five six seven eight"),
      (30L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    def pairs() = TextDedup
      .dedupBatchAndMaintain(b1, "doc_id", "text", store, batchId = Some(1L))
      .select("d_hist", "d_new").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val first = pairs()
    assert(first == Seq((7L, 30L)),
      "the stored doc 7's genuine pair must not be suppressed by the " +
        "recurrence of its id in the batch")
    // replay: batch 1's survivor (7, new content) is now in the store;
    // only THAT row's self-match is a replay artifact to suppress
    assert(pairs() == first,
      "replayed pairs must match the original batch's pairs exactly")
  }

  test("compaction and deletion verbs no-op on an absent store path") {
    val s = spark
    import s.implicits._
    val ghost = java.nio.file.Files
      .createTempDirectory("graft_ghost").toString + "/never_written"
    TextDedup.compactSignatureStore(s, ghost)
    TextDedup.compactHashStore(s, ghost)
    TextDedup.deleteFromStore(s, ghost, Seq(1L).toDF("doc_id"), "doc_id")
    assert(!new java.io.File(ghost).exists,
      "a no-op on an absent store must not conjure the path")
  }

  test("deleteFromStore equals rebuilding the store from retained docs") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (1L, "one two three four five six seven eight"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "iota kappa lambda mu nu xi omicron pi"),
      (4L, "rho sigma tau upsilon phi chi psi omega"))
      .toDF("doc_id", "text")
    val probeDf = Seq(
      (31L, "one two three four five six seven eight"),
      (32L, "alpha beta gamma delta epsilon zeta eta theta"),
      (33L, "iota kappa lambda mu nu xi omicron pi"))
      .toDF("doc_id", "text")
    def freshStore(tag: String) = java.nio.file.Files
      .createTempDirectory(s"graft_sigforget_$tag").toString + "/store"
    def probe(store: String) = TextDedup
      .dedupAgainstStore(probeDf, "doc_id", "text", store)
      .collect().map(r => (r.getAs[Long]("d_hist"), r.getAs[Long]("d_new"),
        r.getAs[Double]("jac"))).sorted.toSeq
    // deleted store
    val del = freshStore("del")
    TextDedup.writeSignatureStore(corpus, "doc_id", "text", del)
    TextDedup.deleteFromStore(spark, del,
      Seq(2L, 3L).toDF("doc_id"), "doc_id")
    // rebuilt-from-retained store
    val ref = freshStore("ref")
    TextDedup.writeSignatureStore(
      corpus.where(!org.apache.spark.sql.functions.col("doc_id").isin(2L, 3L)),
      "doc_id", "text", ref)
    val got = probe(del)
    assert(got == probe(ref), "deletion must equal a retained-only rebuild")
    assert(got.map(_._1).toSet == Set(1L), "forgotten docs must not pair")
  }

  test("a crash between compactSwap's renames is recovered on next read") {
    // simulate the mid-swap state: the store was moved aside (.old)
    // but the compacted copy was not yet renamed in — readers must
    // restore it instead of failing with path-not-found
    val s = spark
    import s.implicits._
    val store = java.nio.file.Files
      .createTempDirectory("graft_sigstore_swapcrash").toString + "/store"
    val hist = Seq((1L, "one two three four five six seven eight"))
      .toDF("doc_id", "text")
    TextDedup.writeSignatureStore(hist, "doc_id", "text", store)
    val probeDf = Seq((31L, "one two three four five six seven eight"))
      .toDF("doc_id", "text")
    def probe() = TextDedup.dedupAgainstStore(probeDf, "doc_id", "text", store)
      .select("d_hist", "d_new").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val before = probe()
    assert(before == Seq((1L, 31L)))
    // crash simulation: store moved aside, swap never completed
    assert(new java.io.File(store)
      .renameTo(new java.io.File(store + ".old")))
    assert(probe() == before, "read must recover the interrupted swap")
    assert(new java.io.File(store).exists(), "store path restored")
    assert(!new java.io.File(store + ".old").exists(), "aside consumed")
  }

  test("store compaction merges per-batch files and leaves results unchanged") {
    val s = spark
    import s.implicits._
    val store = java.nio.file.Files
      .createTempDirectory("graft_sigstore_compact").toString + "/store"
    // three maintenance cycles → three batch_N subdirectories
    Seq(
      Seq((1L, "one two three four five six seven eight"),
        (2L, "alpha beta gamma delta epsilon zeta eta theta")),
      Seq((11L, "mu nu xi omicron pi rho sigma tau upsilon")),
      Seq((21L, "totally new third-batch content with no match at all")))
      .zipWithIndex.foreach { case (docs, i) =>
        TextDedup.dedupBatchAndMaintain(docs.toDF("doc_id", "text"),
          "doc_id", "text", store, batchId = Some(i.toLong))
      }
    def parquetFiles() = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles.toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(store)).filter(_.getName.endsWith(".parquet"))
    }
    val batch = Seq((31L, "one two three four five six seven eight"),
      (32L, "mu nu xi omicron pi rho sigma tau upsilon"),
      (33L, "unmatched probe document for the compaction check"))
      .toDF("doc_id", "text")
    def probe() = TextDedup.dedupAgainstStore(batch, "doc_id", "text", store)
      .collect().map(r => (r.getAs[Long]("d_hist"), r.getAs[Long]("d_new"),
        r.getAs[Double]("jac"))).sorted.toSeq
    val filesBefore = parquetFiles()
    val before = probe()
    assert(before.map(p => (p._1, p._2)) == Seq((1L, 31L), (11L, 32L)))
    TextDedup.compactSignatureStore(s, store)
    val filesAfter = parquetFiles()
    assert(filesAfter.size == 1 && filesAfter.size < filesBefore.size,
      s"expected 1 file after compaction, was ${filesBefore.size} → ${filesAfter.size}")
    assert(new java.io.File(store).listFiles.forall(!_.getName.startsWith("batch_")),
      "per-batch subdirectories must be folded into the root")
    assert(probe() == before, "compaction must not change dedup results")
  }

  test("exact-hash and signature store tiers agree on exact duplicates") {
    val s = spark
    import s.implicits._
    // seeded random corpora: whatever the corpus, a batch doc whose
    // text equals a history doc's must be (a) classified
    // dup_of_history by the hash tier and (b) reported with jac = 1.0
    // by the signature tier — the cross-pin between the two
    // incremental stores
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa")
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      def doc(): String =
        Seq.fill(5 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val histDocs = (1L to 8L).map(i => (i, doc()))
      // batch: two exact copies of random history docs + two fresh
      val copies = rnd.shuffle(histDocs).take(2)
      val batchDocs = Seq((11L, copies(0)._2), (12L, copies(1)._2),
        (13L, doc()), (14L, doc()))
      val hist = histDocs.toDF("doc_id", "text")
      val batch = batchDocs.toDF("doc_id", "text")
      val sigStore = java.nio.file.Files
        .createTempDirectory(s"graft_xpin_sig$seed").toString + "/s"
      val hashStore = java.nio.file.Files
        .createTempDirectory(s"graft_xpin_hash$seed").toString + "/h"
      TextDedup.writeSignatureStore(hist, "doc_id", "text", sigStore)
      TextDedup.writeHashStore(hist, "doc_id", "text", hashStore)
      val sigPairs = TextDedup.dedupAgainstStore(batch, "doc_id", "text", sigStore)
        .collect().map(r => (r.getAs[Long]("d_hist"), r.getAs[Long]("d_new"),
          r.getAs[Double]("jac")))
      val exact = TextDedup.exactDedupAgainstStore(batch, "doc_id", "text", hashStore)
        .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("status"),
          r.getAs[Long]("canonical_id")))
      val histByText = histDocs.groupBy(_._2).map { case (t, ds) => t -> ds.map(_._1).min }
      batchDocs.foreach { case (bid, text) =>
        histByText.get(text).foreach { _ =>
          val ex = exact.find(_._1 == bid).get
          assert(ex._2 == "dup_of_history",
            s"seed $seed: hash tier missed exact dup $bid")
          assert(sigPairs.exists(p => p._2 == bid && p._3 == 1.0),
            s"seed $seed: signature tier missed exact dup $bid (jac=1 pair)")
          // and both tiers name a history doc holding identical content
          assert(histDocs.exists(h => h._1 == ex._3 && h._2 == text),
            s"seed $seed: hash tier canonical ${ex._3} has different text")
        }
      }
    }
  }

  test("the full pipeline is deterministic run-to-run") {
    val a = runPipeline()._4.select("doc_id", "ws.checksum")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = runPipeline()._4.select("doc_id", "ws.checksum")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a == b)
  }
}
