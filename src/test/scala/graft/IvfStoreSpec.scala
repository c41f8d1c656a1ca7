package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property pins for q175 — the persisted IVF+SQ8 index with
  * incremental maintenance
  * ([[graft.llm.VectorSearch.buildIvfSq8Store]] /
  * `appendIvfSq8Batch` / `ivfSq8StoreSearch`).
  *
  *  - FROZEN CODEBOOK: appending a batch does not change any stored
  *    history row (assignments and codes are append-only — the
  *    FAISS-style add-after-train contract), and the batch's stored
  *    codes equal frozen-stats quantization, NOT what a rebuild over
  *    history∪batch would produce.
  *  - CLAMP: batch values outside the frozen [min, max] clamp to the
  *    code boundary (0/255) instead of under/overflowing.
  *  - SEARCH: the store search equals a plain-Scala replay of the
  *    declared semantics (frozen assignment, frozen codes, list-pruned
  *    integer scoring, exact-cosine rerank).
  */
class IvfStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.hive
  import spark.implicits._

  private val dim = 4

  /** History: values in [0, 1]-ish across two labels; batch: ids ≥
    * 100, with one vector deliberately outside the history range. */
  private def hist: Seq[(Long, Array[Float], Int)] =
    (0L until 10L).map { id =>
      (id, Array.tabulate(dim)(i =>
        (((id * 13 + i * 29 + id * id * (i + 1)) % 50) / 50.0).toFloat),
        (id % 2).toInt)
    }
  private def batch: Seq[(Long, Array[Float], Int)] =
    Seq(
      (100L, Array.tabulate(dim)(i => (0.2f + 0.1f * i)), 0),
      (101L, Array.tabulate(dim)(i => (0.7f - 0.1f * i)), 1),
      // outside the frozen range on every dimension: below and above
      (102L, Array.fill(dim)(-5.0f), 0),
      (103L, Array.fill(dim)(9.0f), 1))

  private def freshStore(tag: String): String = {
    val dir = java.nio.file.Files
      .createTempDirectory(s"ivfstore_$tag").toString
    new java.io.File(dir).delete()
    dir
  }

  private def roundHalfAway(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  /** Plain-Scala frozen-stats SQ8 code. */
  private def refCode(v: Array[Float], stats: Seq[(Int, Double, Double)]): Seq[Long] =
    stats.map { case (i, mn, mx) =>
      if (mx == mn) 0L
      else math.max(0L, math.min(255L,
        math.floor((v(i).toDouble - mn) / (mx - mn) * 255.0 + 0.5).toLong))
    }

  test("append is history-invariant and codes batch with frozen stats") {
    val store = freshStore("frozen")
    val h = hist.toDF("vec_id", "embedding", "label")
    val b = batch.toDF("vec_id", "embedding", "label")
    graft.llm.VectorSearch.buildIvfSq8Store(h, "vec_id", "embedding", "label", store)
    val before = spark.read.parquet(s"$store/codes")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2))).toSet
    graft.llm.VectorSearch.appendIvfSq8Batch(b, "vec_id", "embedding", store)
    val after = spark.read.parquet(s"$store/codes")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2))).toSet
    // history rows byte-identical; batch rows appended
    assert(before.subsetOf(after))
    assert(after.size === before.size + batch.size)
    // frozen stats: per-dim [min, max] of HISTORY only
    val stats = spark.read.parquet(s"$store/stats")
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    val histVals = hist.map(_._2)
    stats.foreach { case (i, mn, mx) =>
      assert(mn === histVals.map(_(i).toDouble).min)
      assert(mx === histVals.map(_(i).toDouble).max)
    }
    val got = (after -- before).map { case (id, _, q) => id -> q }.toMap
    batch.foreach { case (id, v, _) =>
      assert(got(id) === refCode(v, stats), s"code of $id")
    }
    // the out-of-range vectors clamp to the boundaries
    assert(got(102L).forall(_ == 0L))
    assert(got(103L).forall(_ == 255L))
  }

  test("batchId-scoped append is replay-idempotent; compaction preserves search") {
    val store = freshStore("compact")
    val h = hist.toDF("vec_id", "embedding", "label")
    val b = batch.take(2).toDF("vec_id", "embedding", "label")
    graft.llm.VectorSearch.buildIvfSq8Store(h, "vec_id", "embedding", "label", store)
    graft.llm.VectorSearch.appendIvfSq8Batch(b, "vec_id", "embedding", store,
      batchId = Some(7L))
    // replayed micro-batch: the committed subdirectory skips the write
    graft.llm.VectorSearch.appendIvfSq8Batch(b, "vec_id", "embedding", store,
      batchId = Some(7L))
    def codes() = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$store/codes")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2)))
      .sortBy(_._1).toSeq
    val before = codes()
    assert(before.map(_._1) === before.map(_._1).distinct,
      "replayed append must not double-index")
    assert(before.size === hist.size + 2)
    val corpus = (hist ++ batch.take(2)).toDF("vec_id", "embedding", "label")
    def search() = graft.llm.VectorSearch
      .ivfSq8StoreSearch(corpus, b, "vec_id", "embedding", store,
        m = 4, k = 2, nprobe = 2)
      .selectExpr("va", "rn", "vb", "round(cos, 6) AS cos")
      .orderBy("va", "rn")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    val preCompact = search()
    graft.llm.VectorSearch.compactIvfSq8Store(spark, store)
    // compaction merged everything to root-level files...
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sub = fs.listStatus(new org.apache.hadoop.fs.Path(s"$store/codes"))
      .filter(_.isDirectory)
    assert(sub.isEmpty, "compaction must flatten per-batch subdirectories")
    // ...with byte-identical rows and byte-identical search results
    assert(codes() === before)
    assert(search() === preCompact)
    // a fresh append after compaction still lands and is searchable
    val b2 = batch.drop(2).toDF("vec_id", "embedding", "label")
    graft.llm.VectorSearch.appendIvfSq8Batch(b2, "vec_id", "embedding", store,
      batchId = Some(8L))
    assert(codes().size === before.size + 2)
  }

  test("replay after compaction self-heals: next compaction drops the dupes") {
    // the q183 crash window: compaction flattens batch_<id> (and its
    // _SUCCESS marker) BEFORE the stream checkpoint commits, so the
    // replayed append double-indexes — and the following compaction's
    // first-row-wins vid dedup must remove the duplicates again
    val store = freshStore("selfheal")
    val h = hist.toDF("vec_id", "embedding", "label")
    val b = batch.take(2).toDF("vec_id", "embedding", "label")
    graft.llm.VectorSearch.buildIvfSq8Store(h, "vec_id", "embedding", "label", store)
    graft.llm.VectorSearch.appendIvfSq8Batch(b, "vec_id", "embedding", store,
      batchId = Some(0L))
    graft.llm.VectorSearch.compactIvfSq8Store(spark, store)
    def codes() = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$store/codes")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2)))
      .sortBy(_._1).toSeq
    val committed = codes()
    val corpus = (hist ++ batch.take(2)).toDF("vec_id", "embedding", "label")
    def search() = graft.llm.VectorSearch
      .ivfSq8StoreSearch(corpus, b, "vec_id", "embedding", store,
        m = 3, k = 2, nprobe = 2)
      .selectExpr("va", "rn", "vb", "round(cos, 6) AS cos")
      .orderBy("va", "rn")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    val committedSearch = search()
    // replay: marker is gone, so the batch re-appends (duplicates)
    graft.llm.VectorSearch.appendIvfSq8Batch(b, "vec_id", "embedding", store,
      batchId = Some(0L))
    assert(codes().size === committed.size + 2, "replay double-indexed")
    // the replay window must ALREADY be correct, not only after the
    // next compaction: a duplicate vid row would occupy two of the m
    // candidate slots and displace a genuine neighbor (m = 3 here, so
    // a doubled candidate would evict the third) — readCodes dedups
    assert(search() === committedSearch,
      "duplicate vid rows must not change search results pre-compaction")
    // the next cycle's compaction heals the store itself, byte-identically
    graft.llm.VectorSearch.compactIvfSq8Store(spark, store)
    assert(codes() === committed)
  }

  test("compacting a fresh (absent) store is a no-op, not an error") {
    val store = freshStore("absent")
    graft.llm.VectorSearch.compactIvfSq8Store(spark, store)
    assert(!new java.io.File(store).exists,
      "a no-op on an absent store must not conjure the path")
  }

  test("store search equals a plain-Scala replay of the frozen semantics") {
    val store = freshStore("search")
    val all = hist ++ batch.take(2) // keep in-range vectors for the replay
    val h = hist.toDF("vec_id", "embedding", "label")
    val b = batch.take(2).toDF("vec_id", "embedding", "label")
    graft.llm.VectorSearch.buildIvfSq8Store(h, "vec_id", "embedding", "label", store)
    graft.llm.VectorSearch.appendIvfSq8Batch(b, "vec_id", "embedding", store)
    val m = 4; val k = 2; val nprobe = 2
    val corpus = all.toDF("vec_id", "embedding", "label")
    val gotRows = graft.llm.VectorSearch
      .ivfSq8StoreSearch(corpus, b, "vec_id", "embedding", store,
        m = m, k = k, nprobe = nprobe)
      .selectExpr("va", "rn", "vb", "round(cos, 6) AS cos")
      .orderBy("va", "rn")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSeq

    // ---- plain-Scala replay ----
    val vs = all.map(t => t._1 -> t._2).toMap
    // frozen centroids: per-label decimal-exact mean over history
    val labels = hist.map(_._3).distinct.sorted
    val cents = labels.map { l =>
      val vecs = hist.filter(_._3 == l).map(_._2)
      // the engine casts each double to DECIMAL(38,12), sums exactly,
      // casts the sum back to double, then divides by the count in
      // DOUBLE arithmetic — replay the same order of operations
      l.toLong -> Array.tabulate(dim)(i =>
        vecs.map(v => BigDecimal(v(i).toDouble)
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble /
          vecs.size)
    }
    val stats = (0 until dim).map { i =>
      val xs = hist.map(_._2(i).toDouble)
      (i, xs.min, xs.max)
    }
    def d2(v: Array[Float], c: Array[Double]): BigDecimal =
      (0 until dim).map { i =>
        val d = v(i).toDouble - c(i)
        BigDecimal(d * d).setScale(12, BigDecimal.RoundingMode.HALF_UP)
      }.sum
    def assign(v: Array[Float], n: Int): Seq[Long] =
      cents.map { case (l, c) => (d2(v, c), l) }.sortBy(identity).take(n).map(_._2)
    val homes = all.map(t => t._1 -> assign(t._2, 1).head).toMap
    val codes = all.map(t => t._1 -> refCode(t._2, stats)).toMap
    def cos(a: Long, bId: Long): Double = {
      def dot(x: Array[Float], y: Array[Float]): Double =
        x.indices.map(i => roundHalfAway(x(i).toDouble * y(i).toDouble * 1e12)).sum / 1e12
      val (x, y) = (vs(a), vs(bId))
      dot(x, y) / (math.sqrt(dot(x, x)) * math.sqrt(dot(y, y)))
    }
    val expected = batch.take(2).map(_._1).flatMap { va =>
      val lists = assign(vs(va), nprobe).toSet
      val cand = all.map(_._1)
        .filter(vb => vb != va && lists.contains(homes(vb)))
        .map(vb => (vb, codes(va).zip(codes(vb)).map { case (p, q) => p * q }.sum))
        .sortBy { case (vb, s) => (-s, vb) }.take(m).map(_._1)
      cand.map(vb => (va, vb, cos(va, vb)))
        .sortBy { case (_, vb, c) => (-c, vb) }.take(k)
        .zipWithIndex.map { case ((_, vb, c), pos) =>
          (va, pos + 1, vb, BigDecimal(c)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
    }.sortBy(t => (t._1, t._2))
    assert(gotRows === expected)
  }

  test("RTBF deletion removes exactly the forgotten rows and the search " +
    "never surfaces them") {
    import spark.implicits._
    val store = freshStore("rtbf")
    val h = hist.toDF("vec_id", "embedding", "label")
    graft.llm.VectorSearch.buildIvfSq8Store(h, "vec_id", "embedding", "label", store)
    val before = spark.read.parquet(s"$store/codes")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2))).toSet
    val forgetIds = Set(2L, 5L, 7L)
    graft.llm.VectorSearch.deleteFromIvfStore(spark, store,
      forgetIds.toSeq.toDF("vec_id"))
    val after = spark.read.parquet(s"$store/codes")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2))).toSet
    // surviving rows byte-identical, forgotten rows gone — nothing else
    assert(after === before.filterNot(r => forgetIds(r._1)))
    // model artifacts (codebook, stats) are retained aggregates
    assert(spark.read.parquet(s"$store/centroids").count() > 0)
    assert(spark.read.parquet(s"$store/stats").count() > 0)
    // the post-deletion search never returns a forgotten neighbor
    val kept = h.where(!col("vec_id").isin(forgetIds.toSeq: _*))
    val got = graft.llm.VectorSearch.ivfSq8StoreSearch(kept, kept,
        "vec_id", "embedding", store, m = 10, k = 3, nprobe = 2)
      .select("va", "vb").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.nonEmpty)
    got.foreach { case (va, vb) =>
      assert(!forgetIds(vb), s"forgotten $vb surfaced as a neighbor of $va")
    }
  }
}
