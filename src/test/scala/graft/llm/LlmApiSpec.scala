package graft.llm

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The parameterized LLM-operator API at settings the oracle-pinned
  * queries don't use — monotonicity and contract checks rather than
  * value oracles.
  */
class LlmApiSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.hive
  private lazy val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
  private lazy val embs = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")

  test("jaccard threshold is monotonic: lower threshold ⊇ higher") {
    val strict = TextDedup.jaccardNearDupPairs(docs, "doc_id", "text", n = 3, tNum = 4, tDen = 5)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val loose = TextDedup.jaccardNearDupPairs(docs, "doc_id", "text", n = 3, tNum = 1, tDen = 2)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(strict.subsetOf(loose))
    assert(loose.size >= strict.size)
  }

  test("jaccard pairs match a brute-force reference on a random corpus") {
    import spark.implicits._
    // fixed-seed corpus engineered for near-dups: small vocab, short
    // docs → plenty of overlapping shingle sets. The filters (prefix,
    // length, positional) must lose NO pair the brute-force all-pairs
    // Jaccard finds, at several thresholds.
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val corpus = (1L to 60L).map { id =>
      val words = Seq.fill(6 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size)))
      (id, words.mkString(" "))
    }
    def shingles(text: String, n: Int): Set[String] =
      text.split(" ").sliding(n).map(_.mkString(" ")).toSet
    val df = corpus.toDF("doc_id", "text")
    for ((tNum, tDen) <- Seq((1, 2), (3, 5), (4, 5))) {
      val expected = (for {
        (i, ti) <- corpus; (j, tj) <- corpus if i < j
        si = shingles(ti, 2); sj = shingles(tj, 2)
        if si.nonEmpty && sj.nonEmpty
        inter = (si intersect sj).size
        jac = inter.toDouble / (si.size + sj.size - inter)
        if jac >= tNum.toDouble / tDen
      } yield (i, j)).toSet
      val got = TextDedup.jaccardNearDupPairs(df, "doc_id", "text",
          n = 2, tNum = tNum, tDen = tDen)
        .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected,
        s"t=$tNum/$tDen missing=${expected -- got} extra=${got -- expected}")
    }
  }

  test("repetition stats separate degenerate text from distinct text") {
    import spark.implicits._
    val df = Seq(
      (1L, "spam spam spam spam spam spam"),         // one repeated token
      (2L, "a b c d e f g h i j"),                   // all distinct
      (3L, "x y x y x y x y"),                       // alternating pair
      (4L, "ab")                                     // too short → dropped
    ).toDF("doc_id", "text")
    val stats = TextStats.repetitionStats(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(!stats.contains(4L))
    assert(stats(1L)._1 == 1.0 && stats(1L)._2 == 1.0) // every gram identical
    assert(stats(2L)._2 == 0.0)                        // no duplicate 3-gram
    assert(stats(2L)._1 < stats(3L)._1)                // distinct < alternating
    assert(stats(3L)._2 == 1.0)                        // x y x / y x y both repeat
  }

  test("containment pairs match brute force and catch near-supersets Jaccard misses") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    // random docs plus an engineered (quote, long-wrapper) pair
    val base = (1L to 50L).map { id =>
      (id, Seq.fill(4 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val quote = "alpha beta gamma delta"
    val wrapper = s"eta eta zeta $quote zeta eta eps eta zeta eps eta zeta"
    val corpus = base ++ Seq((100L, quote), (101L, wrapper))
    def sh(text: String): Set[String] = text.split(" ").sliding(2).map(_.mkString(" ")).toSet
    val expected = (for {
      (i, ti) <- corpus; (j, tj) <- corpus
      si = sh(ti); sj = sh(tj)
      if si.size < sj.size || (si.size == sj.size && i < j)
      inter = (si intersect sj).size
      if inter * 2 >= math.min(si.size, sj.size)
    } yield (i, j)).toSet
    val got = TextDedup.containmentNearDupPairs(corpus.toDF("doc_id", "text"),
        "doc_id", "text", n = 2, tNum = 1, tDen = 2)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected,
      s"missing=${expected -- got} extra=${got -- expected}")
    // the engineered embed is found with full containment…
    val c = TextDedup.containmentNearDupPairs(corpus.toDF("doc_id", "text"),
        "doc_id", "text", n = 2, tNum = 9, tDen = 10)
      .where($"d1" === 100L && $"d2" === 101L)
      .collect()
    assert(c.length == 1 && c(0).getAs[Double]("containment") == 1.0)
    // …while its Jaccard is far below any dedup threshold
    val jac = TextDedup.jaccardNearDupPairs(corpus.toDF("doc_id", "text"),
        "doc_id", "text", n = 2, tNum = 1, tDen = 2)
      .where(($"d1" === 100L && $"d2" === 101L) || ($"d1" === 101L && $"d2" === 100L))
    assert(jac.count() == 0)
  }

  test("minhash with fewer bands finds no more than wider banding") {
    val wide = TextDedup.minHashLshPairs(docs, "doc_id", "text", k = 12, bands = 6)
    val narrow = TextDedup.minHashLshPairs(docs, "doc_id", "text", k = 12, bands = 2)
    // 6 bands of 2 rows collide far more easily than 2 bands of 6 rows
    val wideSet = wide.select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val narrowSet = narrow.select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(narrowSet.subsetOf(wideSet))
    wide.select("est_sim").collect().foreach { r =>
      assert(r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0)
    }
  }

  test("simhash rejects lossy banding configurations") {
    intercept[IllegalArgumentException] {
      TextDedup.simHashPairs(docs, "doc_id", "text", bands = 4, maxHamming = 4)
    }
    // 16-bit / 8-band variant runs and respects the hamming bound
    val pairs = TextDedup.simHashPairs(docs, "doc_id", "text",
      bits = 16, bands = 8, maxHamming = 2).collect()
    assert(pairs.forall(_.getAs[Int]("hamming") <= 2))
  }

  test("cosineTopK returns exactly k ranked neighbors per vector") {
    val top2 = VectorSearch.cosineTopK(embs, "vec_id", "embedding", k = 2)
    val counts = top2.groupBy("va").count().collect().map(_.getLong(1)).toSet
    assert(counts == Set(2L))
    // rank 1 dominates rank 2
    val byVec = top2.collect().groupBy(_.getAs[Long]("va"))
    byVec.values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Int]("rn"))
      assert(sorted(0).getAs[Double]("cos") >= sorted(1).getAs[Double]("cos"))
    }
  }

  test("more hyperplanes → smaller buckets; threshold pairs respect minCos") {
    val coarse = VectorSearch.lshBuckets(embs, "vec_id", "embedding", planes = 2)
      .groupBy("bucket").count().agg(max("count")).head().getLong(0)
    val fine = VectorSearch.lshBuckets(embs, "vec_id", "embedding", planes = 6)
      .groupBy("bucket").count().agg(max("count")).head().getLong(0)
    assert(fine <= coarse)
    val pairs = VectorSearch.thresholdPairs(embs, "vec_id", "embedding", minCos = 0.3)
    assert(pairs.collect().forall(_.getAs[Double]("cos") >= 0.3))
  }

  test("connected components: long chains and separate components resolve") {
    import spark.implicits._
    // a 10-node chain plus a disjoint pair and a triangle; run BOTH
    // tiers (driver union-find and distributed star-contraction) and
    // demand identical labelings
    val pairs = ((1L to 9L).map(i => (i, i + 1)) ++
      Seq((100L, 101L), (200L, 201L), (201L, 202L), (200L, 202L)))
      .toDF("d1", "d2")
    Seq(1L << 20, 0L).foreach { limit =>
      val labels = TextDedup
        .connectedComponents(pairs, "d1", "d2", driverEdgeLimit = limit)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      (1L to 10L).foreach(u => assert(labels(u) == 1L))
      Seq(100L, 101L).foreach(u => assert(labels(u) == 100L))
      Seq(200L, 201L, 202L).foreach(u => assert(labels(u) == 200L))
      assert(labels.size == 15)
    }
  }

  test("CC tiers agree on a random graph") {
    import spark.implicits._
    // fixed-seed random graph: both execution tiers must produce the
    // exact same labeling (the distributed path has no oracle of its
    // own — the union-find IS its reference)
    val rnd = new scala.util.Random(42)
    val pairs = Seq.fill(2000)((rnd.nextInt(500).toLong, rnd.nextInt(500).toLong))
      .filter(p => p._1 != p._2).toDF("d1", "d2")
    def run(limit: Long) =
      TextDedup.connectedComponents(pairs, "d1", "d2", driverEdgeLimit = limit)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(Long.MaxValue) == run(0L))
  }

  test("CC handles string ids identically in both tiers") {
    import spark.implicits._
    // min-label semantics follow the column type's ordering — for
    // strings, lexicographic (Spark min() and the driver union-find's
    // Comparable path must agree)
    // "😀" (😀, U+1F600) sorts BELOW "！" (！) in UTF-16
    // code-unit order but ABOVE it in codepoint/UTF-8 order, which is
    // what Spark's min() uses — both tiers must agree on the latter
    val emoji = "😀"
    val fullwidth = "！"
    val pairs = Seq(("docB", "docA"), ("docC", "docB"), ("zz", "yy"),
      (emoji, fullwidth)).toDF("d1", "d2")
    Seq(1L << 20, 0L).foreach { limit =>
      val labels = TextDedup
        .connectedComponents(pairs, "d1", "d2", driverEdgeLimit = limit)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(labels == Map("docA" -> "docA", "docB" -> "docA",
        "docC" -> "docA", "yy" -> "yy", "zz" -> "yy",
        emoji -> fullwidth, fullwidth -> fullwidth), s"limit=$limit")
    }
  }

  test("star-contraction round count is diameter-independent") {
    import spark.implicits._
    // a 200-node chain: worst-case diameter 199. Min-label propagation
    // needs ~199 rounds; star contraction must stay logarithmic.
    val edges = (1L to 199L).map(i => (i + 1, i)).toDF("u", "v")
    val (labelDf, rounds) = TextDedup.starContraction(edges)
    val labels = labelDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 200L).foreach(u => assert(labels(u) == 1L))
    assert(labels.size == 200)
    assert(rounds <= 15, s"expected O(log n) rounds, got $rounds")
  }

  test("JL projection is linear, deterministic, and matches a pure reference") {
    val s = spark
    import s.implicits._
    // exactly-representable floats so quantize(a)+quantize(b) ==
    // quantize(a+b) and linearity holds on the lattice exactly
    val va = Array.tabulate(8)(i => (i - 3) * 0.25f)
    val vb = Array.tabulate(8)(i => (7 - i) * 0.125f)
    val vsum = va.zip(vb).map { case (a, b) => a + b }
    val df = Seq((1L, va.toSeq), (2L, vb.toSeq), (3L, vsum.toSeq))
      .toDF("vec_id", "embedding")
    val got = VectorSearch.jlProject(df, "vec_id", "embedding", outDims = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    // pure reference: sign = bit 30 of the quadratic hash of the flat index
    def ref(v: Array[Float], j: Int): Long = {
      val dim = v.length
      v.zipWithIndex.map { case (x, i) =>
        val k = (j * dim + i).toLong
        val h = (1103515245L * k * k + 12345L * k) % 2147483648L
        math.round(x.toDouble * 1000000) * (if (h >= 1073741824L) 1 else -1)
      }.sum
    }
    (0 until 4).foreach { j =>
      assert(got((1L, j)) == ref(va, j))
      assert(got((2L, j)) == ref(vb, j))
      assert(got((3L, j)) == got((1L, j)) + got((2L, j)), s"linearity at dim $j")
    }
    // rank guard: a separable sign hash (the fixed bug) makes every
    // output coordinate ±the same scalar — magnitudes must differ
    val mags = (0 until 4).map(j => math.abs(got((1L, j)))).toSet
    assert(mags.size > 1, s"sign matrix looks rank-1: all |coords| = $mags")
  }

  test("k-means assignment matches a pure-Scala quantized-Lloyd reference") {
    // same quantization, init, tie-break, and truncating centroid
    // division, computed with plain Scala collections — the operator's
    // in-row argmin + distributed update must agree exactly
    val data = embs.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => BigDecimal(x.toDouble * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toArray)
      .sortBy(_._1)
    val k = 5
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    var cents: Seq[(Int, Array[Long])] =
      data.take(k).zipWithIndex.map { case ((_, v), i) => (i, v) }.toIndexedSeq
    def assignAll() = data.map { case (id, v) =>
      id -> cents.map { case (c, m) => (d2(v, m), c) }.min
    }
    for (_ <- 1 until 3) {
      val byC = assignAll().groupBy(_._2._2)
      cents = byC.toSeq.sortBy(_._1).map { case (c, members) =>
        val vs = members.map { case (id, _) => data.find(_._1 == id).get._2 }
        val m = Array.tabulate(64)(d => vs.map(_(d)).sum / vs.length)
        (c, m)
      }.toIndexedSeq
    }
    val expected = assignAll().map { case (id, (dd, c)) => id -> ((c, dd)) }.toMap
    val got = KMeans.assign(embs, "vec_id", "embedding", k = k, passes = 3)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(got == expected)
  }

  test("k-means and SemDeDup degrade gracefully on an emptied corpus") {
    // a cleaning pipeline can legitimately wipe a stage to zero rows
    // (the sf1 probe hit this through q184's decontamination stage);
    // the clustering tier must produce schema-stable empty results,
    // not a VOID-typed centroid literal
    val empty = embs.where(org.apache.spark.sql.functions.lit(false))
    assert(KMeans.train(empty, "vec_id", "embedding", k = 4).isEmpty)
    val a = KMeans.assign(empty, "vec_id", "embedding", k = 4)
    assert(a.columns.toSeq == Seq("vec_id", "cid", "d2") && a.count() == 0)
    assert(VectorSearch.semDedup(empty, "vec_id", "embedding").count() == 0)
  }

  test("IVF search: recall grows with nprobe and candidates stay bounded") {
    def hits(df: org.apache.spark.sql.DataFrame) =
      df.select("va", "nn").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = hits(VectorSearch.cosineTopK(embs, "vec_id", "embedding", k = 3)
      .withColumnRenamed("vb", "nn"))
    val one = hits(VectorSearch.ivfSearch(embs, "vec_id", "embedding", "label",
      k = 3, nprobe = 1))
    val two = hits(VectorSearch.ivfSearch(embs, "vec_id", "embedding", "label",
      k = 3, nprobe = 2))
    val recall1 = (one intersect exact).size.toDouble / exact.size
    val recall2 = (two intersect exact).size.toDouble / exact.size
    assert(recall2 >= recall1, s"recall must not drop with nprobe: $recall1 -> $recall2")
    assert(recall2 > 0.3, s"2-probe recall implausibly low: $recall2")
    // probing is a real filter: candidates per query are bounded by the
    // probed lists, so results can't just be the exact search in disguise
    assert(one.size <= two.size)
  }

  test("IVF-pruned SQ8 rerank: all-lists probe equals the unpruned baseline; " +
    "pruned neighbors come only from probed lists") {
    val nlist = embs.select("label").distinct().count().toInt
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("va", "rn", "vb").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // probe EVERY list → the candidate set degenerates to all pairs, so
    // the composed tier must reproduce the baseline bit-for-bit
    val full = rows(VectorSearch.sq8Rerank(embs, "vec_id", "embedding", m = 10, k = 3))
    val all = rows(VectorSearch.sq8IvfRerank(embs, "vec_id", "embedding", "label",
      m = 10, k = 3, nprobe = nlist))
    assert(all == full, "nprobe = nlist must equal the unpruned SQ8 baseline")
    // with a real prune, every returned neighbor's HOME list must be one
    // of its query's probed lists — the defining IVF containment
    val assign = VectorSearch.ivfAssign(embs, "vec_id", "embedding", "label", 2)
    val probed = assign.collect()
      .map(r => (r.getLong(0), r.getInt(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val home = assign.where(col("rn") === 1).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val pruned = rows(VectorSearch.sq8IvfRerank(embs, "vec_id", "embedding", "label",
      m = 10, k = 3, nprobe = 2))
    assert(pruned.nonEmpty)
    pruned.foreach { case (va, _, vb) =>
      assert(probed(va).contains(home(vb)),
        s"neighbor $vb of $va lives outside the probed lists")
    }
  }

  test("k-means-quantizer IVF: all-clusters probe equals brute force; " +
    "pruned neighbors come only from probed clusters") {
    val k = 6
    val cid = KMeans.assign(embs, "vec_id", "embedding", k = k, passes = 2)
      .select(col("vec_id"), col("cid"))
    val withCid = embs.join(cid, "vec_id")
    val nlist = withCid.select("cid").distinct().count().toInt
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("va", "rn", "nn").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // probe EVERY cluster → candidates degenerate to all pairs, so the
    // quantized index must reproduce the exact search bit-for-bit —
    // the quantizer column's origin (labels vs k-means) is irrelevant
    // to ivfSearch, which is the composition point of q166
    val exact = rows(VectorSearch.cosineTopK(embs, "vec_id", "embedding", k = 3)
      .withColumnRenamed("vb", "nn"))
    val all = rows(VectorSearch.ivfSearch(withCid, "vec_id", "embedding", "cid",
      k = 3, nprobe = nlist))
    assert(all == exact, "nprobe = nlist must equal the brute-force baseline")
    // with a real prune, every neighbor's HOME cluster must be one of
    // its query's probed clusters — the defining IVF containment
    val assign = VectorSearch.ivfAssign(withCid, "vec_id", "embedding", "cid", 2)
    val probed = assign.collect()
      .map(r => (r.getLong(0), r.getInt(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val home = assign.where(col("rn") === 1).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val pruned = rows(VectorSearch.ivfSearch(withCid, "vec_id", "embedding", "cid",
      k = 3, nprobe = 2))
    assert(pruned.nonEmpty)
    pruned.foreach { case (va, _, nn) =>
      assert(probed(va).contains(home(nn)),
        s"neighbor $nn of $va lives outside the probed clusters")
    }
  }

  test("IVF-pruned PQ rerank: neighbors come only from probed lists; " +
    "recall tracks the exact search") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("va", "rn", "vb").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val pruned = rows(VectorSearch.pqIvfRerank(embs, "vec_id", "embedding",
      "label", mSub = 4, kCode = 4, passes = 2, m = 10, k = 3, nprobe = 2))
    assert(pruned.nonEmpty)
    // the defining IVF containment: every neighbor's HOME list must be
    // one of its query's probed lists
    val assign = VectorSearch.ivfAssign(embs, "vec_id", "embedding", "label", 2)
    val probed = assign.collect()
      .map(r => (r.getLong(0), r.getInt(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val home = assign.where(col("rn") === 1).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    pruned.foreach { case (va, _, vb) =>
      assert(probed(va).contains(home(vb)),
        s"neighbor $vb of $va lives outside the probed lists")
    }
    // every query answers (the SDC candidate path drops no query)
    val queries = embs.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(pruned.map(_._1) == queries)
    // recall grows with codebook resolution — the PQ accuracy knob
    // (Jégou 2011 §V): kCode=4 (4⁴ distinct codes, coarse SDC with
    // heavy ties) must not beat kCode=16, and the finer codebook must
    // recover a real share of the exact neighbors
    val exact = VectorSearch.cosineTopK(embs, "vec_id", "embedding", k = 3)
      .select("va", "vb").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(rows: Set[(Long, Int, Long)]) =
      (rows.map(t => (t._1, t._3)) intersect exact).size.toDouble / exact.size
    val fine = rows(VectorSearch.pqIvfRerank(embs, "vec_id", "embedding",
      "label", mSub = 4, kCode = 16, passes = 2, m = 10, k = 3, nprobe = 2))
    info(s"IVFPQ recall@3: kCode=4 ${recall(pruned)}, kCode=16 ${recall(fine)}")
    assert(recall(fine) >= recall(pruned),
      s"recall must not drop with a finer codebook: ${recall(pruned)} -> ${recall(fine)}")
    // 0.1 ≈ 20× the ~0.006 random-top-3 chance on this 500-vector
    // fixture — real SDC signal, without pretending PQ recovers
    // structure the synthetic corpus doesn't have
    assert(recall(fine) > 0.1, s"IVFPQ kCode=16 recall implausibly low: ${recall(fine)}")
  }

  test("IVF tiers release their corpus-sized caches (only local checkpoints remain)") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    VectorSearch.sq8IvfRerank(embs, "vec_id", "embedding", "label",
      m = 10, k = 3, nprobe = 2).collect()
    VectorSearch.binaryHammingIvfRerank(embs, "vec_id", "embedding", "label",
      m = 10, k = 3, nprobe = 2).collect()
    VectorSearch.pqIvfRerank(embs, "vec_id", "embedding", "label",
      m = 10, k = 3, nprobe = 2).collect()
    VectorSearch.ivfSearch(embs, "vec_id", "embedding", "label",
      k = 3, nprobe = 2).collect()
    // the code/assignment persists must be dropped by the operators
    // themselves (a library caller gets no Bench-style bulk cleanup);
    // only the candidate-pair checkpoint of each call may remain (one
    // per operator, ContextCleaner-reclaimed once the result drops).
    // Before the fix this counted 5: sq8IvfRerank and the Hamming tier
    // each pinned codes + assignment, ivfSearch pinned its assignment.
    val added = sc.getPersistentRDDs
      .filterNot { case (id, _) => before.contains(id) }
    assert(added.size <= 4,
      s"expected at most one checkpoint per IVF call to remain, got " +
        s"${added.size}: ${added.values.map(_.toString).mkString(", ")}")
  }

  test("multi-probe ANN strictly improves recall over one probe") {
    def pairSet(probes: Int) =
      VectorSearch.thresholdPairs(embs, "vec_id", "embedding", minCos = 0.0,
          probes = probes)
        .select("va", "vb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val one = pairSet(1)
    val two = pairSet(2)
    // each probe only ADDS candidates…
    assert(one.subsetOf(two))
    // …and the second independent bucketing rescues pairs the first
    // probe's planes separated (strict improvement on this corpus)
    assert(two.size > one.size)

    // top-k view: every vector matched at one probe stays matched, and
    // its best multi-probe neighbor is at least as close
    val single = VectorSearch.annTopK(embs, "vec_id", "embedding", k = 1)
      .select(col("va"), col("cos")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val multi = VectorSearch
      .annTopKMultiProbe(embs, "vec_id", "embedding", k = 1, probes = 2)
      .select(col("va"), col("cos")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(single.keySet.subsetOf(multi.keySet))
    single.foreach { case (va, c1) => assert(multi(va) >= c1 - 1e-12) }
  }

  test("contamination overlap flags exactly the docs sharing a bench n-gram") {
    import spark.implicits._
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma zeta"),   // shares 1 of its 2 shingles
      (2L, "alpha beta gamma delta"),  // identical → contamination 1.0
      (3L, "zeta eta theta iota"),     // disjoint
      (4L, "beta gamma")               // too short for a 3-gram → dropped
    ).toDF("doc_id", "text")
    val got = TextDedup.contaminationOverlap(corpus, bench, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3), r.getLong(4))).toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L) == ((1L, 0.5, 100L)))
    assert(got(2L) == ((2L, 1.0, 100L)))
  }

  test("quality score stays in [0,1] and sampling buckets cover the range") {
    val scored = TextStats.withQualityScore(docs, "text", Seq("the", "a", "of"))
    val mm = scored.agg(min("score"), max("score")).head()
    assert(mm.getDouble(0) >= 0.0 && mm.getDouble(1) <= 1.0)
    val buckets = TextStats.withSampleBucket(docs, "text", buckets = 10)
      .select("sample_bucket").distinct().collect().map(_.getLong(0)).toSet
    assert(buckets.subsetOf((0L until 10L).toSet) && buckets.size > 5)
  }

  test("global rank equals the single-sort row_number for duplicate-laden keys") {
    import spark.implicits._
    val df = (1 to 500).map(i => (i.toLong, s"k${i % 7}")).toDF("id", "key")
    val got = graft.operators.GlobalRank
      .withGlobalRank(df, Seq(col("key"), col("id")), "rank")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val want = df.collect().map(r => (r.getLong(0), r.getString(1)))
      .sortBy { case (id, k) => (k, id) }.zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1).toLong }.toMap
    assert(got == want) // contiguous 1..n, same total order, no gaps
  }

  test("sorted-neighborhood pairs match brute-force adjacent comparison") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta epsilon"), // near-dup of 1, adjacent in sort
      (3L, "zeta eta theta"),
      (4L, "alpha beta gamma"),               // near-dup of 1/2
      (5L, "completely different words here"))
    val w = 3
    val got = TextDedup.sortedNeighborhoodPairs(
        corpus.toDF("doc_id", "text"), "doc_id", "text",
        window = w, minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // brute force: sort by (text, id), compare each with next w-1
    val sorted = corpus.sortBy { case (id, t) => (t, id) }
    val want = (for {
      i <- sorted.indices; j <- (i + 1) until math.min(i + w, sorted.length)
      a = sorted(i); b = sorted(j)
      s1 = a._2.split(" ").toSet; s2 = b._2.split(" ").toSet
      jac = s1.intersect(s2).size.toDouble / s1.union(s2).size
      if jac >= 0.5
    } yield (a._1, b._1) -> math.rint(jac * 1e6) / 1e6).toMap
    assert(got == want)
    assert(got.nonEmpty) // the engineered near-dups must surface
  }

  test("repeated spans: cross-doc, within-doc, and adjacent-window merging") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "a b c d e f"),          // shares "a b c" with doc 2
      (2L, "x a b c y z"),
      (3L, "p q r s p q r s"),      // within-doc repeat; the two hit
                                    // runs [1,4] and [5,8] are adjacent
                                    // and must merge to one span
      (4L, "u v"),                  // shorter than minTokens: no grams
      (5L, "m n o"),                // doc-sized dup pair with doc 6
      (6L, "m n o"))
    val got = TextDedup.repeatedSpans(
        corpus.toDF("doc_id", "text"), "doc_id", "text", minTokens = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set(
      (1L, 1L, 3L, 3L), (2L, 2L, 4L, 3L), (3L, 1L, 8L, 8L),
      (5L, 1L, 3L, 3L), (6L, 1L, 3L, 3L)))
    // raising minTokens past every repeat length empties the result
    assert(TextDedup.repeatedSpans(
      corpus.toDF("doc_id", "text"), "doc_id", "text", minTokens = 9).isEmpty)

    // the scrub removes exactly the span tokens and keeps the rest in
    // order; untouched and fully-duplicated docs hit both extremes
    val clean = TextDedup.scrubSpans(
        corpus.toDF("doc_id", "text"), "doc_id", "text", minTokens = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(clean == Map(
      1L -> ((6L, 3L, "d e f")), 2L -> ((6L, 3L, "x y z")),
      3L -> ((8L, 8L, "")), 4L -> ((2L, 0L, "u v")),
      5L -> ((3L, 3L, "")), 6L -> ((3L, 3L, ""))))
  }

  test("repeated spans match a brute-force reference on random corpora") {
    import spark.implicits._
    // small vocab + short docs + a planted duplicate pair → plenty of
    // cross-doc and within-doc window repeats at several gram lengths
    val rnd = new scala.util.Random(23)
    val vocab = Vector("a", "b", "c", "d")
    val corpus = (1L to 40L).map { id =>
      val words = Seq.fill(4 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
      (id, words.mkString(" "))
    } :+ (41L, "a b c d a b c d a b") :+ (42L, "a b c d a b c d a b")
    def brute(minTokens: Int): Set[(Long, Long, Long, Long)] = {
      val grams = corpus.flatMap { case (id, t) =>
        val toks = t.split(" ")
        (1 to toks.length - minTokens + 1).map(s =>
          (id, s.toLong, toks.slice(s - 1, s - 1 + minTokens).mkString(" ")))
      }
      val dup = grams.groupBy(_._3).filter(_._2.size > 1).keySet
      grams.filter(g => dup(g._3))
        .map { case (id, s, _) => (id, s, s + minTokens - 1) }
        .groupBy(_._1).toSeq.flatMap { case (id, hs) =>
          // island merge: same running-max break rule as the operator
          val sorted = hs.sortBy(_._2)
          val islands = scala.collection.mutable.ListBuffer.empty[(Long, Long)]
          sorted.foreach { case (_, s, e) =>
            if (islands.nonEmpty && s <= islands.last._2 + 1)
              islands(islands.length - 1) =
                (islands.last._1, math.max(islands.last._2, e))
            else islands += ((s, e))
          }
          islands.map { case (s, e) => (id, s, e, e - s + 1) }
        }.toSet
    }
    for (m <- Seq(3, 5, 8)) {
      val got = TextDedup.repeatedSpans(
          corpus.toDF("doc_id", "text"), "doc_id", "text", minTokens = m)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == brute(m), s"minTokens=$m")
      assert(got.nonEmpty, s"minTokens=$m must find the planted repeats")
    }
  }

  test("semDedup keeps the farther-from-centroid member, smaller id on ties") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(1f, 0f, 0f, 0f)),     // identical pair 1/2: equal d2,
      (2L, Array(1f, 0f, 0f, 0f)),     //   tie-break keeps id 1
      (3L, Array(0f, 1f, 0f, 0f)),     // near-dup pair 3/4: exactly one
      (4L, Array(0f, 0.9f, 0.1f, 0f)), //   survives
      (5L, Array(0f, 0f, 0f, 1f)))     // orthogonal to all: kept
    val df = vecs.toDF("vec_id", "embedding")
    val verdict = VectorSearch
      .semDedup(df, "vec_id", "embedding", k = 2, passes = 2, minCos = 0.5)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(verdict.keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert(verdict(1L) && !verdict(2L))
    assert(verdict(3L) ^ verdict(4L))
    assert(verdict(5L))
    // an unreachable threshold removes nothing
    val all = VectorSearch
      .semDedup(df, "vec_id", "embedding", k = 2, passes = 2, minCos = 1.5)
      .where(col("kept")).count()
    assert(all == 5L)
  }

  test("recallAtK scores hand-built ranked lists") {
    import spark.implicits._
    // exact: q1 → {10, 11}, q2 → {20, 21}; approx hits 1/2 on q1,
    // misses q2 entirely (dropped query ⇒ recall 0, not absent)
    val exact = Seq((1L, 1, 10L), (1L, 2, 11L), (2L, 1, 20L), (2L, 2, 21L))
      .toDF("va", "rn", "vb")
    val approx = Seq((1L, 1, 10L), (1L, 2, 99L)).toDF("va", "rn", "nn")
    val got = VectorSearch.recallAtK(exact, approx, k = 2)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    assert(got == Map(1L -> (1, 0.5), 2L -> (0, 0.0)))
    // ranks beyond k are ignored: at k=1 the approx rank-2 row drops out
    val at1 = VectorSearch.recallAtK(exact, approx, k = 1)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(at1 == Map(1L -> 1, 2L -> 0))
  }

  test("pairEvalByThreshold counts the full confusion set") {
    import spark.implicits._
    // (1,2): agree high. (3,4): predicted 0.7 but true 0.65 — tp at
    // 0.6, fp at 0.7. (5,6): truth-only ⇒ fn wherever its jac ≥ τ.
    // (7,8): predicted-only ⇒ fp wherever est ≥ τ.
    val pred = Seq((1L, 2L, 0.9), (3L, 4L, 0.7), (7L, 8L, 0.65))
      .toDF("d1", "d2", "est_sim")
    val truth = Seq((1L, 2L, 0.95), (3L, 4L, 0.65), (5L, 6L, 0.8))
      .toDF("d1", "d2", "jac")
    val got = TextDedup.pairEvalByThreshold(pred, truth, Seq(0.6, 0.7, 0.9))
      .collect()
      .map(r => r.getDouble(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(0.6) == ((2L, 1L, 1L))) // tp=(1,2),(3,4); fp=(7,8); fn=(5,6)
    assert(got(0.7) == ((1L, 1L, 1L))) // tp=(1,2); fp=(3,4); fn=(5,6)
    assert(got(0.9) == ((1L, 0L, 0L))) // tp=(1,2); everything else below τ
  }

  test("incremental k-means equals the full recompute over the union") {
    val hist = embs.where(col("vec_id") % 2 === 0)
    val batch = embs.where(col("vec_id") % 2 === 1)
    val inc = KMeans.incrementalSummary(hist, batch, "vec_id", "embedding",
        k = 4, passes = 2)
      .collect().map(r => r.getInt(0) -> r.getLong(3)).toMap
    // the sufficient-statistic claim: history sums + batch sums give
    // the SAME refreshed centroids as one Lloyd update computed from
    // scratch over the union under the hist-trained codebook
    val cents = KMeans.train(hist, "vec_id", "embedding", k = 4, passes = 2)
    val sv = hist.unionByName(batch)
      .select(col("vec_id"), KMeans.quantize(col("embedding")).as("sv"))
    val nd = KMeans.assignWith(hist.unionByName(batch), "vec_id", "embedding", cents)
      .join(sv, "vec_id")
      .select(col("cid"), posexplode(col("sv")).as(Seq("d", "v")))
      .groupBy(col("cid"), col("d"))
      .agg(expr("sum(v) div count(1)").as("nd"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val full = cents.map { case (cid, m) =>
      cid -> m.zipWithIndex.collect {
        case (old, d) if nd.contains((cid, d)) =>
          val diff = nd((cid, d)) - old; diff * diff
      }.sum
    }.toMap.filter { case (cid, _) => inc.contains(cid) }
    assert(inc == full)
    assert(inc.nonEmpty)
  }

  test("weightedSample: priority = key/weight, weight raises the odds") {
    import spark.implicits._
    // same key, ×4 weight → quarter priority; ties break on id
    val df = Seq((1L, 100L, 400L), (2L, 400L, 400L), (3L, 100L, 100L),
      (4L, 100L, 100L)).toDF("id", "w", "hv")
    val got = TextStats.weightedSample(df, "id", "w", "hv", k = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(3)))
    // priorities: 1→4.0, 2→1.0, 3→1.0, 4→1.0; id tie-break orders 2,3,4
    assert(got.toSeq == Seq((1, 2L, 1.0), (2, 3L, 1.0), (3, 4L, 1.0)))
  }

  test("hardTriplets picks batch-hard pairs and drops singleton labels") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(1f, 0f, 0f), "a"),
      (2L, Array(1f, 0.1f, 0f), "a"),   // close positive for 1
      (3L, Array(0.7f, 0.7f, 0f), "a"), // farther positive for 1
      (4L, Array(1f, 0.2f, 0f), "b"),   // near negative for 1
      (5L, Array(0f, 0f, 1f), "b"),
      (9L, Array(0f, 1f, 0f), "c"))     // singleton label: no positive
      .toDF("vec_id", "embedding", "label")
    val got = VectorSearch.hardTriplets(vecs, "vec_id", "embedding", "label")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    // anchor 1: hardest positive = least-similar same-label (3, not 2);
    // hardest negative = most-similar other-label (4, not 5 or 9? 9 is
    // label c — eligible as negative; cos(1,9)=0 < cos(1,4))
    assert(got(1L) == ((3L, 4L)))
    assert(!got.contains(9L)) // singleton label has no positive side
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("distinctiveTerms ranks concentrated terms above shared ones") {
    import spark.implicits._
    val df = Seq(
      (1, "alpha alpha common"), (1, "alpha common"),
      (2, "beta common common"), (2, "common"))
      .toDF("grp", "text")
    val got = Lexical.distinctiveTerms(df, "grp", "text", topK = 2)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getString(2)).toMap
    // alpha: tf=3, gf=1 → 3·2e6; common in grp 1: tf=2, gf=2 → 2·1e6
    assert(got((1, 1)) == "alpha" && got((1, 2)) == "common")
    // beta: tf=1, gf=1 → 2e6; common in grp 2: tf=3, gf=2 → 3e6 — tf wins
    assert(got((2, 1)) == "common" && got((2, 2)) == "beta")
  }

  test("phraseMatches counts overlapping occurrences and repeated terms") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b a b a"), // "a b a" overlaps at 0 and 2 — both count
      (2L, "x a b a y"), // single interior match at 1
      (3L, "a b c"), // no match
      (4L, "b a b")) // no "a b a"
      .toDF("doc_id", "text")
    val got = Lexical.phraseMatches(df, "doc_id", "text", Seq("a", "b", "a"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(got == Map(1L -> ((2L, 0)), 2L -> ((1L, 1))))
    // single-term phrase degenerates to term positions
    val one = Lexical.phraseMatches(df, "doc_id", "text", Seq("b"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(one == Map(1L -> ((2L, 1)), 2L -> ((1L, 2)), 3L -> ((1L, 1)),
      4L -> ((2L, 0))))
  }

  test("mmrSelect matches a brute-force greedy reference on a random corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260815L)
    val dim = 8
    val rows = (0L until 60L).map(id =>
      (id, Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)))
    val df = rows.toDF("vec_id", "embedding")
    val n = 15; val k = 6
    val got = VectorSearch.mmrSelect(df, "vec_id", "embedding", n, k)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    // plain-Scala replay of the declared semantics
    val sv = rows.map { case (id, v) =>
      id -> v.map(x => math.round(x.toDouble * 1e6)) }.toMap
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val qid = rows.map(_._1).min
    val pool = rows.map(_._1).filter(_ != qid)
      .map(id => (id, d2(sv(id), sv(qid))))
      .sortBy { case (id, d) => (d, id) }.take(n)
    var sel = List.empty[(Int, Long, Long, Long)]
    var rem = pool.toList
    for (r <- 1 to k) {
      val pick = if (r == 1) rem.minBy { case (id, d) => (d, id) }
      else rem.minBy { case (id, d) =>
        (-(sel.map(s => d2(sv(id), sv(s._2))).min - d), id)
      }
      val dv = if (r == 1) 0L else sel.map(s => d2(sv(pick._1), sv(s._2))).min
      sel = sel :+ ((r, pick._1, pick._2, dv))
      rem = rem.filterNot(_._1 == pick._1)
    }
    assert(got.toList == sel, "engine MMR must equal the greedy reference")
    // diversity sanity: the MMR set's minimum pairwise distance is no
    // smaller than the plain top-k head's (the crowding MMR exists to fix)
    def minPair(ids: Seq[Long]): Long =
      ids.combinations(2).map { case Seq(a, b) => d2(sv(a), sv(b)) }.min
    val topkHead = pool.take(k).map(_._1)
    assert(minPair(got.map(_._2).toSeq) >= minPair(topkHead))
  }

  test("filtered ANN recall: pre-filtering beats post-filtering the same " +
    "candidate budget against the exact filtered truth") {
    val m = 5
    val vecs = embs.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def sdot(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) =>
        math.round(x.toDouble * y.toDouble * 1e12) }.sum / 1e12
    def cos(a: Long, b: Long): Double =
      sdot(vecs(a), vecs(b)) /
        (math.sqrt(sdot(vecs(a), vecs(a))) * math.sqrt(sdot(vecs(b), vecs(b))))
    val queries = vecs.keys.filter(_ % 3 == 0).toSeq.sorted
    val catalog = vecs.keys.filter(_ % 3 == 1).toSeq.sorted
    // exact filtered ground truth: top-3 catalog neighbors per query
    val truth = queries.map(q =>
      q -> catalog.sortBy(d => (-cos(q, d), d)).take(3).toSet).toMap
    def recall(got: Map[Long, Set[Long]]): Double =
      queries.map(q => (got.getOrElse(q, Set.empty) & truth(q)).size).sum /
        (3.0 * queries.size)
    // PRE-filter: predicate inside the candidate scan (the operator)
    val pre = VectorSearch.sq8IvfFilteredRerank(embs, "vec_id", "embedding",
        "label", pmod(col("vec_id"), lit(3)) === 0,
        pmod(col("vec_id"), lit(3)) === 1, m = m, k = 3, nprobe = 2)
      .select("va", "vb").collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // POST-filter: same candidate budget m over EVERYTHING, filter after
    val post = VectorSearch.sq8IvfRerank(embs, "vec_id", "embedding",
        "label", m = m, k = m, nprobe = 2)
      .where(pmod(col("va"), lit(3)) === 0 && pmod(col("vb"), lit(3)) === 1)
      .select("va", "vb", "cos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(t => (-t._3, t._2)).take(3).map(_._2).toSet).toMap
    val (rPre, rPost) = (recall(pre), recall(post))
    assert(rPre >= rPost,
      s"pre-filter recall $rPre must not lose to post-filter $rPost")
    // degenerate exactness: probing EVERY list with a candidate budget
    // covering the whole catalog, the pre-filtered tier must recover
    // the exact filtered truth (recall 1.0) — the all-lists ≡ baseline
    // pin specialized to the filtered path
    val nlist = embs.select("label").distinct().count().toInt
    val full = VectorSearch.sq8IvfFilteredRerank(embs, "vec_id", "embedding",
        "label", pmod(col("vec_id"), lit(3)) === 0,
        pmod(col("vec_id"), lit(3)) === 1,
        m = catalog.size, k = 3, nprobe = nlist)
      .select("va", "vb").collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(recall(full) == 1.0,
      "all-lists full-budget pre-filter must equal the exact filtered truth")
  }

  test("mmrSelectBatch rounds equal a plain-Scala greedy replay over the " +
    "same candidate sets") {
    val queryPred = pmod(col("vec_id"), lit(5)) === 0
    val m = 6; val rounds = 3
    val got = VectorSearch.mmrSelectBatch(embs, "vec_id", "embedding", "label",
        queryPred, m = m, rounds = rounds)
      .select("va", "round", "vb").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toList).toMap
    // candidates from the same tier call the operator makes internally
    val cand = VectorSearch.sq8IvfFilteredRerank(embs, "vec_id", "embedding",
        "label", queryPred, lit(true), m = m, k = m, nprobe = 2)
      .select("va", "vb").collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toList).toMap
    // exact-cosine replay (the VectorDotScaled arithmetic)
    val vecs = embs.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def sdot(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) =>
        math.round(x.toDouble * y.toDouble * 1e12) }.sum / 1e12
    def cos(a: Long, b: Long): Double =
      sdot(vecs(a), vecs(b)) /
        (math.sqrt(sdot(vecs(a), vecs(a))) * math.sqrt(sdot(vecs(b), vecs(b))))
    val want = cand.map { case (va, cs) =>
      var sel = List.empty[Long]
      for (r <- 1 to math.min(rounds, cs.size)) {
        val pick =
          if (r == 1) cs.minBy(d => (-cos(va, d), d))
          else cs.filterNot(sel.contains)
            .minBy(d => (-(cos(va, d) - sel.map(s => cos(d, s)).max), d))
        sel = sel :+ pick
      }
      va -> sel
    }
    assert(got == want, "batch MMR must equal the per-query greedy replay")
  }

  test("filtered ANN: pre-filter keeps top-m among matching; lit(true) " +
    "degenerates to the unfiltered tier") {
    val all = lit(true)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("va", "rn", "vb").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val base = rows(VectorSearch.sq8IvfRerank(embs, "vec_id", "embedding",
      "label", m = 10, k = 3, nprobe = 2))
    val open = rows(VectorSearch.sq8IvfFilteredRerank(embs, "vec_id",
      "embedding", "label", all, all, m = 10, k = 3, nprobe = 2))
    assert(open == base, "pred = true must reproduce the unfiltered tier")
    val catalog = pmod(col("vec_id"), lit(3)) === 1
    val queries = pmod(col("vec_id"), lit(3)) === 0
    val scoped = VectorSearch.sq8IvfFilteredRerank(embs, "vec_id", "embedding",
      "label", queries, catalog, m = 10, k = 3, nprobe = 2)
      .select("va", "vb").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(scoped.nonEmpty)
    scoped.foreach { case (va, vb) =>
      assert(va % 3 == 0, s"query $va outside the query slice")
      assert(vb % 3 == 1, s"neighbor $vb outside the catalog slice")
    }
  }
}
