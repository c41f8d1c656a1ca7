package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-14 operators: k-means|| initialization quality and
  * determinism, and the unigram-LM tokenizer invariants.
  */
class Round14OperatorsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.hive
  private val sfDir = "/root/testdata/sf0.001"

  test("k-means|| init beats the first-k-by-id seed on inertia (both sf dirs)") {
    // the measured claim behind trainParallelInit: same corpus, same
    // Lloyd budget (passes = 2), lower total within-cluster scatter
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val firstK = graft.queries.Similarity.q61(spark, dir)
        .collect().map(_.getAs[Long]("wss")).sum
      val parallel = graft.queries.Similarity.q222(spark, dir)
        .collect().map(_.getAs[Long]("wss")).sum
      assert(parallel < firstK,
        s"$dir: k-means|| wss $parallel not below first-k wss $firstK")
      info(s"$dir inertia: first-k=$firstK kmeans||=$parallel " +
        f"(${100.0 * (firstK - parallel) / firstK}%.1f%% lower)")
    }
  }

  test("k-means|| trains a full codebook and is deterministic") {
    val e = graft.Tables.load(spark, sfDir, "embeddings")
    val c1 = graft.llm.KMeans.trainParallelInit(e, "vec_id", "embedding",
      k = 8, ell = 8, rounds = 3, passes = 2)
    val c2 = graft.llm.KMeans.trainParallelInit(e, "vec_id", "embedding",
      k = 8, ell = 8, rounds = 3, passes = 2)
    assert(c1.length == 8)
    assert(c1.map(_._1) == (0 until 8))
    assert(c1.map(_._2.toSeq) == c2.map(_._2.toSeq), "non-deterministic init")
  }

  test("unigram-LM: decode(encode(x)) is the identity on the truncated corpus") {
    val s = spark
    import s.implicits._
    val d = graft.Tables.load(s, sfDir, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
    val vocab = graft.llm.UnigramLM.train(d, "text")
    val stream = graft.llm.UnigramLM.encode(d, "doc_id", "text", vocab)
    val decoded = graft.llm.UnigramLM.decode(stream, "doc_id")
    // the reference: same words, truncated to 12 codepoints, joined
    // by single spaces (multi-space runs collapse — empty words drop)
    val ref = d.select($"doc_id",
      org.apache.spark.sql.functions.expr(
        "array_join(transform(filter(split(text, ' '), w -> w <> ''), " +
          "w -> substring(w, 1, 12)), ' ')").as("ref"))
    val bad = decoded.join(ref, "doc_id")
      .where($"text" =!= $"ref").count()
    assert(bad == 0, s"$bad documents failed the decode round-trip")
    // and the declared query agrees: zero round-trip failures
    val fails = graft.queries.TextTokenizers.q224(s, sfDir)
      .agg(org.apache.spark.sql.functions.sum("n_rt_fail")).head().getLong(0)
    assert(fails == 0)
  }

  test("unigram-LM vocabulary: char coverage survives pruning; counts positive") {
    val s = spark
    val d = graft.Tables.load(s, sfDir, "documents")
    val vocab = graft.llm.UnigramLM.train(d, "text")
    assert(vocab.nonEmpty && vocab.forall(_.cnt > 0))
    val chars = vocab.filter(p => p.piece.codePointCount(0, p.piece.length) == 1)
    assert(chars.nonEmpty)
    // every character appearing in any multi-char piece is itself a
    // vocab entry — the coverage guarantee that keeps words segmentable
    val charSet = chars.map(_.piece).toSet
    assert(vocab.forall(_.piece.map(_.toString).forall(charSet.contains)))
  }

  test("unigram_segment expression: exact DP, ties to longest piece, unk fallback") {
    val s = spark
    import s.implicits._
    graft.functions.GraftFunctions.ensureRegistered(s)
    // vocab: chars a,b (count 1 each), piece 'ab' (count 2), T = 4:
    // lp(a)=lp(b)=ln(1/4), lp(ab)=ln(2/4); 'abab' best = [ab, ab]
    // (2·ln(.5) > 4·ln(.25)); 'aba' best = [ab, a] (tie-free)
    def nanos(x: Double): Long = java.math.BigDecimal.valueOf(math.log(x))
      .setScale(9, java.math.RoundingMode.HALF_UP).movePointRight(9).longValueExact()
    val ps = Array("a", "b", "ab")
    val lps = Array(nanos(0.25), nanos(0.25), nanos(0.5))
    def seg(w: String): Seq[String] =
      Seq(w).toDF("word").select(org.apache.spark.sql.functions
        .call_function("unigram_segment",
          org.apache.spark.sql.functions.col("word"),
          org.apache.spark.sql.functions.lit(ps),
          org.apache.spark.sql.functions.lit(lps),
          org.apache.spark.sql.functions.lit(4)))
        .head().getSeq[String](0)
    assert(seg("abab") == Seq("ab", "ab"))
    assert(seg("aba") == Seq("ab", "a"))
    assert(seg("") == Seq.empty)
    // unknown char: falls back to a single-char piece, never fails
    assert(seg("axb") == Seq("a", "x", "b"))
    // equal-score tie prefers the longest last piece (smallest split):
    // vocab q,r,qr all ln(1/3): 'qr' as one piece beats [q, r]
    val ps2 = Array("q", "r", "qr")
    val lps2 = Array.fill(3)(nanos(1.0 / 3))
    val segged = Seq("qr").toDF("word").select(org.apache.spark.sql.functions
      .call_function("unigram_segment",
        org.apache.spark.sql.functions.col("word"),
        org.apache.spark.sql.functions.lit(ps2),
        org.apache.spark.sql.functions.lit(lps2),
        org.apache.spark.sql.functions.lit(4)))
      .head().getSeq[String](0)
    assert(segged == Seq("qr"))
  }

  test("k-means|| degenerate corpora: empty and fewer-than-k rows") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(graft.llm.KMeans
      .trainParallelInit(empty, "vec_id", "embedding", k = 4).isEmpty)
    // 3 identical vectors: φ = 0 after the seed, no candidate is ever
    // drawn, the codebook collapses to the single seed centroid
    val same = Seq((1L, Array(1.0f, 2.0f)), (2L, Array(1.0f, 2.0f)),
      (3L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val cents = graft.llm.KMeans
      .trainParallelInit(same, "vec_id", "embedding", k = 4, passes = 2)
    assert(cents.length == 1)
    assert(cents.head._2.toSeq == Seq(1000000L, 2000000L))
    // 3 distinct vectors, k = 4: codebook is capped by the candidate set
    val three = Seq((1L, Array(0.0f, 0.0f)), (2L, Array(10.0f, 0.0f)),
      (3L, Array(0.0f, 10.0f))).toDF("vec_id", "embedding")
    val c3 = graft.llm.KMeans
      .trainParallelInit(three, "vec_id", "embedding", k = 4, passes = 1)
    assert(c3.length <= 3 && c3.nonEmpty)
  }
}
