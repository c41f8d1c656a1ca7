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
