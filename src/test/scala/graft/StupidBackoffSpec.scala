package graft

import org.scalatest.funsuite.AnyFunSuite

/** Property pins for q173 — Stupid-Backoff bigram-LM quality scoring
  * (Brants et al., EMNLP 2007).
  *
  *  - EXACT semantics: each document's mean transition log-score
  *    equals an independent plain-Scala re-derivation (Map-based
  *    counts, the three-branch backoff, `math.log`, HALF_UP at scale
  *    9, exact decimal summation, double mean) to the last digit —
  *    pinning tokenization, LM training, all three backoff branches,
  *    and the decimal-exact accumulation.
  *  - BACKOFF COVERAGE: the synthetic corpus forces every branch —
  *    seen bigrams, unseen bigram over seen unigrams, and full OOV.
  *  - DISCRIMINATION: the filter's defining behavior — documents in
  *    the target vocabulary outscore documents written in a disjoint
  *    vocabulary, so ascending order surfaces junk first.
  */
class StupidBackoffSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.hive
  import spark.implicits._

  /** 6 target (en) docs over vocabulary A; raw pool of 4 A-style
    * docs (mostly seen bigrams, some unseen orderings) and 4 B-style
    * docs (fully OOV — every transition takes the uniform floor).
    */
  private def corpus: Seq[(Long, String, String)] = {
    val vocabA = Vector("alpha", "beta", "gamma", "delta", "epsilon")
    val vocabB = Vector("kappa", "lambda", "mu", "nu")
    def doc(v: Vector[String], seed: Int, n: Int): String =
      (0 until n).map(i => v((i * 5 + seed * 3 + i * i * seed) % v.size)).mkString(" ")
    val en = (0 until 6).map(i => (i.toLong, doc(vocabA, i + 1, 18 + i), "en"))
    val rawA = (0 until 4).map(i => (100L + i, doc(vocabA, i + 9, 15 + i), "fr"))
    val rawB = (0 until 4).map(i => (200L + i, doc(vocabB, i + 17, 15 + i), "zh"))
    // Mixed doc pinning the unigram-backoff branch deterministically:
    // (kappa→alpha) is an unseen bigram over a seen target unigram.
    val mixed = Seq((300L, "kappa alpha beta gamma", "de"))
    en ++ rawA ++ rawB ++ mixed
  }

  /** Independent reference: Stupid-Backoff mean log-scores, no Spark. */
  private def refScores(docsSeq: Seq[(Long, String, String)]): Map[Long, Double] = {
    val enToks = docsSeq.filter(_._3 == "en").flatMap(_._2.split(" ", -1))
    val uni = enToks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val big = docsSeq.filter(_._3 == "en")
      .flatMap(_._2.split(" ", -1).sliding(2).map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = enToks.size.toLong
    docsSeq.collect { case (id, text, _) if text.split(" ", -1).length >= 2 =>
      val ls = text.split(" ", -1).sliding(2).map { p =>
        val (v, w) = (p(0), p(1))
        val s = big.get((v, w)) match {
          case Some(cb) => cb.toDouble / uni(v).toDouble
          case None => uni.get(w) match {
            case Some(cw) => 0.4 * cw.toDouble / n.toDouble
            case None => 0.4 * 0.4 / n.toDouble
          }
        }
        BigDecimal(math.log(s)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
      }.toSeq
      id -> ls.sum.toDouble / ls.size
    }.toMap
  }

  private def runQ173(docsSeq: Seq[(Long, String, String)]): Map[Long, Double] = {
    val dir = java.nio.file.Files.createTempDirectory("sb-docs").toString
    docsSeq.toDF("doc_id", "text", "lang")
      .withColumn("source", org.apache.spark.sql.functions.lit("srcT"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    graft.queries.Text.q173(spark, dir).collect()
      .map(row => row.getLong(0) -> row.getDouble(3)).toMap
  }

  test("q173: Spark mean log-scores equal the plain-Scala reference exactly") {
    val got = runQ173(corpus)
    val want = refScores(corpus)
    assert(got.keySet == want.keySet)
    got.foreach { case (id, s) =>
      assert(math.abs(s - want(id)) < 1e-12, s"doc $id: got $s want ${want(id)}")
    }
  }

  test("q173: every backoff branch is exercised by the corpus") {
    val enBig = corpus.filter(_._3 == "en")
      .flatMap(_._2.split(" ", -1).sliding(2).map(p => (p(0), p(1)))).toSet
    val enUni = corpus.filter(_._3 == "en").flatMap(_._2.split(" ", -1)).toSet
    val poolTrans = corpus.filter(_._3 != "en")
      .flatMap(_._2.split(" ", -1).sliding(2).map(p => (p(0), p(1))))
    assert(poolTrans.exists(enBig.contains), "no seen-bigram branch")
    assert(poolTrans.exists(t => !enBig.contains(t) && enUni.contains(t._2)),
      "no unigram-backoff branch")
    assert(poolTrans.exists(t => !enUni.contains(t._2)), "no OOV-floor branch")
  }

  test("q173: target-vocabulary docs outscore disjoint-vocabulary docs") {
    val got = runQ173(corpus)
    val aScores = got.collect { case (id, s) if id >= 100 && id < 200 => s }
    val bScores = got.collect { case (id, s) if id >= 200 && id < 300 => s }
    assert(aScores.nonEmpty && bScores.nonEmpty)
    assert(aScores.min > bScores.max,
      s"expected every A-style doc above every B-style doc: " +
        s"A min ${aScores.min}, B max ${bScores.max}")
  }
}
