package graft

import org.scalatest.funsuite.AnyFunSuite

/** Property pins for q172 — DSIR importance-weighted data selection
  * (Xie et al., NeurIPS 2023).
  *
  *  - EXACT semantics: the Spark pipeline's per-document log-weight
  *    equals an independent plain-Scala re-derivation (Map-based
  *    bucket counts, `math.log`, HALF_UP at scale 9, exact decimal
  *    summation) to the last representable digit — pinning the whole
  *    chain: bigram extraction, poly_hash bucketing, add-1 smoothing,
  *    the λ table, and the decimal-exact per-doc accumulation.
  *  - ENRICHMENT: the defining behavior — raw-pool documents written
  *    in the target's vocabulary outscore documents written in a
  *    disjoint vocabulary, so top-k selection enriches toward the
  *    target distribution.
  */
class DsirSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.hive
  import spark.implicits._

  private val B = 512

  /** Synthetic corpus: 6 target (en) docs over vocabulary A, and a
    * raw pool of 6 A-style + 6 B-style non-target docs. Text payloads
    * vary per doc so bucket counts are non-trivial.
    */
  private def corpus: Seq[(Long, String, String)] = {
    val vocabA = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val vocabB = Vector("kappa", "lambda", "mu", "nu", "xi", "omicron")
    def doc(v: Vector[String], seed: Int, n: Int): String =
      (0 until n).map(i => v((i * 7 + seed * 3 + i * i * seed) % v.size)).mkString(" ")
    val en = (0 until 6).map(i => (i.toLong, doc(vocabA, i + 1, 20 + i), "en"))
    val rawA = (0 until 6).map(i => (100L + i, doc(vocabA, i + 11, 18 + i), "fr"))
    val rawB = (0 until 6).map(i => (200L + i, doc(vocabB, i + 21, 18 + i), "zh"))
    en ++ rawA ++ rawB
  }

  /** Independent reference: DSIR log-weights computed with no Spark. */
  private def refWeights(docsSeq: Seq[(Long, String, String)]): Map[Long, Double] = {
    val bigr = docsSeq.flatMap { case (id, text, lang) =>
      val s = text.split(" ", -1)
      if (s.length < 2) Seq.empty
      else s.sliding(2).map(p =>
        (id, lang, graft.functions.PolyHash.hash(p(0) + " " + p(1)) % B))
    }
    val r = bigr.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val t = bigr.filter(_._2 == "en").groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val rr = r.values.sum
    val tt = t.values.sum
    val lam: Map[Long, BigDecimal] = r.map { case (b, rb) =>
      val tb = t.getOrElse(b, 0L)
      val x = ((tb + 1) * (rr + B)).toDouble / ((rb + 1) * (tt + B)).toDouble
      b -> BigDecimal(math.log(x)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    }
    bigr.groupBy(_._1).view
      .mapValues(_.map(x => lam(x._3)).sum.toDouble).toMap
  }

  private def runQ172(docsSeq: Seq[(Long, String, String)]): Map[Long, Double] = {
    val dir = java.nio.file.Files.createTempDirectory("dsir-docs").toString
    docsSeq.toDF("doc_id", "text", "lang")
      .withColumn("source", org.apache.spark.sql.functions.lit("srcT"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    graft.queries.Text.q172(spark, dir).collect()
      .map(row => row.getLong(0) -> row.getDouble(3)).toMap
  }

  test("q172: Spark log-weights equal the plain-Scala reference exactly") {
    val got = runQ172(corpus)
    val want = refWeights(corpus)
    assert(got.keySet == want.keySet)
    got.foreach { case (id, w) =>
      assert(math.abs(w - want(id)) < 1e-12, s"doc $id: got $w want ${want(id)}")
    }
  }

  test("q172: target-vocabulary raw docs outscore disjoint-vocabulary docs") {
    val got = runQ172(corpus)
    val aScores = got.collect { case (id, w) if id >= 100 && id < 200 => w }
    val bScores = got.collect { case (id, w) if id >= 200 => w }
    assert(aScores.nonEmpty && bScores.nonEmpty)
    assert(aScores.min > bScores.max,
      s"expected every A-style doc above every B-style doc: " +
        s"A min ${aScores.min}, B max ${bScores.max}")
  }
}
