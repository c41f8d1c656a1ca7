package graft

import org.scalatest.funsuite.AnyFunSuite

/** Property pins for q174 — 1-bit binary-quantization search with
  * Hamming candidate generation and exact rerank
  * ([[graft.llm.VectorSearch.binaryHammingRerank]]).
  *
  *  - PACKING: the two sign-words equal an independent plain-Scala
  *    re-derivation (BigDecimal HALF_UP quantization to the 1e6
  *    lattice, integer strictly-above-mean test `sv·N > Σsv`, fold of
  *    `1L << (i mod 32)`), pinning that the in-row `aggregate`
  *    expression and the bit layout are exactly what the oracle SQL
  *    mirrors with BIT_OR/`<<`.
  *  - END-TO-END: the reranked top-k equals a plain-Scala replay of
  *    the whole tier — Hamming top-m candidates (ties toward the
  *    smaller id), exact scaled-long cosine, top-k by (cos desc, id) —
  *    so candidate selection and rerank agree with the declared
  *    semantics, not merely with DuckDB.
  */
class BinaryHammingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.hive
  import spark.implicits._

  private val dim = 8
  private val nVec = 12

  /** Deterministic synthetic corpus: values in ~[-0.96, 0.96]. */
  private def vec(id: Long): Array[Float] =
    Array.tabulate(dim) { i =>
      (((id * 31 + i * 17 + id * id * (i + 3)) % 97 - 48) / 50.0).toFloat
    }

  private def corpus: Seq[(Long, Array[Float])] =
    (0L until nVec.toLong).map(id => (id, vec(id)))

  private def roundHalfAway(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  /** Plain-Scala reference codes: (c0, c1) sign words. */
  private def refCodes: Map[Long, (Long, Long)] = {
    val sv = corpus.map { case (id, v) =>
      id -> v.map(x => roundHalfAway(x.toDouble * 1e6))
    }.toMap
    val n = corpus.size.toLong
    val tot = Array.tabulate(dim)(i => sv.values.map(_(i)).sum)
    sv.map { case (id, s) =>
      var c0 = 0L; var c1 = 0L
      (0 until dim).foreach { i =>
        if (s(i) * n > tot(i)) {
          if (i < 32) c0 |= 1L << i else c1 |= 1L << (i - 32)
        }
      }
      id -> (c0, c1)
    }
  }

  test("sign-bit codes match a plain-Scala reference") {
    val df = corpus.toDF("vec_id", "embedding")
    val got = graft.llm.VectorSearch
      .binaryCodes(df, "vec_id", "embedding")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got === refCodes)
    // the corpus is not degenerate: codes actually differ
    assert(got.values.toSet.size > 1)
  }

  // ------------------------------------------------------------ q181
  // 64-dim corpus so the packed word exercises bit 63 (the BIGINT
  // sign bit) and labels drive the coarse quantizer
  private val dim64 = 64
  private def vec64(id: Long): Array[Float] =
    Array.tabulate(dim64) { i =>
      (((id * 31 + i * 17 + id * id * (i + 3)) % 97 - 48) / 50.0).toFloat
    }
  private def corpus64: Seq[(Long, Array[Float], Int)] =
    (0L until 16L).map(id => (id, vec64(id), (id % 3).toInt))

  private def refPacked: Map[Long, Long] = {
    val sv = corpus64.map { case (id, v, _) =>
      id -> v.map(x => roundHalfAway(x.toDouble * 1e6))
    }.toMap
    val n = corpus64.size.toLong
    val tot = Array.tabulate(dim64)(i => sv.values.map(_(i)).sum)
    sv.map { case (id, s) =>
      var c = 0L
      (0 until dim64).foreach(i => if (s(i) * n > tot(i)) c |= 1L << i)
      id -> c
    }
  }

  test("packed sign codes match a plain-Scala reference incl. bit 63") {
    val df = corpus64.toDF("vec_id", "embedding", "label")
    val got = graft.llm.VectorSearch
      .packedSignCodes(df, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === refPacked)
    // bit 63 is genuinely exercised: at least one code is negative
    assert(got.values.exists(_ < 0L),
      "corpus must set bit 63 somewhere or the sign-bit path is untested")
    assert(got.values.toSet.size > 1)
  }

  test("IVF-pruned Hamming: candidates honor probed lists; replay matches") {
    val m = 4; val k = 2; val nprobe = 2
    val codes = refPacked
    val vs = corpus64.map(t => t._1 -> t._2).toMap
    // frozen replay of ivfAssign: per-label decimal-exact centroid,
    // DecimalL2 distance, order by (d2, label)
    val labels = corpus64.map(_._3.toLong).distinct.sorted
    val cents = labels.map { l =>
      val vecs = corpus64.filter(_._3.toLong == l).map(_._2)
      l -> Array.tabulate(dim64)(i =>
        vecs.map(v => BigDecimal(v(i).toDouble)
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble /
          vecs.size)
    }
    def d2(v: Array[Float], c: Array[Double]): BigDecimal =
      (0 until dim64).map { i =>
        val d = v(i).toDouble - c(i)
        BigDecimal(d * d).setScale(12, BigDecimal.RoundingMode.HALF_UP)
      }.sum
    def assign(v: Array[Float], n: Int): Seq[Long] =
      cents.map { case (l, c) => (d2(v, c), l) }.sortBy(identity).take(n).map(_._2)
    val homes = corpus64.map(t => t._1 -> assign(t._2, 1).head).toMap
    def cos(a: Long, b: Long): Double = {
      def dot(x: Array[Float], y: Array[Float]): Double =
        x.indices.map(i => roundHalfAway(x(i).toDouble * y(i).toDouble * 1e12)).sum / 1e12
      val (x, y) = (vs(a), vs(b))
      dot(x, y) / (math.sqrt(dot(x, x)) * math.sqrt(dot(y, y)))
    }
    val ids = corpus64.map(_._1)
    val expected = ids.flatMap { va =>
      val probed = assign(vs(va), nprobe).toSet
      val cand = ids
        .filter(vb => vb != va && probed.contains(homes(vb)))
        .sortBy(vb => (java.lang.Long.bitCount(codes(va) ^ codes(vb)), vb))
        .take(m)
      cand.map(vb => (va, vb, cos(va, vb)))
        .sortBy { case (_, vb, c) => (-c, vb) }.take(k)
        .zipWithIndex.map { case ((_, vb, c), pos) =>
          (va, pos + 1, vb, BigDecimal(c)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
    }.sortBy(t => (t._1, t._2))
    val got = graft.llm.VectorSearch
      .binaryHammingIvfRerank(corpus64.toDF("vec_id", "embedding", "label"),
        "vec_id", "embedding", "label", m = m, k = k, nprobe = nprobe)
      .selectExpr("va", "rn", "vb", "round(cos, 6) AS cos")
      .orderBy("va", "rn")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got === expected)
    // the containment property, asserted directly: every returned
    // neighbor's home list is among the query's probed lists
    got.foreach { case (va, _, vb, _) =>
      assert(assign(vs(va), nprobe).toSet.contains(homes(vb)),
        s"neighbor $vb of $va escaped the probed lists")
    }
  }

  test("Hamming top-m + exact rerank matches a plain-Scala replay") {
    val m = 5; val k = 3
    val codes = refCodes
    def ham(a: Long, b: Long): Int = {
      val (a0, a1) = codes(a); val (b0, b1) = codes(b)
      java.lang.Long.bitCount(a0 ^ b0) + java.lang.Long.bitCount(a1 ^ b1)
    }
    val vs = corpus.toMap
    def cos(a: Long, b: Long): Double = {
      def dot(x: Array[Float], y: Array[Float]): Double =
        x.indices.map(i => roundHalfAway(x(i).toDouble * y(i).toDouble * 1e12)).sum / 1e12
      val (x, y) = (vs(a), vs(b))
      dot(x, y) / (math.sqrt(dot(x, x)) * math.sqrt(dot(y, y)))
    }
    val ids = corpus.map(_._1)
    val expected = ids.flatMap { va =>
      val cand = ids.filter(_ != va)
        .sortBy(vb => (ham(va, vb), vb)).take(m)
      cand.map(vb => (va, vb, cos(va, vb)))
        .sortBy { case (_, vb, c) => (-c, vb) }.take(k)
        .zipWithIndex
        .map { case ((_, vb, c), pos) =>
          (va, pos + 1, vb, BigDecimal(c)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
    }.sortBy(t => (t._1, t._2))
    val got = graft.llm.VectorSearch
      .binaryHammingRerank(corpus.toDF("vec_id", "embedding"),
        "vec_id", "embedding", m = m, k = k)
      .selectExpr("va", "rn", "vb", "round(cos, 6) AS cos")
      .orderBy("va", "rn")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got === expected)
  }
}
