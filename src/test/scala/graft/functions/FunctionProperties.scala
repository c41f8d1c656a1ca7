package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties over the pure expression cores (no Spark
  * session — Catalyst expressions evaluate standalone).
  */
object FunctionProperties extends Properties("functions") {

  // tokens exercising multibyte, empties, repeats, and hash-heavy chars
  private val token: Gen[String] = Gen.oneOf(
    Gen.const(""), Gen.const("世界"), Gen.const("héllo"),
    Gen.listOfN(3, Gen.alphaNumChar).map(_.mkString),
    Gen.oneOf("the", "the", "a", "spam"))
  private val tokens: Gen[List[String]] = Gen.listOfN(12, token).map(_.take(12))

  property("shingle_hashes = sorted distinct poly_hash of shingle strings") =
    forAll(tokens, Gen.choose(1, 4)) { (toks, n) =>
      val arr = ArrayData.toArrayData(
        toks.map(t => UTF8String.fromString(t): Any).toArray)
      val got = ShingleHashes(Literal.create(arr, ArrayType(StringType)), n)
        .eval(null).asInstanceOf[GenericArrayData].toLongArray().toSeq
      val expected =
        if (toks.length < n) Seq.empty[Long]
        else toks.sliding(n).map(w => PolyHash.hash(w.mkString(" ")))
          .toSeq.distinct.sorted
      got == expected
    }

  property("gram_stats counts match a pure sliding-window reference") =
    forAll(tokens, Gen.choose(1, 4)) { (toks, n) =>
      val arr = ArrayData.toArrayData(
        toks.map(t => UTF8String.fromString(t): Any).toArray)
      val got = GramStats(Literal.create(arr, ArrayType(StringType)), n).eval(null)
      if (toks.length < n) got == null
      else {
        val counts = toks.sliding(n).map(_.mkString(" ")).toSeq
          .groupBy(identity).map(_._2.size.toLong)
        val row = got.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
        row.getLong(0) == (toks.length - n + 1).toLong &&
          row.getLong(1) == counts.max &&
          row.getLong(2) == counts.filter(_ > 1).sum
      }
    }

  /** Pure reference for simhash: per-gram weights as a Seq of
    * (hash, weight) PAIRS, never a Map keyed by hash — two distinct
    * grams can collide under PolyHash (e.g. "the" and "uJF" both hash
    * to 114801) and a Map would silently drop one gram's weight, while
    * the engine (explode → GROUP BY gram → sum) correctly sums both.
    */
  private def simhashRef(toks: List[String], n: Int, bits: Int): Long = {
    val counts = toks.sliding(n).map(_.mkString(" ")).toSeq
      .groupBy(identity).toSeq
      .map { case (g, occ) => (PolyHash.hash(g), occ.size.toLong) }
    (0 until bits).map { j =>
      val s = counts.map { case (h, w) => (((h >> j) & 1L) * 2L - 1L) * w }.sum
      if (s > 0) 1L << j else 0L
    }.sum
  }

  property("simhash_fp matches the pure weighted-bit-sum reference") =
    forAll(tokens, Gen.choose(1, 3), Gen.oneOf(16, 32, 64)) { (toks, n, bits) =>
      val arr = ArrayData.toArrayData(
        toks.map(t => UTF8String.fromString(t): Any).toArray)
      val got = SimHashFp(Literal.create(arr, ArrayType(StringType)), n, bits)
        .eval(null)
      if (toks.length < n) got == null
      else got == simhashRef(toks, n, bits)
    }

  property("simhash_fp: PolyHash-colliding grams both contribute weight") = {
    // regression: PolyHash("the") == PolyHash("uJF") == 114801; a
    // hash-keyed Map reference collapses them (round-15 flake)
    require(PolyHash.hash("the") == PolyHash.hash("uJF"),
      "collision fixture drifted: 'the'/'uJF' no longer collide")
    val toks = List("the", "uJF", "a")
    val arr = ArrayData.toArrayData(
      toks.map(t => UTF8String.fromString(t): Any).toArray)
    val got = SimHashFp(Literal.create(arr, ArrayType(StringType)), 1, 64)
      .eval(null)
    forAll(Gen.const(0)) { _ => got == simhashRef(toks, 1, 64) }
  }

  property("minhash_sig equals the typed MinHashAggregator fold") =
    forAll(Gen.nonEmptyListOf(Gen.choose(0L, PolyHash.Mod - 1)).map(_.take(50)),
      Gen.choose(1, 16)) { (hs, k) =>
      val arr = ArrayData.toArrayData(hs.toArray)
      val got = MinHashSig(Literal.create(arr,
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType)), k)
        .eval(null).asInstanceOf[GenericArrayData].toLongArray().toSeq
      val agg = new MinHashAggregator(k)
      val expected = hs.foldLeft(agg.zero)(agg.reduce).toSeq
      got == expected
    }

  property("poly_hash stays in [0, 2^31-1) and is codepoint-stable") =
    forAll(Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.const('界'), Gen.const(' ')))
      .map(_.mkString)) { s =>
      val h = PolyHash.hash(s)
      h >= 0L && h < PolyHash.Mod && h == PolyHash.hash(new String(s))
    }

  property("winnow_set selects exactly winnow_stats' fingerprints") =
    forAll(Gen.listOfN(60, Gen.oneOf(Gen.alphaNumChar, Gen.const('界'),
        Gen.const(' '))).map(_.mkString),
      Gen.choose(2, 6), Gen.choose(2, 8)) { (s, k, w) =>
      val lit = Literal.create(UTF8String.fromString(s), StringType)
      val stats = WinnowStats(lit, k, w).eval(null)
      val set = WinnowSet(lit, k, w).eval(null)
      if (stats == null) set == null
      else {
        val row = stats.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
        val arr = set.asInstanceOf[ArrayData].toLongArray().toSeq
        // same cardinality, same extremes, same modular checksum, sorted
        arr.length == row.getInt(1) &&
          arr.sorted == arr &&
          (arr.isEmpty || (arr.head == row.getLong(3) && arr.last == row.getLong(4))) &&
          arr.foldLeft(0L)((a, v) => (a + v) % PolyHash.Mod) == row.getLong(2)
      }
    }

  property("bloom filter: no false negatives under any geometry or merge split") =
    forAll(Gen.listOf(Gen.choose(Long.MinValue, Long.MaxValue)),
      Gen.oneOf(64, 128, 1024), Gen.choose(1, 8)) { (keys, numBits, numHashes) =>
      // build as two merged partials, like a partial/final aggregate
      val (a, b) = keys.splitAt(keys.length / 2)
      val bufA = new Array[Long](numBits / 64)
      val bufB = new Array[Long](numBits / 64)
      a.foreach(k => BloomRuntime.set(bufA, k, numHashes))
      b.foreach(k => BloomRuntime.set(bufB, k, numHashes))
      val merged = bufA.zip(bufB).map { case (x, y) => x | y }
      val bits = new GenericArrayData(merged)
      keys.forall(k => BloomRuntime.contains(bits, k, numHashes))
    }
}
