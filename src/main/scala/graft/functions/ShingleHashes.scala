package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Sorted distinct [[PolyHash]] values of a token array's word
  * n-gram shingles — the shingle stage of the Jaccard/MinHash dedup
  * pipeline as ONE native expression.
  *
  * Equivalent to
  * {{{ array_sort(array_distinct(transform(shingles, poly_hash))) }}}
  * over `concat_ws(' ', toks[i..i+n-1])` shingles, but instead of
  * materializing every shingle string and hashing it from scratch
  * (adjacent shingles share n-1 tokens, so that re-hashes each
  * codepoint n times through interpreted higher-order lambdas), it
  * computes one rolling prefix hash over the space-joined token
  * stream and derives every shingle's hash as
  * {{{ (P[e] - P[s] * 31^(e-s)) mod (2^31-1) }}}
  * — O(total codepoints + shingles) per document. The modulus is
  * prime and fixed, so the identity holds exactly and the values are
  * bit-identical to [[PolyHash]] (property-tested against the
  * compositional pipeline).
  *
  * Deliberate `CodegenFallback` (the [[WinnowStats]] precedent): the
  * per-row loop IS the work; one virtual call per row is noise next
  * to hashing hundreds of shingles, and fallback keeps the array
  * builder in plain JVM code.
  */
case class ShingleHashes(child: Expression, n: Int)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires (array<string>, n >= 1), got ${child.dataType.sql}, n=$n")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val t = toks.numElements()
    if (t < n) return new GenericArrayData(Array.empty[Long])
    // codepoint stream = tok0 ⧺ ' ' ⧺ tok1 ⧺ ' ' ⧺ …; a shingle over
    // toks[i..i+n-1] is exactly the substream [off(i), end(i+n-1))
    val cps = new java.lang.StringBuilder()
    val offsets = new Array[Int](t) // codepoint offset of each token
    val ends = new Array[Int](t)    // codepoint end (exclusive)
    var cpCount = 0
    val tokCps = new Array[Array[Int]](t)
    var i = 0
    while (i < t) {
      val s = toks.get(i, StringType)
      val str = if (s == null) "" else s.asInstanceOf[UTF8String].toString
      val arr = str.codePoints().toArray
      tokCps(i) = arr
      offsets(i) = if (i == 0) 0 else cpCount
      cpCount += arr.length
      ends(i) = cpCount
      cpCount += 1 // separator space (not counted for the last token's end)
      i += 1
    }
    val streamLen = cpCount - 1 // no trailing separator
    val mod = PolyHash.Mod
    val base = PolyHash.Base
    val pref = new Array[Long](streamLen + 1)
    val pow = new Array[Long](streamLen + 1)
    pow(0) = 1L
    var k = 0
    i = 0
    while (i < t) {
      val arr = tokCps(i)
      var j = 0
      while (j < arr.length) {
        pref(k + 1) = (pref(k) * base + arr(j)) % mod
        pow(k + 1) = (pow(k) * base) % mod
        k += 1; j += 1
      }
      if (i < t - 1) { // separator
        pref(k + 1) = (pref(k) * base + ' '.toInt) % mod
        pow(k + 1) = (pow(k) * base) % mod
        k += 1
      }
      i += 1
    }
    val out = new Array[Long](t - n + 1)
    i = 0
    while (i <= t - n) {
      val s = offsets(i)
      val e = ends(i + n - 1)
      var h = (pref(e) - (pref(s) * pow(e - s)) % mod) % mod
      if (h < 0) h += mod
      out(i) = h
      i += 1
    }
    java.util.Arrays.sort(out)
    // in-place dedup of the sorted hashes
    var w = 0
    i = 0
    while (i < out.length) {
      if (i == 0 || out(i) != out(i - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}
