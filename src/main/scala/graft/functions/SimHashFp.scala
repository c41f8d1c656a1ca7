package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Weighted SimHash fingerprint of a token array's word n-grams in one
  * per-row pass: count exact n-gram strings, then accumulate each
  * distinct gram's [[PolyHash]] bit pattern ± its count into `bits`
  * signed sums; the fingerprint sets bit j iff sum(j) > 0.
  *
  * Why native: the fingerprint depends only on the row's own tokens,
  * so the explode → GROUP BY (doc, gram) → per-doc bit-sum dataflow
  * paid full-corpus shuffles for a row-local computation. Arithmetic
  * is identical integer math in the same order-independent sums, so
  * fingerprints are bit-identical to the dataflow form (property-
  * tested; oracle unchanged). `CodegenFallback` by the
  * [[ShingleHashes]] precedent. Returns null when no full gram exists.
  */
case class SimHashFp(child: Expression, n: Int, bits: Int)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 && bits >= 1 && bits <= 64 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"simhash_fp requires (array<string>, n >= 1, 1 <= bits <= 64), " +
        s"got ${child.dataType.sql}, n=$n, bits=$bits")
  }
  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_fp"

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val t = toks.numElements()
    if (t < n) return null
    val strs = new Array[String](t)
    var i = 0
    while (i < t) {
      val s = toks.get(i, StringType)
      strs(i) = if (s == null) "" else s.asInstanceOf[UTF8String].toString
      i += 1
    }
    val counts = new java.util.HashMap[String, Long]()
    val sb = new java.lang.StringBuilder()
    i = 0
    while (i <= t - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(strs(i + j))
        j += 1
      }
      counts.merge(sb.toString, 1L, (a, b) => a + b)
      i += 1
    }
    val sums = new Array[Long](bits)
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val h = PolyHash.hash(e.getKey)
      val w = e.getValue
      var j = 0
      while (j < bits) {
        sums(j) += (((h >> j) & 1L) * 2L - 1L) * w
        j += 1
      }
    }
    var fp = 0L
    var j = 0
    while (j < bits) {
      if (sums(j) > 0) fp |= 1L << j
      j += 1
    }
    fp
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashFp =
    copy(child = newChild)
}
