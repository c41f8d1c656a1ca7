package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint statistics of a document in one O(L) pass:
  * char k-gram poly-hashes via a *rolling* update (not a per-gram
  * refold) and window-w minima via a monotonic deque (not a per-window
  * rescan), then the distinct selected hashes reduced to
  * `(n_kgrams, n_selected, checksum, min_fp, max_fp)`.
  *
  * Produces exactly the values of the declarative
  * `transform(sequence…, array_min(slice…))` formulation it replaces —
  * modular rolling updates are exact — but O(L) instead of O(L·(k+w));
  * the oracle keeps computing the naive form. `CodegenFallback` is
  * deliberate: the per-row loop dominates, fusion buys nothing here.
  */
case class WinnowStats(child: Expression, k: Int, w: Int)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow_stats requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = StructType(Seq(
    StructField("n_kgrams", IntegerType, nullable = false),
    StructField("n_selected", IntegerType, nullable = false),
    StructField("checksum", LongType, nullable = false),
    StructField("min_fp", LongType, nullable = false),
    StructField("max_fp", LongType, nullable = false)))

  override def prettyName: String = "winnow_stats"

  private val B = PolyHash.Base
  private val P = PolyHash.Mod

  override protected def nullSafeEval(input: Any): Any = {
    val cps = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    val n = cps.length - k + 1 // number of k-grams
    if (n < w) return null     // mirrors the length guard in the query
    // rolling k-gram hashes
    val hashes = new Array[Long](n)
    var h = 0L
    var i = 0
    while (i < k) { h = (h * B + cps(i)) % P; i += 1 }
    hashes(0) = h
    var bk1 = 1L // B^(k-1) mod P
    i = 1
    while (i < k) { bk1 = (bk1 * B) % P; i += 1 }
    i = 1
    while (i < n) {
      h = (((h - cps(i - 1) * bk1) % P + P) % P * B + cps(i + k - 1)) % P
      hashes(i) = h
      i += 1
    }
    // monotonic-deque sliding minima over windows of w, distinct-collected
    val deque = new Array[Int](n)
    var head = 0; var tail = 0 // deque of indices, values increasing
    val selected = new java.util.HashSet[Long]()
    i = 0
    while (i < n) {
      while (tail > head && hashes(deque(tail - 1)) >= hashes(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) selected.add(hashes(deque(head)))
      i += 1
    }
    var checksum = 0L; var minFp = Long.MaxValue; var maxFp = Long.MinValue
    val it = selected.iterator()
    while (it.hasNext) {
      val v = it.next()
      checksum = (checksum + v) % P
      if (v < minFp) minFp = v
      if (v > maxFp) maxFp = v
    }
    InternalRow(n, selected.size(), checksum, minFp, maxFp)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowStats =
    copy(child = newChild)
}
