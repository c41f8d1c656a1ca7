package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The winnowing SELECTION itself — the distinct window-minimum
  * fingerprints of [[WinnowStats]], returned as a sorted
  * `array<long>` instead of reduced to summary stats. This is the
  * per-document posting list a fingerprint inverted index is built
  * from (MOSS-style partial-overlap detection): identical rolling
  * k-gram hash + monotonic-deque minima pipeline, so `winnow_set` and
  * `winnow_stats` select exactly the same fingerprints (cross-pinned
  * in `FunctionProperties`).
  *
  * Null for documents with fewer than `w` k-grams, mirroring the
  * length guard of the declarative form. `CodegenFallback` is
  * deliberate: the per-row loop dominates, fusion buys nothing here.
  */
case class WinnowSet(child: Expression, k: Int, w: Int)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow_set requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "winnow_set"

  private val B = PolyHash.Base
  private val P = PolyHash.Mod

  override protected def nullSafeEval(input: Any): Any = {
    val cps = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    val n = cps.length - k + 1
    if (n < w) return null
    val hashes = new Array[Long](n)
    var h = 0L
    var i = 0
    while (i < k) { h = (h * B + cps(i)) % P; i += 1 }
    hashes(0) = h
    var bk1 = 1L
    i = 1
    while (i < k) { bk1 = (bk1 * B) % P; i += 1 }
    i = 1
    while (i < n) {
      h = (((h - cps(i - 1) * bk1) % P + P) % P * B + cps(i + k - 1)) % P
      hashes(i) = h
      i += 1
    }
    val deque = new Array[Int](n)
    var head = 0; var tail = 0
    val selected = new java.util.HashSet[Long]()
    i = 0
    while (i < n) {
      while (tail > head && hashes(deque(tail - 1)) >= hashes(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) selected.add(hashes(deque(head)))
      i += 1
    }
    val out = new Array[Long](selected.size())
    val it = selected.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    java.util.Arrays.sort(out)
    ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowSet =
    copy(child = newChild)
}
