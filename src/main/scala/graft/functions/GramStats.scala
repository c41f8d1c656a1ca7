package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram occurrence statistics of one token array, in one
  * per-row pass: `total` n-gram occurrences, `maxc` (count of the
  * most frequent n-gram) and `dupc` (occurrences belonging to any
  * n-gram seen more than once) — the raw counts behind repetition
  * quality metrics.
  *
  * Why native: the metrics are *per-document*, so the
  * explode → `GROUP BY (doc, gram)` → re-group formulation pays two
  * full-corpus shuffles for what one in-row hash map computes in
  * O(tokens). Exact gram STRINGS are counted (not their hashes — a
  * within-document hash collision would corrupt counts and break the
  * string-based oracle). `CodegenFallback` by the [[WinnowStats]] /
  * [[ShingleHashes]] precedent: the per-row loop is the work.
  *
  * Returns null for arrays shorter than `n` (no full gram exists).
  */
case class GramStats(child: Expression, n: Int)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"gram_stats requires (array<string>, n >= 1), got ${child.dataType.sql}, n=$n")
  }
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("total", LongType, nullable = false),
    StructField("maxc", LongType, nullable = false),
    StructField("dupc", LongType, nullable = false)))
  override def prettyName: String = "gram_stats"

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
    val total = (t - n + 1).toLong
    var maxc = 0L
    var dupc = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      if (c > maxc) maxc = c
      if (c > 1) dupc += c
    }
    InternalRow(total, maxc, dupc)
  }

  override protected def withNewChildInternal(newChild: Expression): GramStats =
    copy(child = newChild)
}
