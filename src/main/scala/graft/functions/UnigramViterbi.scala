package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi segmentation of one word under a unigram language model
  * (Kudo, "Subword Regularization", ACL'18 — the SentencePiece
  * unigram family): returns the piece sequence maximizing
  * Σ log p(piece), as an in-row DP — the natural Spark home for a
  * per-row lattice walk (a join-chain formulation would re-shuffle
  * the corpus once per character position).
  *
  * Scores arrive as FIXED-POINT NANOS (`round(ln(c/T), 9) × 10⁹` as
  * long) — the engine's portable-log discipline turned into an exact
  * integer max-plus semiring, so the DP's comparisons are
  * bit-identical to the oracle's DECIMAL(27,9) sums. Ties break
  * toward the SMALLEST split point j (the longest last piece): the
  * DP takes strictly-greater while scanning j ascending, which the
  * oracle mirrors with `ORDER BY s DESC, j`. All indexing is by
  * CODEPOINT (Spark `substring` and DuckDB `substr` semantics), not
  * UTF-16 units.
  *
  * A position reachable by no vocabulary piece falls back to an
  * unknown-single-char transition at [[UnigramViterbi.UnkLpNanos]]
  * (ln 10⁻²⁰ — below any real piece, so it never competes when a
  * vocab path exists). The declared queries never hit it: their
  * vocabulary carries every single character of the corpus.
  *
  * Deliberate `CodegenFallback` (the [[ShingleHashes]] precedent):
  * the per-row DP loop is the work; the piece table is a shared
  * transient hash map built once per executor.
  */
case class UnigramViterbi(child: Expression, pieces: Array[String],
                          lpNanos: Array[Long], maxPieceLen: Int)
  extends UnaryExpression with CodegenFallback {
  require(pieces.length == lpNanos.length && maxPieceLen >= 1,
    "pieces/lpNanos must align and maxPieceLen >= 1")

  @transient private lazy val lp: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](pieces.length * 2)
    var i = 0
    while (i < pieces.length) { m.put(pieces(i), lpNanos(i)); i += 1 }
    m
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unigram_segment requires a string word, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_segment"

  override protected def nullSafeEval(input: Any): Any = {
    val cps = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    val n = cps.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val best = Array.fill(n + 1)(Long.MinValue)
    val choice = new Array[Int](n + 1)
    best(0) = 0L
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        if (best(j) != Long.MinValue) {
          val piece = new String(cps, j, i - j)
          val s = lp.get(piece)
          val cand =
            if (s != null) best(j) + s.longValue()
            else if (i - j == 1) best(j) + UnigramViterbi.UnkLpNanos
            else Long.MinValue
          if (cand != Long.MinValue && cand > best(i)) {
            best(i) = cand; choice(i) = j
          }
        }
        j += 1
      }
      i += 1
    }
    // backtrack from n; reverse in place to forward order
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var p = n
    while (p > 0) {
      val j = choice(p)
      out += UTF8String.fromString(new String(cps, j, p - j))
      p = j
    }
    new GenericArrayData(out.reverseIterator.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramViterbi =
    copy(child = newChild)
}

object UnigramViterbi {
  /** ln(10⁻²⁰) in nanos — the unknown-single-char fallback score. */
  val UnkLpNanos: Long = -46051701860L
}
