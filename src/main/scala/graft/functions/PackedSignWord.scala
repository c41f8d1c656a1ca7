package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Sign-bit packing of a scaled-long vector against frozen
  * per-dimension corpus sums: bit `i − lo` of the result is set iff
  * {{{ sv[i] · n > tot[i]   for i ∈ [lo, hi] }}}
  * — the strictly-above-mean test in exact integer arithmetic that
  * [[graft.llm.VectorSearch.binaryCodes]] (two 32-bit words) and
  * [[graft.llm.VectorSearch.packedSignCodes]] (one 64-bit word) build
  * their binary-quantization codes from. `tot` and `n` are plan-time
  * constants (a dim-row driver collect), so the generated code tests
  * against a referenced long[] with zero per-row decoding.
  *
  * Why a native expression: the declarative form —
  * `aggregate(sequence(lo, hi), 0L, (acc, i) -> acc | CASE WHEN
  * element_at(sv, i+1) * n > element_at(tot, i+1) THEN shiftleft(1L,
  * i-lo) ELSE 0 END)` — runs the lambda INTERPRETED with per-step
  * Long boxing, 64 steps per row, and (worse) is deterministic and
  * collapsible, so CollapseProject could re-evaluate it per candidate
  * PAIR in the IVF join unless barricaded. This loop is whole-stage
  * codegen'd, O(dims) per row with zero allocation. Bit-identical to
  * the fold (property-pinned in `BinaryHammingSpec`): a null or
  * missing element compares NULL in the fold and contributes no bit,
  * which is exactly the `isNullAt`/length guard here.
  *
  * Range contract: `sv[i] · n` uses plain long multiplication, the
  * same wrapping arithmetic as the SQL fold it replaces; with the
  * 1e6-quantized lattice (|sv[i]| ≤ ~2³⁰ for |v| ≤ 1000) corpora up
  * to ~2³² rows stay exact — beyond that the caller re-scales, the
  * same contract as the `long_vector_*` siblings.
  */
case class PackedSignWord(child: Expression, tot: Array[Long], n: Long,
                          lo: Int, hi: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) if lo >= 0 && hi >= lo && hi - lo < 64 =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"packed_sign_word requires array<bigint> with 0 <= lo <= hi < lo+64, " +
          s"got ${t.sql}, lo=$lo, hi=$hi")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "packed_sign_word"
  override def foldable: Boolean = child.foldable

  override protected def nullSafeEval(input: Any): Any =
    PackedSignWordOps.compute(input.asInstanceOf[ArrayData], tot, n, lo, hi)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tot", tot, "long[]")
    nullSafeCodeGen(ctx, ev, sv =>
      s"${ev.value} = graft.functions.PackedSignWordOps.compute($sv, $ref, ${n}L, $lo, $hi);")
  }

  override protected def withNewChildInternal(newChild: Expression): PackedSignWord =
    copy(child = newChild)
}

/** Static helper (object without companion class → Java-callable
  * static forwarders for the generated code). */
object PackedSignWordOps {
  def compute(sv: ArrayData, tot: Array[Long], n: Long, lo: Int, hi: Int): Long = {
    // element_at beyond either array's length folds to NULL → no bit
    val end = math.min(hi, math.min(sv.numElements(), tot.length) - 1)
    var acc = 0L
    var i = lo
    while (i <= end) {
      if (!sv.isNullAt(i) && sv.getLong(i) * n > tot(i))
        acc |= (1L << (i - lo))
      i += 1
    }
    acc
  }
}
