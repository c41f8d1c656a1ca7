package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Exact scaled-integer dot product of two `array<float>` columns:
  * {{{ Σ_d roundAwayFromZero(x_d · y_d · 10^12)  : long }}}
  *
  * Why this exists (SURVEY §4.2 "codegen'd Expression for cosine"):
  * a floating SUM is order-dependent, so an external oracle can't
  * reproduce it, and the Decimal-typed fold that *is* order-independent
  * runs interpreted (boxed BigDecimal per element — benchmarked 100×
  * slower than this on the kNN pair fan-out). Scaling each
  * double product to an integer micro-unit keeps the sum exact and
  * commutative in plain long arithmetic, inside whole-stage codegen.
  *
  * Portability contract: both operands are widened to double before
  * multiply; rounding is half-away-from-zero — the same semantics as
  * `round()` on a double in ANSI SQL engines, so
  * `SUM(CAST(round(CAST(x AS DOUBLE)*CAST(y AS DOUBLE)*1e12) AS BIGINT))`
  * reproduces the value bit-for-bit.
  *
  * Range: |x·y| ≤ ~1 per element at unit-ish norms and ≤ 4096
  * elements keeps the sum < 2^63; products are < 2^53/1e12 so the
  * scaled double is exactly representable before rounding.
  *
  * Length contract: the fold runs over `min(|x|, |y|)` elements —
  * mismatched-length inputs zip to the shorter vector (the SQL
  * `zip_with`/`aggregate` convention) rather than erroring. Callers
  * that need corrupt-vector detection should validate lengths
  * upstream (`size(vec) = dim`); the engine's embedding pipelines all
  * operate at a fixed declared `dim`.
  */
case class VectorDotScaled(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vector_dot_scaled requires two array<float> arguments, got ${l.sql}, ${r.sql}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "vector_dot_scaled"
  // deterministic pure function: constant arguments fold at plan time
  override def foldable: Boolean = left.foldable && right.foldable

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val p = x.getFloat(i).toDouble * y.getFloat(i).toDouble * 1e12
      acc += (if (p >= 0) math.floor(p + 0.5) else math.ceil(p - 0.5)).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc"); val p = ctx.freshName("p")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $p = ((double) $x.getFloat($i)) * ((double) $y.getFloat($i)) * 1e12;
         |  $acc += (long) ($p >= 0 ? java.lang.Math.floor($p + 0.5) : java.lang.Math.ceil($p - 0.5));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDotScaled =
    copy(left = newLeft, right = newRight)
}
