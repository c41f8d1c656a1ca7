package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Decimal-exact squared L2 distance of a float/double vector against
  * a double codebook row:
  * {{{ Σ_d round₁₂((x_d − c_d)²)  : double }}}
  *
  * where round₁₂ is Spark's own double→DECIMAL(_,12) cast semantics
  * (HALF_UP on the shortest decimal representation,
  * `BigDecimal.valueOf`), the sum is exact (unscaled scale-12 longs),
  * and the final value converts decimal→double exactly as Spark's
  * `Decimal.toDouble`. Bit-identical to the declarative form it
  * replaces —
  * `aggregate(…, cast(0 as decimal(26,12)), (acc, i) -> acc + cast((x-c)² as decimal(26,12)))`
  * — which itself equals the original shuffled
  * `SUM(cast((x-c)² as decimal(38,12)))`: decimal addition at a fixed
  * scale is exact and associative. The DuckDB oracle reproduces it
  * with the same decimal-cast SUM.
  *
  * Why native: the IVF coarse ranking ([[graft.llm.VectorSearch]]
  * `ivfAssign`) evaluates this once per (vector, centroid); the
  * Catalyst higher-order fold ran interpreted with per-step Decimal
  * boxing — at √N-sized codebooks the assignment dominated the whole
  * search tier (measured 25 s of a 27 s sf1 run; the tight loop
  * retires it).
  *
  * Range contract: each term's unscaled scale-12 value and their sum
  * must fit a long (|x−c|² ≤ ~9.2e6 summed) — far above embedding
  * magnitudes; callers with larger values own the overflow, matching
  * the `long_vector_*` siblings' SQL integer contract. Folds over
  * `min(|x|, |c|)` elements (the `zip_with` convention).
  */
case class DecimalL2(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"decimal_l2 requires array<float|double>, array<double>, got ${l.sql}, ${r.sql}")
    }

  private def leftIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = DoubleType
  override def prettyName: String = "decimal_l2"
  override def foldable: Boolean = left.foldable && right.foldable

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DecimalL2Ops.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.DecimalL2Ops.compute($x, $y, $leftIsFloat);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DecimalL2 =
    copy(left = newLeft, right = newRight)
}

/** Static helper (object without companion class → Java-callable
  * static forwarders for the generated code). */
object DecimalL2Ops {
  def compute(x: ArrayData, y: ArrayData, leftIsFloat: Boolean): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val xv = if (leftIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val d = xv - y.getDouble(i)
      // addExact: accumulator overflow must fail as loudly as the
      // per-term longValueExact, not wrap to a silently wrong distance
      acc = Math.addExact(acc, java.math.BigDecimal.valueOf(d * d)
        .setScale(12, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValueExact())
      i += 1
    }
    java.math.BigDecimal.valueOf(acc, 12).doubleValue()
  }
}
