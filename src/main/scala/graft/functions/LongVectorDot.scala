package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact dot product of two `array<bigint>` columns:
  * {{{ Σ_d x_d · y_d  : long }}}
  *
  * The integer sibling of [[VectorDotScaled]], built for quantized-code
  * scoring (SQ8 byte codes, PQ/ADC-style code arithmetic): plain long
  * multiply-accumulate, no rounding, commutative and engine-exact by
  * construction — `SUM(a.q * b.q)` over exploded dimensions reproduces
  * it in any SQL engine. The declarative form it replaces,
  * `aggregate(zip_with(qa, qb, (x, y) -> x * y), 0L, ...)`, allocates a
  * boxed intermediate array per pair and runs the lambda interpreted;
  * on an all-pairs candidate scan that is the dominant cost (the sf1
  * scale probe measured the SQ8 scan at ~194 s bench / 467 s verify —
  * same class of win as the CDC rolling-hash rewrite, q156).
  *
  * Range: SQ8 codes are ≤ 255, so 4096 dims stay < 2^28 — far inside
  * long. Callers with larger magnitudes own overflow (same contract as
  * SQL integer SUM).
  *
  * Length contract: folds over `min(|x|, |y|)` elements — the SQL
  * `zip_with` convention, matching [[VectorDotScaled]].
  */
case class LongVectorDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"long_vector_dot requires two array<bigint> arguments, got ${l.sql}, ${r.sql}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "long_vector_dot"
  override def foldable: Boolean = left.foldable && right.foldable

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $x.getLong($i) * $y.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongVectorDot =
    copy(left = newLeft, right = newRight)
}
