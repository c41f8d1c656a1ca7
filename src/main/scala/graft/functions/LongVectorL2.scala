package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact squared L2 distance of two `array<bigint>` columns:
  * {{{ Σ_d (x_d − y_d)²  : long }}}
  *
  * The distance sibling of [[LongVectorDot]], built for the quantized
  * k-means family (assignment argmin, PQ encode/ADC, k-center greedy):
  * every call site previously folded
  * `aggregate(zip_with(sv, m, (a, b) -> (a - b) * (a - b)), 0L, ...)`
  * per (vector, centroid) pair — interpreted, one boxed array per
  * pair. Plain long arithmetic, commutative, engine-exact:
  * `SUM((a − b) * (a − b))` over exploded dimensions reproduces it.
  *
  * Range: 1e-6-lattice quantized embeddings keep |x_d| ≲ 2²¹, so each
  * squared difference is < 2⁴⁴ and 4096 dims stay < 2⁵⁶ — inside
  * long. Callers with larger magnitudes own overflow (the SQL integer
  * SUM contract).
  *
  * Length contract: folds over `min(|x|, |y|)` elements — the SQL
  * `zip_with` convention, matching [[VectorDotScaled]].
  */
case class LongVectorL2(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"long_vector_l2 requires two array<bigint> arguments, got ${l.sql}, ${r.sql}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "long_vector_l2"
  override def foldable: Boolean = left.foldable && right.foldable

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = x.getLong(i) - y.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $d = $x.getLong($i) - $y.getLong($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongVectorL2 =
    copy(left = newLeft, right = newRight)
}
