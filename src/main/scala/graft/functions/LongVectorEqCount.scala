package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Count of positions where two `array<bigint>` columns agree:
  * {{{ |{ d : x_d = y_d }|  : int }}}
  *
  * The agreement sibling of [[LongVectorDot]]/[[LongVectorL2]], built
  * for MinHash signature comparison: estimated Jaccard = agreeing
  * positions / k. Every LSH candidate pair previously evaluated
  * `size(filter(zip_with(sig1, sig2, (x, y) -> x = y), b -> b))` —
  * two interpreted lambda passes and two boxed intermediate arrays per
  * pair, on the candidate stream that IS the near-dup workload at
  * scale. Engine-exact: `SUM(CASE WHEN a = b THEN 1 END)` over
  * exploded positions reproduces it.
  *
  * Length contract: folds over `min(|x|, |y|)` elements — the SQL
  * `zip_with` convention (a trailing unmatched position under true
  * zip_with yields `x = null → null → filtered`, i.e. never counts, so
  * min-length is the same semantics).
  */
case class LongVectorEqCount(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"long_vector_eq_count requires two array<bigint> arguments, got ${l.sql}, ${r.sql}")
    }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "long_vector_eq_count"
  override def foldable: Boolean = left.foldable && right.foldable

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0
    var i = 0
    while (i < n) {
      if (x.getLong(i) == y.getLong(i)) acc += 1
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
         |int $acc = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.getLong($i) == $y.getLong($i)) $acc++;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongVectorEqCount =
    copy(left = newLeft, right = newRight)
}
