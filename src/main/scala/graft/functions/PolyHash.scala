package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Portable polynomial rolling hash over a string's Unicode codepoints:
  * {{{ h = fold(cp => (h * 31 + cp) mod 2147483647) }}}
  *
  * Why a custom Catalyst `Expression` instead of Spark's `hash`/`xxhash64`:
  * the engine's MinHash / SimHash / fingerprint operators must be
  * verifiable by an external SQL oracle, so the hash has to be
  * *arithmetically portable* — this fold is one line of `list_reduce`
  * in any engine with lambdas, while Murmur3 is not. A native
  * expression (with `doGenCode`) keeps the hot path inside whole-stage
  * codegen where a Scala UDF would box every row (SURVEY §4.2's
  * preference order).
  *
  * Iterates *codepoints*, not UTF-16 chars, so supplementary-plane
  * characters hash identically to engines that iterate characters.
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"poly_hash requires a string argument, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"
  // deterministic pure function: constant arguments fold at plan time
  override def foldable: Boolean = child.foldable

  override protected def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |java.util.PrimitiveIterator.OfInt it_${ev.value} = $c.toString().codePoints().iterator();
         |long acc_${ev.value} = 0L;
         |while (it_${ev.value}.hasNext()) {
         |  acc_${ev.value} = (acc_${ev.value} * ${PolyHash.Base}L + it_${ev.value}.nextInt()) % ${PolyHash.Mod}L;
         |}
         |${ev.value} = acc_${ev.value};
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  val Base = 31L
  val Mod = 2147483647L // 2^31 - 1; Base*Mod + maxCodepoint < 2^63, no overflow

  def hash(s: String): Long = {
    var acc = 0L
    val it = s.codePoints().iterator()
    while (it.hasNext) acc = (acc * Base + it.nextInt()) % Mod
    acc
  }

  /** The DuckDB expression computing the identical value — used by the
    * oracle SQL builders.
    */
  def duckdbSql(col: String): String =
    s"list_reduce(list_prepend(0::BIGINT, [unicode(c)::BIGINT for c in string_split($col, '')]), (acc, c) -> (acc * $Base + c) % $Mod)"
}
