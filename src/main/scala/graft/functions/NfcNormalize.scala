package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (canonical decomposition + canonical
  * composition) as a native Catalyst expression.
  *
  * Why native: normalization is the first stage of any web-corpus text
  * pipeline (mojibake repair, dedup-key canonicalization — two strings
  * that render identically must hash identically), and it has a
  * cross-engine contract: `java.text.Normalizer` (JDK, Unicode UAX #15)
  * and DuckDB's `nfc_normalize` (utf8proc) implement the same standard,
  * so results are oracle-checkable byte-for-byte. A native expression
  * keeps the hot path inside whole-stage codegen where a Scala UDF
  * would box every row (SURVEY §4.2 preference order).
  *
  * Fast path: `Normalizer.isNormalized` is O(n) with no allocation for
  * already-NFC text (the overwhelmingly common case in a real corpus),
  * in which case the input UTF8String is returned as-is — zero copy.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a string argument, got ${child.dataType.sql}")
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"
  override def foldable: Boolean = child.foldable

  override protected def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |String s_${ev.value} = $c.toString();
         |if (java.text.Normalizer.isNormalized(s_${ev.value}, java.text.Normalizer.Form.NFC)) {
         |  ${ev.value} = $c;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |    java.text.Normalizer.normalize(s_${ev.value}, java.text.Normalizer.Form.NFC));
         |}
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
