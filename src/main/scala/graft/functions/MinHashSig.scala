package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** MinHash signature of an in-row shingle-hash array: k affine hashes
  * `h_i(x) = (a_i·x + b_i) mod (2^31-1)` element-wise-min'd over the
  * array — the same parameters and arithmetic as
  * [[MinHashAggregator]] (cross-pinned in the function properties),
  * but computed where the data already lives. The signature depends
  * only on the row's own shingles, so the explode → per-doc UDAF
  * shuffle it replaces moved every shingle hash across the wire
  * (carrying the full array through `first()` columns besides) for a
  * row-local O(|hs|·k) loop. Returns null for an empty array (no
  * shingles → no signature).
  */
case class MinHashSig(child: Expression, k: Int)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if k >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires (array<bigint>, k >= 1), got ${child.dataType.sql}, k=$k")
  }
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val m = hs.numElements()
    if (m == 0) return null
    val P = PolyHash.Mod
    val sig = Array.fill(k)(Long.MaxValue)
    var seen = false
    var j = 0
    while (j < m) {
      // the SQL function is callable on arbitrary array<bigint> input:
      // a null element is no shingle at all, not hash value 0
      if (!hs.isNullAt(j)) {
        seen = true
        val x = hs.getLong(j)
        var i = 0
        while (i < k) {
          val h = (((i.toLong * 7919 + 1) % P) * x + (i.toLong * 104729 + 12345) % P) % P
          if (h < sig(i)) sig(i) = h
          i += 1
        }
      }
      j += 1
    }
    if (!seen) return null
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
