package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking in ONE rolling pass: returns the
  * [[PolyHash]] of every chunk of the input string, where a chunk
  * boundary sits BEFORE each position `p ∈ [2, L−w+1]` whose
  * w-codepoint window hash satisfies `polyhash(s[p..p+w−1]) ≡ 0
  * (mod mask)` — identical, value-for-value, to
  * `poly_hash(substring(text, p, w))`, which is what the DuckDB
  * oracle computes.
  *
  * Why a native expression: the declarative form
  * (`filter(sequence(..), i -> poly_hash(substring(text, i, w)))`)
  * re-hashes a fresh w-char substring at every position — O(L·w) time
  * and one string allocation per position, measured at 23 s for the
  * corpus scan the rolling form does in under a second. Here the
  * window hash rolls in O(1) per position
  * (`h' = (h − c_out·B^{w−1})·B + c_in mod M`) and the chunk hash
  * accumulates in the same pass — O(L) total, zero allocation beyond
  * the output array. Boundary positions and chunk hashes are
  * bit-identical to the declarative form (suite-pinned in
  * `Round8OperatorsSpec` and oracle-checked by q156).
  *
  * Empty string → single hash 0 (one empty chunk), matching
  * `poly_hash("")`.
  */
case class CdcChunkHashes(child: Expression, w: Int, mask: Int)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && w >= 2 && mask >= 1)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cdc_chunk_hashes requires (string, w >= 2, mask >= 1), " +
        s"got ${child.dataType.sql}, w=$w, mask=$mask")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cdc_chunk_hashes"

  override protected def nullSafeEval(input: Any): Any = {
    val cp = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    val l = cp.length
    val b = PolyHash.Base
    val m = PolyHash.Mod
    // B^(w-1) mod M for the rolling eviction term
    var bw1 = 1L
    var t = 0
    while (t < w - 1) { bw1 = bw1 * b % m; t += 1 }
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    // window hash for boundary position p covers cp[p-1 .. p+w-2]
    // (0-based); seed it for p = 2 when such a window exists
    var wh = 0L
    if (l >= w + 1) {
      var j = 1
      while (j <= w) { wh = (wh * b + cp(j)) % m; j += 1 }
    }
    var chunk = 0L
    var p = 1
    while (p <= l) {
      if (p >= 2 && p <= l - w + 1) {
        if (wh % mask == 0) { out += chunk; chunk = 0L }
        if (p + 1 <= l - w + 1)
          wh = ((wh - cp(p - 1) * bw1 % m + m) % m * b + cp(p - 1 + w)) % m
      }
      chunk = (chunk * b + cp(p - 1)) % m
      p += 1
    }
    out += chunk
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): CdcChunkHashes =
    copy(child = newChild)
}
