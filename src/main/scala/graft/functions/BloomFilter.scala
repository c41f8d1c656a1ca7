package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Shared hashing for the Bloom-filter aggregate and membership
  * expression: splitmix64 finalizer (public-domain constants from
  * Steele et al., "Fast Splittable Pseudorandom Number Generators")
  * double-hashed into `numHashes` bit positions — `g_i = h1 + i·h2`
  * with `h2` forced odd so the probe sequence walks the whole table.
  */
object BloomRuntime {
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def set(bits: Array[Long], key: Long, numHashes: Int): Unit = {
    val h1 = mix(key)
    val h2 = mix(h1) | 1L
    val nbits = bits.length.toLong * 64L
    var i = 0
    while (i < numHashes) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i * h2, nbits)
      bits((pos >>> 6).toInt) |= 1L << (pos & 63)
      i += 1
    }
  }

  /** Static, codegen-callable membership probe over the ArrayData the
    * aggregate emitted. False positives possible; false negatives not. */
  def contains(bits: ArrayData, key: Long, numHashes: Int): Boolean = {
    val h1 = mix(key)
    val h2 = mix(h1) | 1L
    val nbits = bits.numElements().toLong * 64L
    var i = 0
    while (i < numHashes) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i * h2, nbits)
      if ((bits.getLong((pos >>> 6).toInt) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }
}

/** Distributed Bloom-filter build: each task ORs keys into a local
  * fixed-size bitset; partial buffers merge by OR. The result is an
  * `array<bigint>` bitset small enough to broadcast — the runtime-
  * filter pattern for joins where the dim side's key set is too big to
  * broadcast as rows but its membership fits in a few MB of bits
  * (`numBits/8` bytes regardless of key count). Lossless as a join
  * PRE-filter: no false negatives, so exact join semantics are
  * preserved and false positives only cost post-filter work.
  */
case class BloomBuildAgg(
    key: Expression, numBits: Int, numHashes: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(key)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bloom_build"

  override def checkInputDataTypes(): TypeCheckResult =
    if (key.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_build requires a bigint key, got ${key.dataType.sql}")
    else if (numBits < 64 || numBits % 64 != 0 || numHashes < 1)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_build requires numBits a positive multiple of 64 and numHashes >= 1")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val k = key.eval(input)
    if (k != null) BloomRuntime.set(buf, k.asInstanceOf[Long], numHashes)
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(buf.length * 8 + 4)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach(out.writeLong)
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    Array.fill(n)(in.readLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BloomBuildAgg =
    copy(key = newChildren.head)
}

/** `bloom_contains(bits, key)` — membership probe, fully codegen'd (a
  * static call inside whole-stage codegen) because it sits in the scan
  * filter of the fact side, the hottest path of the prefiltered join.
  */
case class BloomMightContain(bits: Expression, key: Expression, numHashes: Int)
  extends BinaryExpression {

  override def left: Expression = bits
  override def right: Expression = key
  override def nullable: Boolean = true
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains"

  override def checkInputDataTypes(): TypeCheckResult = (bits.dataType, key.dataType) match {
    case (ArrayType(LongType, _), LongType) if numHashes >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"bloom_contains requires (array<bigint>, bigint), got " +
        s"${bits.dataType.sql}, ${key.dataType.sql}")
  }

  override protected def nullSafeEval(bitsVal: Any, keyVal: Any): Any =
    BloomRuntime.contains(bitsVal.asInstanceOf[ArrayData],
      keyVal.asInstanceOf[Long], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, k) =>
      s"${ev.value} = graft.functions.BloomRuntime.contains($b, $k, $numHashes);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(bits = newLeft, key = newRight)
}
