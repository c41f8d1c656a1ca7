package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Shared q-digest buffer: a sparse (level, idx) → count map over the
  * dyadic tree of a `2^levels`-bucket universe, with the DETERMINISTIC
  * bottom-up compression of Shrivastava, Buragohain, Agrawal & Suri,
  * "Medians and Beyond: New Aggregation Techniques for Sensor
  * Networks" (SenSys 2004) run once at [[finish]] — the canonical
  * deterministic mergeable quantile summary (Agarwal et al.,
  * "Mergeable Summaries", PODS 2012 §3). Node (ℓ, i) covers buckets
  * [i·2^ℓ, (i+1)·2^ℓ − 1]; all input mass enters at the leaves
  * (ℓ = 0) or as pre-built digest nodes (the merge path).
  *
  * Determinism: the buffer is a pure counting map (addition commutes,
  * so partition and merge order never matter) and compression runs
  * only in [[finish]], level by level — within a level every sibling
  * pair decides independently against its own parent, so iteration
  * order inside a level is immaterial too. The digest is therefore a
  * pure function of the multiset of inputs, unlike KLL/GK whose
  * buffer compactions depend on arrival order.
  *
  * Compression rule (per level ℓ = 0 … levels−1, siblings grouped by
  * parent p = i >> 1): if csum(children) + cnt(parent) ≤ ⌊n/k⌋, the
  * children are deleted and the parent absorbs their mass; otherwise
  * all stay. Kept digests have ≤ 3k nodes and answer any rank query
  * within levels·⌊n/k⌋ (the paper's ε = log₂σ / k with σ = 2^levels).
  */
final class QDigestBuf(val levels: Int, val k: Int) {
  /** key = (level << 32) | idx; value = count. */
  val counts: mutable.HashMap[Long, Long] = mutable.HashMap.empty

  @inline private def key(lvl: Int, idx: Long): Long = (lvl.toLong << 32) | idx

  def addLeaf(bucket: Long, cnt: Long = 1L): Unit = {
    require(bucket >= 0 && bucket < (1L << levels),
      s"bucket $bucket outside the [0, 2^$levels) universe")
    val kk = key(0, bucket)
    counts.update(kk, counts.getOrElse(kk, 0L) + cnt)
  }

  def addNode(lvl: Int, idx: Long, cnt: Long): Unit = {
    require(lvl >= 0 && lvl <= levels && idx >= 0 && idx < (1L << (levels - lvl)),
      s"node ($lvl, $idx) outside the $levels-level tree")
    val kk = key(lvl, idx)
    counts.update(kk, counts.getOrElse(kk, 0L) + cnt)
  }

  def mergeIn(other: QDigestBuf): Unit =
    other.counts.foreach { case (kk, c) =>
      counts.update(kk, counts.getOrElse(kk, 0L) + c)
    }

  /** Bottom-up deterministic compression with t = ⌊n/k⌋ (n = total
    * mass currently held), then the digest as (lvl, idx, cnt) rows
    * sorted by (lvl, idx). */
  def finish(): Array[(Int, Long, Long)] = {
    val n = counts.valuesIterator.sum
    val t = n / k
    var l = 0
    while (l < levels) {
      val children = counts.keysIterator.filter(kk => (kk >>> 32) == l).toArray
      children.groupBy(kk => (kk & 0xffffffffL) >> 1).foreach {
        case (p, kids) =>
          val csum = kids.iterator.map(counts(_)).sum
          val pKey = key(l + 1, p)
          val pcnt = counts.getOrElse(pKey, 0L)
          if (csum + pcnt <= t) {
            kids.foreach(counts.remove)
            counts.update(pKey, csum + pcnt)
          }
      }
      l += 1
    }
    counts.iterator.map { case (kk, c) => ((kk >>> 32).toInt, kk & 0xffffffffL, c) }
      .toArray.sortBy(x => (x._1, x._2))
  }
}

object QDigestBuf {
  val nodeType: DataType = ArrayType(StructType(Seq(
    StructField("lvl", IntegerType, nullable = false),
    StructField("idx", LongType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)

  def serialize(buf: QDigestBuf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.levels); out.writeInt(buf.k)
    out.writeInt(buf.counts.size)
    buf.counts.foreach { case (kk, c) => out.writeLong(kk); out.writeLong(c) }
    out.flush(); bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): QDigestBuf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new QDigestBuf(in.readInt(), in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.counts.update(in.readLong(), in.readLong()); i += 1 }
    buf
  }

  def toArrayData(nodes: Array[(Int, Long, Long)]): GenericArrayData =
    new GenericArrayData(nodes.map { case (l, i, c) =>
      InternalRow(l, i, c)
    }.toIndexedSeq)
}

/** `qdigest_sketch(bucket, levels, k)` — builds the q-digest of a
  * long bucket column (one digest per aggregation group). The buffer
  * is the UNCOMPRESSED leaf histogram (≤ 2^levels entries, bounded by
  * the universe, not the corpus), so partial aggregation map-side
  * combines exact counts and the shuffle carries at most
  * partitions × distinct-buckets rows; the single deterministic
  * compression runs at eval. Output: sorted array<struct<lvl, idx,
  * cnt>>.
  *
  * `levels` is capped at 20: the buffer being the UNCOMPRESSED leaf
  * histogram, a partial's worst case is 2^levels entries (~16 MB
  * serialized at 20) — past that the "bounded by the universe" size
  * argument stops bounding anything useful. Wider domains should
  * pre-bucket (divide) into a ≤2^20 universe first; the digest's
  * rank envelope is over buckets either way.
  */
case class QDigestSketchAgg(
    child: Expression, levels: Int, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QDigestBuf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = QDigestBuf.nodeType
  override def prettyName: String = "qdigest_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType && levels >= 1 && levels <= 20 && k >= 1)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"qdigest_sketch requires (bigint bucket, 1<=levels<=20, k>=1), " +
        s"got ${child.dataType.sql}")

  override def createAggregationBuffer(): QDigestBuf = new QDigestBuf(levels, k)

  override def update(buf: QDigestBuf, input: InternalRow): QDigestBuf = {
    val v = child.eval(input)
    if (v != null) buf.addLeaf(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: QDigestBuf, other: QDigestBuf): QDigestBuf = {
    buf.mergeIn(other); buf
  }

  override def eval(buf: QDigestBuf): Any = QDigestBuf.toArrayData(buf.finish())

  override def serialize(buf: QDigestBuf): Array[Byte] = QDigestBuf.serialize(buf)
  override def deserialize(bytes: Array[Byte]): QDigestBuf =
    QDigestBuf.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): QDigestSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): QDigestSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): QDigestSketchAgg =
    copy(child = c.head)
}

/** `qdigest_merge(nodes, levels, k)` — merges pre-built q-digests
  * (arrays of (lvl, idx, cnt) nodes — [[QDigestSketchAgg]] outputs or
  * persisted leaf histograms) into one digest: node-wise count
  * addition, then ONE recompression against the combined mass's
  * t = ⌊n/k⌋ — exactly the paper's MERGE. Addition commutes, so the
  * result is independent of merge order and of how the inputs were
  * partitioned into digests.
  */
case class QDigestMergeAgg(
    child: Expression, levels: Int, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QDigestBuf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = QDigestBuf.nodeType
  override def prettyName: String = "qdigest_merge"

  override def checkInputDataTypes(): TypeCheckResult = {
    // structural match, nullability-insensitive (a NOT NULL struct
    // field from array(struct(...)) literals must pass)
    val ok = child.dataType match {
      case ArrayType(StructType(fs), _) =>
        fs.toSeq.map(f => (f.name, f.dataType)) ==
          Seq(("lvl", IntegerType), ("idx", LongType), ("cnt", LongType))
      case _ => false
    }
    if (ok && levels >= 1 && levels <= 20 && k >= 1)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"qdigest_merge requires (array<struct<lvl int, idx bigint, cnt " +
        s"bigint>>, 1<=levels<=20, k>=1), got ${child.dataType.sql}")
  }

  override def createAggregationBuffer(): QDigestBuf = new QDigestBuf(levels, k)

  override def update(buf: QDigestBuf, input: InternalRow): QDigestBuf = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      while (i < arr.numElements()) {
        val row = arr.getStruct(i, 3)
        buf.addNode(row.getInt(0), row.getLong(1), row.getLong(2))
        i += 1
      }
    }
    buf
  }

  override def merge(buf: QDigestBuf, other: QDigestBuf): QDigestBuf = {
    buf.mergeIn(other); buf
  }

  override def eval(buf: QDigestBuf): Any = QDigestBuf.toArrayData(buf.finish())

  override def serialize(buf: QDigestBuf): Array[Byte] = QDigestBuf.serialize(buf)
  override def deserialize(bytes: Array[Byte]): QDigestBuf =
    QDigestBuf.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): QDigestMergeAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): QDigestMergeAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): QDigestMergeAgg =
    copy(child = c.head)
}
