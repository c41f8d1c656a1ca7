package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native top-k-neighbors aggregate (the `TypedImperativeAggregate`
  * SURVEY §4.2 names as optional hardening): keeps the k best
  * `(vb, cos)` pairs per group in a bounded binary heap.
  *
  * Versus the `Aggregator`-based [[TopKNeighbors]] UDAF this avoids
  * the per-input-row encoder round trip (tuple serialization was the
  * dominant cost on the kNN candidate stream); the buffer lives as a
  * plain JVM heap object and serializes only at partial/final
  * boundaries. Ordering: higher cosine first, then lower id —
  * identical to the window ORDER BY both formulations replace.
  */
case class TopKNeighborsAgg(
    vb: Expression, cos: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] {

  override def children: Seq[Expression] = Seq(vb, cos)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("vb", LongType), StructField("cos", DoubleType))))
  override def prettyName: String = "topk_neighbors"

  override def checkInputDataTypes(): TypeCheckResult =
    if (vb.dataType == LongType && cos.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"topk_neighbors requires (bigint, double), got ${vb.dataType.sql}, ${cos.dataType.sql}")

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buf: TopKHeap, input: InternalRow): TopKHeap = {
    val v = vb.eval(input)
    val c = cos.eval(input)
    if (v != null && c != null)
      buf.insert(v.asInstanceOf[Long], c.asInstanceOf[Double])
    buf
  }

  override def merge(buf: TopKHeap, other: TopKHeap): TopKHeap = {
    other.foreach((v, c) => buf.insert(v, c))
    buf
  }

  override def eval(buf: TopKHeap): Any = {
    val sorted = buf.sortedDesc
    new GenericArrayData(sorted.map { case (v, c) =>
      InternalRow(v, c)
    })
  }

  override def serialize(buf: TopKHeap): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val entries = buf.entries
    out.writeInt(entries.length)
    entries.foreach { case (v, c) => out.writeLong(v); out.writeDouble(c) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new TopKHeap(k)
    (0 until n).foreach(_ => buf.insert(in.readLong(), in.readDouble()))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKNeighborsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKNeighborsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKNeighborsAgg =
    copy(vb = newChildren(0), cos = newChildren(1))
}

/** Bounded worst-on-top binary heap of (vb, cos): O(log k) insert,
  * "worse" = lower cos, then higher vb.
  */
final class TopKHeap(k: Int) {
  private val ids = new Array[Long](k)
  private val cs = new Array[Double](k)
  private var n = 0

  private def worse(c1: Double, v1: Long, c2: Double, v2: Long): Boolean =
    c1 < c2 || (c1 == c2 && v1 > v2)

  def insert(v: Long, c: Double): Unit = {
    if (n < k) {
      var i = n; ids(i) = v; cs(i) = c; n += 1
      while (i > 0 && worse(cs(i), ids(i), cs((i - 1) / 2), ids((i - 1) / 2))) {
        swap(i, (i - 1) / 2); i = (i - 1) / 2
      }
    } else if (n > 0 && worse(cs(0), ids(0), c, v)) {
      ids(0) = v; cs(0) = c
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = 2 * i + 2
        var w = i
        if (l < n && worse(cs(l), ids(l), cs(w), ids(w))) w = l
        if (r < n && worse(cs(r), ids(r), cs(w), ids(w))) w = r
        if (w == i) done = true else { swap(i, w); i = w }
      }
    }
  }

  private def swap(i: Int, j: Int): Unit = {
    val ti = ids(i); ids(i) = ids(j); ids(j) = ti
    val tc = cs(i); cs(i) = cs(j); cs(j) = tc
  }

  def entries: Array[(Long, Double)] =
    Array.tabulate(n)(i => (ids(i), cs(i)))

  def foreach(f: (Long, Double) => Unit): Unit = {
    var i = 0
    while (i < n) { f(ids(i), cs(i)); i += 1 }
  }

  def sortedDesc: Array[(Long, Double)] =
    entries.sortBy { case (v, c) => (-c, v) }
}
