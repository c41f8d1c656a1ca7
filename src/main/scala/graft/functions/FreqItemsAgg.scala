package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded Misra–Gries summary: at most `capacity` counters.
  *
  * Invariant (the classic MG guarantee): for every item x,
  * `true_count(x) − undercount ≤ count(x) ≤ true_count(x)` where the
  * cumulative undercount is at most `N / (capacity + 1)` (N = items
  * seen, including those of merged-in summaries). Consequently any
  * item with true frequency > N/(capacity+1) is guaranteed present.
  */
final class FreqSketch(val capacity: Int) {
  val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty

  def add(tok: String): Unit = {
    counts.get(tok) match {
      case Some(c) => counts.update(tok, c + 1)
      case None if counts.size < capacity => counts.update(tok, 1L)
      case None =>
        // decrement-all: drop one "vote" from every counter
        val dead = mutable.ArrayBuffer.empty[String]
        counts.foreach { case (k, c) =>
          if (c == 1L) dead += k else counts.update(k, c - 1)
        }
        dead.foreach(counts.remove)
    }
  }

  /** Merge-by-sum, then trim back to `capacity` by subtracting the
    * (capacity+1)-largest value from all (the standard mergeable-MG
    * step; errors add, preserving the guarantee).
    */
  def mergeIn(other: FreqSketch): Unit = {
    other.counts.foreach { case (k, c) =>
      counts.update(k, counts.getOrElse(k, 0L) + c)
    }
    if (counts.size > capacity) {
      val cut = counts.values.toArray.sorted(Ordering[Long].reverse)(capacity)
      val dead = mutable.ArrayBuffer.empty[String]
      counts.foreach { case (k, c) =>
        if (c <= cut) dead += k else counts.update(k, c - cut)
      }
      dead.foreach(counts.remove)
    }
  }
}

/** `freq_candidates(tok, capacity)` — frequent-item *candidate set*
  * via a mergeable Misra–Gries summary ([[FreqSketch]]).
  *
  * The output (sorted string array) is a SUPERSET of every item with
  * true count > N/(capacity+1); which extra near-threshold items
  * survive depends on partition/merge order, so a deterministic
  * declared query must re-count candidates exactly and filter on an
  * exact threshold above the guarantee line (see `Text.q85`) — the
  * final result is then order-independent even though the sketch
  * isn't.
  *
  * Scale story: this is the heavy-hitters shape for key spaces too
  * large to shuffle (URLs, n-grams at 100 TB): per-partition state is
  * `capacity` counters, the shuffle carries `capacity` rows per
  * partition instead of |V| partial counts, and the exact re-count
  * pass shuffles only the candidate keys.
  */
case class FreqItemsAgg(
    child: Expression, capacity: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "freq_candidates"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && capacity > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"freq_candidates requires (string, positive int capacity), got ${child.dataType.sql}")

  override def createAggregationBuffer(): FreqSketch = new FreqSketch(capacity)

  override def update(buf: FreqSketch, input: InternalRow): FreqSketch = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: FreqSketch, other: FreqSketch): FreqSketch = {
    buf.mergeIn(other); buf
  }

  override def eval(buf: FreqSketch): Any =
    new GenericArrayData(
      buf.counts.keysIterator.toArray.sorted.map(UTF8String.fromString(_)))

  override def serialize(buf: FreqSketch): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.capacity)
    out.writeInt(buf.counts.size)
    buf.counts.foreach { case (k, c) => out.writeUTF(k); out.writeLong(c) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): FreqSketch = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val sk = new FreqSketch(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) { sk.counts.update(in.readUTF(), in.readLong()); i += 1 }
    sk
  }

  override def withNewMutableAggBufferOffset(offset: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): FreqItemsAgg =
    copy(child = c.head)
}
