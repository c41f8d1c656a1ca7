package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (SURVEY §4.2's optional `Aggregator`): one-pass MinHash
  * signature over a group's shingle hashes.
  *
  * Computes the same signature as the declarative
  * `crossJoin(params).groupBy.agg(min(...))` pipeline in
  * [[graft.queries.Dedup.q29]] — k affine hashes
  * `h_i(x) = (a_i·x + b_i) mod (2^31-1)` with an element-wise-min
  * buffer — but in a single pass with a k-long buffer instead of a
  * k-way row explosion: the shape to prefer when k is large or the
  * shingle stream is wide. Partial aggregation (map-side combine)
  * falls out of `merge` for free.
  */
class MinHashAggregator(val k: Int = 12)
  extends Aggregator[Long, Array[Long], Array[Long]] {

  private val P = PolyHash.Mod
  private def a(i: Int): Long = (i.toLong * 7919 + 1) % P
  private def b(i: Int): Long = (i.toLong * 104729 + 12345) % P

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], x: Long): Array[Long] = {
    var i = 0
    while (i < k) {
      val h = (a(i) * x + b(i)) % P
      if (h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
