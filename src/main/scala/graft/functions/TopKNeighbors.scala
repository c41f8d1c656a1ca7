package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator for neighbor lists: keeps the k best
  * `(cos, vb)` pairs per group in a bounded sorted buffer.
  *
  * The row_number-window formulation of per-group top-k shuffles and
  * fully sorts every candidate row (6 of q31's 9 seconds at sf0.1);
  * this aggregator reduces map-side to k rows per group *before* the
  * shuffle — the shape that survives a 100× scale-up, where the
  * all-pairs candidate stream is huge but k stays tiny.
  *
  * Ordering: higher cosine first, then lower neighbor id — the same
  * deterministic tie-break as the window ORDER BY it replaces.
  */
class TopKNeighbors(val k: Int)
  extends Aggregator[(Long, Double), Seq[(Double, Long)], Seq[(Long, Double)]] {

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(buf: Seq[(Double, Long)], x: (Long, Double)): Seq[(Double, Long)] =
    insert(buf, (x._2, x._1))

  private def insert(buf: Seq[(Double, Long)], e: (Double, Long)): Seq[(Double, Long)] = {
    if (buf.size >= k && !better(e, buf.last)) buf
    else {
      val i = buf.indexWhere(cur => better(e, cur))
      val at = if (i < 0) buf.size else i
      (buf.take(at) :+ e) ++ buf.drop(at).take(k - at - 1)
    }
  }

  override def merge(b1: Seq[(Double, Long)], b2: Seq[(Double, Long)]): Seq[(Double, Long)] =
    b2.foldLeft(b1)(insert)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Long, Double)] =
    buf.map { case (cos, vb) => (vb, cos) }

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
}
