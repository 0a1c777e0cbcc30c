package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator: keeps the k largest (value, tag) pairs per
  * group in a bounded buffer — the `Aggregator[IN, BUF, OUT]` face of
  * the engine's custom-aggregate surface.
  *
  * Scale: the buffer is size-k at every partial (map-side) aggregation,
  * so the shuffle carries k rows per group per task regardless of group
  * size — the right primitive for "top products per seller"-style
  * rollups without a full window sort.
  */
class TopKAggregator(k: Int)
  extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {

  override def zero: List[(Double, Long)] = Nil

  private def trim(xs: List[(Double, Long)]): List[(Double, Long)] =
    xs.sortBy { case (v, tag) => (-v, tag) }.take(k)

  // buffer is kept sorted; per-row cost is O(k) insert, not O(k log k)
  // re-sort — this runs once per input row on the map side
  override def reduce(buf: List[(Double, Long)],
      in: (Double, Long)): List[(Double, Long)] = {
    if (buf.length >= k) {
      val last = buf.last
      if (in._1 < last._1 || (in._1 == last._1 && in._2 >= last._2)) return buf
    }
    val (before, after) = buf.span(x =>
      x._1 > in._1 || (x._1 == in._1 && x._2 < in._2))
    (before ::: in :: after).take(k)
  }

  override def merge(a: List[(Double, Long)],
      b: List[(Double, Long)]): List[(Double, Long)] = trim(a ++ b)

  override def finish(buf: List[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    ExpressionEncoder[List[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}
