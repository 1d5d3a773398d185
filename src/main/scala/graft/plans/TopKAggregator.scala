package graft.plans

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed bounded-heap top-k aggregator: per group, keep the k largest
  * (score, id) pairs (score desc, id asc on ties — the same total order
  * the window row_number form uses).
  *
  * Scale rationale vs `Window.partitionBy(...).orderBy(...)` + rank<=k:
  * the window form shuffles EVERY row of a group to one task and sorts
  * it (Catalyst's WindowGroupLimit prunes to k per map partition first —
  * this aggregator is the same idea as an algebraic aggregate: partial
  * heaps of size k merge associatively, so the shuffle carries at most
  * k·partitions rows per group and no sort of the full group ever
  * happens).
  *
  * IN = (score, id); BUF = List of retained pairs (bounded by k);
  * OUT = pairs in rank order.
  */
final class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {
  require(k > 0, "k must be positive")

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def trim(xs: List[(Double, Long)]): List[(Double, Long)] =
    xs.sortWith(better).take(k)

  override def zero: List[(Double, Long)] = Nil

  override def reduce(buf: List[(Double, Long)], in: (Double, Long)): List[(Double, Long)] =
    trim(in :: buf)

  override def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] =
    trim(a ++ b)

  override def finish(buf: List[(Double, Long)]): Seq[(Double, Long)] =
    buf.sortWith(better)

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}
