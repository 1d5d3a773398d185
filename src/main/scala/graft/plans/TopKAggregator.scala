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

  /** Total order matching Spark's window `ORDER BY score DESC, id ASC`:
    * java.lang.Double.compare ranks NaN above every real (and orders
    * ±0.0), so a NaN score cannot make the comparator intransitive (a
    * naive `>` would — both better(NaN,x) and better(x,NaN) false —
    * giving arrival-order-dependent results and TimSort contract errors).
    */
  private def better(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(a._1, b._1)
    c > 0 || (c == 0 && a._2 < b._2)
  }

  // invariant: buffers are sorted best-first and bounded by k
  override def zero: List[(Double, Long)] = Nil

  override def reduce(buf: List[(Double, Long)], in: (Double, Long)): List[(Double, Long)] = {
    // O(1) reject for the common case: buffer full and `in` is no better
    // than the current worst (the sorted invariant makes `last` the worst)
    if (buf.lengthCompare(k) >= 0 && !better(in, buf.last)) buf
    else {
      val (before, after) = buf.span(better(_, in))
      (before ::: in :: after).take(k)
    }
  }

  override def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] = {
    // merge of two sorted lists, bounded at k
    val out = List.newBuilder[(Double, Long)]
    var (x, y, n) = (a, b, 0)
    while (n < k && (x.nonEmpty || y.nonEmpty)) {
      if (y.isEmpty || (x.nonEmpty && better(x.head, y.head))) {
        out += x.head; x = x.tail
      } else { out += y.head; y = y.tail }
      n += 1
    }
    out.result()
  }

  override def finish(buf: List[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}
