package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.SparkEntry

class TopKAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("aggregator top-3 equals the window row_number form exactly") {
    val orders = graft.sources.Tables.orders(spark, sf001)
    val agg = new TopKAggregator(3).toColumn
    val viaAgg = orders
      .select($"o_custkey", struct($"o_totalprice", $"o_orderkey").as("p"))
      .as[(Long, (Double, Long))]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.name("topk"))
      .flatMap { case (cust, topk) =>
        topk.zipWithIndex.map { case ((price, okey), i) =>
          (cust, i + 1, okey, price)
        }
      }
      .toDF("o_custkey", "rk", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "rk")
      .collect().toSeq
    val viaWindow = SparkEntry.queries("rel_window_topk")(spark, sf001)
      .collect().toSeq
    assert(viaAgg == viaWindow)
  }

  test("merge is associative and bounded (partial buffers stay size k)") {
    val a = new TopKAggregator(2)
    // buffers must be built through reduce (sorted-bounded invariant)
    val xs = List((5.0, 1L), (3.0, 2L), (9.0, 3L)).foldLeft(a.zero)(a.reduce)
    val ys = List((7.0, 4L), (1.0, 5L)).foldLeft(a.zero)(a.reduce)
    val m1 = a.merge(a.merge(xs, ys), a.zero)
    val m2 = a.merge(xs, a.merge(ys, a.zero))
    assert(m1 == m2 && m1.size == 2)
    assert(a.finish(m1) == Seq((9.0, 3L), (7.0, 4L)))
  }

  test("NaN scores rank above reals deterministically (window-order parity)") {
    val a = new TopKAggregator(2)
    val buf = List((5.0, 1L), (Double.NaN, 2L), (7.0, 3L))
      .foldLeft(a.zero)(a.reduce)
    // java.lang.Double total order: NaN > all reals; matches Spark's
    // window ORDER BY score DESC placement of NaN. (Compare ids plus
    // NaN-awareness: tuple == would fail on NaN != NaN.)
    def sameRanking(got: Seq[(Double, Long)], exp: Seq[(Double, Long)]) =
      got.map(_._2) == exp.map(_._2) &&
        got.zip(exp).forall { case (g, e) =>
          java.lang.Double.compare(g._1, e._1) == 0 }
    assert(sameRanking(a.finish(buf), Seq((Double.NaN, 2L), (7.0, 3L))))
    val bufRev = List((7.0, 3L), (Double.NaN, 2L), (5.0, 1L))
      .foldLeft(a.zero)(a.reduce)
    assert(sameRanking(a.finish(bufRev), Seq((Double.NaN, 2L), (7.0, 3L))))
  }

  test("ties break by id ascending, matching the window order") {
    val a = new TopKAggregator(2)
    val buf = List((5.0, 9L), (5.0, 1L), (5.0, 4L))
      .foldLeft(a.zero)(a.reduce)
    assert(a.finish(buf) == Seq((5.0, 1L), (5.0, 4L)))
  }
}
