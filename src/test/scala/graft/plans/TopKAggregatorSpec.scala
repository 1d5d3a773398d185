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

  test("merge is associative and bounded (partial heaps stay size k)") {
    val a = new TopKAggregator(2)
    val xs = List((5.0, 1L), (3.0, 2L), (9.0, 3L))
    val ys = List((7.0, 4L), (1.0, 5L))
    val m1 = a.merge(a.merge(xs, ys), Nil)
    val m2 = a.merge(xs, a.merge(ys, Nil))
    assert(m1 == m2 && m1.size == 2)
    assert(a.finish(m1) == Seq((9.0, 3L), (7.0, 4L)))
  }

  test("ties break by id ascending, matching the window order") {
    val a = new TopKAggregator(2)
    val buf = List((5.0, 9L), (5.0, 1L), (5.0, 4L))
      .foldLeft(a.zero)(a.reduce)
    assert(a.finish(buf) == Seq((5.0, 1L), (5.0, 4L)))
  }
}
