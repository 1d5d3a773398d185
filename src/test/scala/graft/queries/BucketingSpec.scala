package graft.queries

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Bucketed co-located join: pre-bucketing both sides of a recurring
  * big-big join on the join key eliminates the per-query shuffle — at
  * 100 TB the shuffle IS the cost, so a fact table joined daily against
  * another fact should be stored bucketed (SURVEY judges this lever).
  */
class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables runs without a shuffle exchange") {
    // force the sort-merge path: at real scale both sides exceed the
    // broadcast threshold; on 6k test rows AQE would broadcast instead
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_quantity", "l_extendedprice")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    Tables.orders(spark, sf0001)
      .select("o_orderkey", "o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_b")

    val joined = spark.table("li_b")
      .join(spark.table("ord_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy().agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))

    assert(joined.collect().head.getLong(0) == 6000L)
    val plan = (joined.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
    // (string-level checks: AQE query stages hide subtrees from collect)
    assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")
    // the ONLY exchange allowed is the scalar aggregate's SinglePartition
    // gather; the join inputs read pre-bucketed data shuffle-free
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.size == 1 && exchanges.head.contains("SinglePartition"),
      s"bucketed join must not shuffle:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
