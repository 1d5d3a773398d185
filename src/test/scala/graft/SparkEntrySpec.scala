package graft

import graft.SparkSpec

/** Driver-contract consistency: the oracle map must reference only
  * registered queries, names must be unique across query groups, and
  * the declared-approximate query must actually be accurate.
  */
class SparkEntrySpec extends SparkSpec {
  import spark.implicits._

  test("every oracleSql key has a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
  }

  test("query names are unique across groups (no silent map overwrites)") {
    val groups = Seq(
      graft.queries.MessageQueries.queries.keySet,
      graft.queries.RelationalQueries.queries.keySet,
      graft.queries.EventQueries.queries.keySet,
      graft.queries.TextQueries.queries.keySet,
      graft.queries.DedupQueries.queries.keySet,
      graft.queries.SimilarityQueries.queries.keySet,
      graft.queries.PipelineQueries.queries.keySet,
      graft.queries.TpchQueries.queries.keySet,
      graft.queries.TrainingDataQueries.queries.keySet)
    val total = groups.map(_.size).sum
    assert(total == SparkEntry.queries.size,
      "duplicate query name across groups collapsed in the merged map")
  }

  test("approx_count_distinct stays within its advertised error bound") {
    // default rsd = 5%; assert against the exact count per group
    val rows = SparkEntry.queries("rel_approx_distinct")(spark, sf001)
      .select("approx_parts", "exact_parts").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (approx, exact) =>
      val err = math.abs(approx - exact).toDouble / exact
      assert(err < 0.15, s"approx=$approx exact=$exact err=$err")
    }
  }

  test("percentile_approx tracks exact percentiles within sketch accuracy") {
    import org.apache.spark.sql.functions._
    val approx = SparkEntry.queries("rel_approx_quantiles")(spark, sf001)
      .select($"l_returnflag", array($"q25", $"q50", $"q75", $"q95"))
      .as[(String, Seq[Double])].collect().toMap
    val exact = graft.sources.Tables.lineitem(spark, sf001)
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75, 0.95))").as("q"))
      .as[(String, Seq[Double])].collect().toMap
    assert(approx.keySet == exact.keySet && approx.nonEmpty)
    for (k <- approx.keys; (a, e) <- approx(k).zip(exact(k))) {
      // accuracy=1000 → rank error <= n/1000; price spread per group is
      // modest, so 5% relative value error is a generous envelope
      assert(math.abs(a - e) / e < 0.05, s"group=$k approx=$a exact=$e")
    }
  }

  test("entry() returns rows on sf0.001 (driver t1 smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
