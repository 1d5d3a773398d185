package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.SparkEntry
import graft.sources.Tables

/** Semantics of the round-3 query additions (pivot, offset windows,
  * exact-sum bivariate stats, funnel, vocabulary top-k) beyond the
  * DuckDB hash gate: each test recomputes the property a different way.
  */
class Round3QueriesSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf0001)

  test("rel_pivot: cells partition the order count exactly") {
    val rows = q("rel_pivot").collect()
    val total = rows.map(r => r.getLong(1) + r.getLong(2) + r.getLong(3)).sum
    assert(total == Tables.orders(spark, sf0001).count())
    // one cell cross-checked against a direct filtered count
    val urgentF = Tables.orders(spark, sf0001)
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_orderstatus") === "F")
      .count()
    val row = rows.find(_.getString(0) == "1-URGENT").get
    assert(row.getLong(1) == urgentF)
  }

  test("rel_window_lag: prev/next are inverse shifts within each customer") {
    val rows = q("rel_window_lag")
      .select("o_custkey", "o_orderkey", "prev_price", "next_price")
      .collect()
    val byCust = rows.groupBy(_.getLong(0))
    // the query's total ORDER BY (o_custkey, o_orderkey) is NOT the
    // window order (o_orderdate, o_orderkey) — re-derive neighbours by
    // matching each row's next_price to the successor's own price
    val prices = Tables.orders(spark, sf0001)
      .select("o_orderkey", "o_totalprice").as[(Long, Double)](
        org.apache.spark.sql.Encoders.product[(Long, Double)])
      .collect().toMap
    byCust.values.foreach { rs =>
      rs.foreach { r =>
        if (!r.isNullAt(2)) {
          // someone in the same partition has this row as its next
          assert(rs.exists(o => !o.isNullAt(3) &&
            o.getDouble(3) == prices(r.getLong(1))))
        }
      }
    }
  }

  test("rel_corr_stats matches the built-in streaming aggregates numerically") {
    val exact = q("rel_corr_stats").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val builtin = Tables.lineitem(spark, sf0001)
      .groupBy("l_returnflag")
      .agg(corr("l_quantity", "l_extendedprice").as("c"),
        covar_samp("l_quantity", "l_extendedprice").as("cv"),
        stddev_samp(col("l_quantity")).as("sd"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(exact.keySet == builtin.keySet && exact.nonEmpty)
    for (k <- exact.keySet) {
      val (c1, cv1, sd1) = exact(k); val (c2, cv2, sd2) = builtin(k)
      assert(math.abs(c1 - c2) < 1e-9 && c1 >= -1.0 && c1 <= 1.0)
      assert(math.abs(cv1 - cv2) / math.abs(cv2) < 1e-9)
      assert(math.abs(sd1 - sd2) / sd2 < 1e-9)
    }
  }

  test("ev_funnel: converted iff at least one purchase in the window; hand-check one user") {
    val rows = q("ev_funnel").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(3) == (r.getLong(2) > 0))
    }
    // recompute one signed-up user's 7-day purchase count imperatively
    val uid = rows.head.getLong(0)
    val ev = Tables.events(spark, sf0001)
      .filter(col("user_id") === uid)
      .select("event_type", "ts").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime))
    val signup = ev.filter(_._1 == "signup").map(_._2).min
    val n = ev.count { case (t, ms) =>
      t == "purchase" && ms >= signup && ms <= signup + 604800000L }
    assert(rows.head.getLong(2) == n)
  }

  test("text_scrub: every injected email and phone is redacted, none survive") {
    val rows = q("text_scrub").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val scrubbed = r.getString(1)
      assert(r.getLong(2) == 2L) // one email + one phone injected per doc
      assert(scrubbed.contains("<EMAIL>") && scrubbed.contains("<PHONE>"))
      assert(!scrubbed.contains("@") && !scrubbed.contains("+1-555-"))
    }
  }

  test("pipe_mix_sources: all sources present at their configured rates, shares sum to 1") {
    val rows = q("pipe_mix_sources").collect()
    assert(rows.length == 20, s"aliased sampling dropped sources: ${rows.length}")
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-4)
    val byParity = rows.groupBy(r => r.getString(0).drop(3).toInt % 2)
      .view.mapValues(_.map(_.getLong(1)).sum).toMap
    // even sources keep 1/2, odd keep 1/4 → even docs ≈ 2× odd docs
    val ratio = byParity(0).toDouble / byParity(1)
    assert(ratio > 1.5 && ratio < 2.6, s"mixture ratio off: $ratio")
  }

  test("text_top_terms: descending counts, terms >= 3 chars, k rows") {
    val rows = q("text_top_terms").collect()
    assert(rows.length == 25)
    assert(rows.forall(_.getString(0).length >= 3))
    val ns = rows.map(_.getLong(1))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
  }
}
