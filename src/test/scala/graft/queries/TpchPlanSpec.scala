package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.HashAggregateExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec}

import graft.SparkSpec
import graft.SparkEntry

/** Plan pins for the ten adapted TPC-H shapes in [[TpchQueries]] — the
  * properties that keep these joins sane at 100 TB: equi-joins only
  * (never a nested loop over fact tables), dims broadcast, filters at
  * the scans, and Q21's one-scan rewrite actually staying one scan.
  */
class TpchPlanSpec extends SparkSpec {

  private def executed(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }

  private def query(name: String): SparkPlan =
    executed(SparkEntry.queries(name)(spark, sf001))

  private val all = Seq(
    "rel_q2_min_cost_supplier", "rel_q8_market_share", "rel_q9_product_profit",
    "rel_q11_important_parts", "rel_q12_priority_lines", "rel_q15_top_supplier",
    "rel_q16_part_supplier_census", "rel_q17_small_qty_revenue",
    "rel_q20_promotion_suppliers", "rel_q21_waiting_suppliers")

  // Q11 joins a 1-row global aggregate (the scalar subquery) as a
  // conditionless broadcast cross — the only legitimate NLJ shape. (Q15's
  // scalar cross carries an EQUALITY filter, which Catalyst converts to a
  // broadcast hash join — pinned in its own test below.)
  private val scalarCross = Set("rel_q11_important_parts")

  test("no cartesian products, and nested loops only for 1-row scalar crosses") {
    for (name <- all) {
      val plan = query(name)
      assert(plan.collect { case j: CartesianProductExec => j }.isEmpty,
        s"$name has a cartesian product:\n$plan")
      val bnlj = plan.collect { case j: BroadcastNestedLoopJoinExec => j }
      if (scalarCross(name)) {
        assert(bnlj.size == 1, s"$name: expected exactly the scalar cross:\n$plan")
        // the broadcast side must be a global (no grouping keys) aggregate
        // — a 1-row stats table, not data
        val broadcastSide = bnlj.head.buildSide match {
          case org.apache.spark.sql.catalyst.optimizer.BuildLeft => bnlj.head.left
          case _ => bnlj.head.right
        }
        val globalAgg = broadcastSide.collect {
          case a: HashAggregateExec if a.groupingExpressions.isEmpty => a
        }
        assert(globalAgg.nonEmpty,
          s"$name: NLJ build side is not a 1-row global aggregate:\n$broadcastSide")
      } else {
        assert(bnlj.isEmpty, s"$name must not nested-loop:\n$plan")
      }
    }
  }

  test("rel_q21: the EXISTS/NOT-EXISTS pair collapses to ONE lineitem scan") {
    // the classical form re-scans lineitem twice more (l2/l3); the
    // pair-grain + per-order window rewrite must keep exactly one
    val plan = query("rel_q21_waiting_suppliers")
    val liScans = plan.collect {
      case s: FileSourceScanExec if s.schema.fieldNames.exists(_.startsWith("l_")) => s
    }
    assert(liScans.size == 1, s"expected one lineitem scan, got ${liScans.size}:\n$plan")
  }

  test("date filters push down to the lineitem scans") {
    for (name <- Seq("rel_q12_priority_lines", "rel_q15_top_supplier",
        "rel_q20_promotion_suppliers")) {
      val plan = query(name)
      val scan = plan.collect {
        case s: FileSourceScanExec if s.schema.fieldNames.contains("l_shipdate") => s
      }.head
      assert(scan.metadata("PushedFilters").contains("l_shipdate"),
        s"$name: ${scan.metadata("PushedFilters")}")
    }
  }

  test("rel_q16: bad-supplier exclusion is a broadcast anti-join") {
    val plan = query("rel_q16_part_supplier_census")
    val anti = plan.collect {
      case j: BroadcastHashJoinExec
        if j.joinType == org.apache.spark.sql.catalyst.plans.LeftAnti => j
    }
    assert(anti.nonEmpty, s"expected broadcast anti-join:\n$plan")
  }

  test("rel_q8: region scoping is a semi-join, supplier nation a broadcast") {
    // the AMERICA-customer scoping must be LeftSemi (existence only —
    // customer attributes never widen the fact rows); whether it hashes
    // or sort-merges is AQE's call as customer grows
    val plan = query("rel_q8_market_share")
    val semi = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec
        if j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi => j
    }
    assert(semi.nonEmpty, s"expected semi-join for AMERICA customers:\n$plan")
    assert(plan.collect { case j: BroadcastHashJoinExec => j }.size >= 2, plan.toString)
  }

  test("rel_q15: the scalar-max cross becomes a broadcast hash equi-join") {
    // .join(broadcast(mx)).filter(total === max) — Catalyst folds the
    // post-cross equality into the join condition, so even the scalar
    // compare is a hash join, not a nested loop
    val plan = query("rel_q15_top_supplier")
    val bhj = plan.collect {
      case j: BroadcastHashJoinExec
        if j.leftKeys.mkString.contains("total_dec") ||
          j.rightKeys.mkString.contains("max_dec") => j
    }
    assert(bhj.nonEmpty, s"expected the max filter as a hash join:\n$plan")
  }

  test("rel_q2: per-part min join stays a broadcast/hash equi-join chain") {
    val plan = query("rel_q2_min_cost_supplier")
    assert(plan.collect { case j: BroadcastHashJoinExec => j }.size >= 2,
      s"expected broadcast dims on the supply table:\n$plan")
  }
}
