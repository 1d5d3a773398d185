package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def sides(sf: String) = {
    val ev = Tables.events(spark, sf)
    val l = ev.filter($"event_type" === "error")
      .select($"event_id".as("err_id"), $"user_id".as("err_user"), $"ts".as("err_ts"))
    val r = ev.filter($"event_type" === "click")
      .select($"event_id".as("clk_id"), $"user_id".as("clk_user"), $"ts".as("clk_ts"))
    (l, r)
  }

  test("bucketed interval join equals the naive theta join") {
    val (l, r) = sides(sf001)
    val banded = RangeJoin.intervalJoin(l, r, "err_ts", "clk_ts",
      lowerSec = 1, upperSec = 600, equiKeys = Seq("err_user" -> "clk_user"))
      .select("err_id", "clk_id").as[(Long, Long)].collect().toSet
    val naive = l.join(r, $"err_user" === $"clk_user" &&
        $"clk_ts" >= $"err_ts" + expr("INTERVAL 1 SECOND") &&
        $"clk_ts" <= $"err_ts" + expr("INTERVAL 600 SECOND"))
      .select("err_id", "clk_id").as[(Long, Long)].collect().toSet
    assert(banded == naive && naive.nonEmpty)
  }

  test("band boundaries are inclusive on both ends") {
    val l = Seq((1L, 100L, ts("2024-01-01 00:00:00")))
      .toDF("err_id", "err_user", "err_ts")
    val r = Seq(
      (10L, 100L, ts("2024-01-01 00:00:01")),   // exactly lower
      (11L, 100L, ts("2024-01-01 00:10:00")),   // exactly upper
      (12L, 100L, ts("2024-01-01 00:00:00")),   // below lower
      (13L, 100L, ts("2024-01-01 00:10:01")),   // above upper
      (14L, 999L, ts("2024-01-01 00:05:00")))   // wrong user
      .toDF("clk_id", "clk_user", "clk_ts")
    val got = RangeJoin.intervalJoin(l, r, "err_ts", "clk_ts", 1, 600,
      Seq("err_user" -> "clk_user"))
      .select("clk_id").as[Long].collect().toSet
    assert(got == Set(10L, 11L))
  }

  test("plan is a hash/merge equi-join, not a nested loop") {
    val (l, r) = sides(sf001)
    val plan = RangeJoin.intervalJoin(l, r, "err_ts", "clk_ts", 1, 600,
      Seq("err_user" -> "clk_user"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("shared column names are rejected up front") {
    val (l, _) = sides(sf001)
    val e = intercept[IllegalArgumentException] {
      RangeJoin.intervalJoin(l, l, "err_ts", "err_ts", 1, 600)
    }
    assert(e.getMessage.contains("alias one side"))
  }

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
}
