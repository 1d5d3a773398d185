package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: Int) = new Timestamp(s * 1000L)

  test("backward as-of picks latest right row at-or-before left ts, per key") {
    val left = Seq(
      (1L, t(10), "l10"), (1L, t(20), "l20"), (1L, t(5), "l5"),
      (2L, t(15), "l15")).toDF("k", "ts", "lv")
    val right = Seq(
      (1L, t(5), 100L), (1L, t(18), 101L), (2L, t(100), 200L))
      .toDF("k", "rts", "rid")
    val got = AsOfJoin.backward(left, right, Seq("k"), "ts", "rts",
      Seq("rid"), tieBreak = "rid")
      .select("k", "lv", "rid").as[(Long, String, Option[Long])]
      .collect().toSet
    assert(got == Set(
      (1L, "l5", Some(100L)),  // equal ts matches (>=)
      (1L, "l10", Some(100L)),
      (1L, "l20", Some(101L)),
      (2L, "l15", None)))      // right row is in the future
  }

  test("equal-ts right rows: highest tie-break wins deterministically") {
    val left = Seq((1L, t(10), "x")).toDF("k", "ts", "lv")
    val right = Seq((1L, t(10), 7L), (1L, t(10), 9L)).toDF("k", "rts", "rid")
    val got = AsOfJoin.backward(left, right, Seq("k"), "ts", "rts",
      Seq("rid"), tieBreak = "rid").select("rid").as[Long].head()
    assert(got == 9L)
  }

  test("tolerance nulls out stale matches") {
    val left = Seq((1L, t(100), "x"), (1L, t(11), "y")).toDF("k", "ts", "lv")
    val right = Seq((1L, t(10), 1L)).toDF("k", "rts", "rid")
    val got = AsOfJoin.backward(left, right, Seq("k"), "ts", "rts",
      Seq("rid"), tieBreak = "rid", tolerance = 5L)
      .select("lv", "rid").as[(String, Option[Long])].collect().toMap
    assert(got == Map("y" -> Some(1L), "x" -> None))
  }

  test("plan shape: single shuffle, no nested-loop join") {
    val left = Seq((1L, t(10), "x")).toDF("k", "ts", "lv")
    val right = Seq((1L, t(5), 1L)).toDF("k", "rts", "rid")
    val df = AsOfJoin.backward(left, right, Seq("k"), "ts", "rts",
      Seq("rid"), tieBreak = "rid")
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.size <= 1, s"as-of must shuffle once:\n$plan")
    assert(!plan.toString.contains("NestedLoop"), plan.toString)
  }
}
