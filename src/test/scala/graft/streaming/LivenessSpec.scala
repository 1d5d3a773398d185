package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.streaming.Liveness.{Activity, WentIdle}

class LivenessSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("user with no activity past the gap is declared idle with its summary") {
    val in = MemoryStream[Activity](spark)
    val out = Liveness.wentIdle(
      in.toDS().withWatermark("ts", "0 seconds").as[Activity],
      gapSeconds = 600) // 10 min idle threshold
    val q = out.writeStream.format("memory").queryName("idle")
      .outputMode("append").start()
    try {
      // batch 1: a active twice, b active once
      in.addData(Activity("a", ts(1)), Activity("a", ts(4)), Activity("b", ts(5)))
      q.processAllAvailable()
      assert(spark.table("idle").isEmpty) // nobody idle yet
      // batch 2: only b keeps going; watermark moves past a's 10:14 deadline
      in.addData(Activity("b", ts(20)))
      q.processAllAvailable()
      // force one more microbatch so timeouts fire against the new watermark
      in.addData(Activity("b", ts(21)))
      q.processAllAvailable()
      val idles = spark.table("idle").as[WentIdle].collect().toSeq
      assert(idles.map(_.user) == Seq("a"))
      assert(idles.head.lastActive == ts(4) && idles.head.nEvents == 2L)
      // b is still live — no idle record
      assert(!idles.exists(_.user == "b"))
    } finally q.stop()
  }

  test("re-activity after idle restarts counting from zero") {
    val in = MemoryStream[Activity](spark)
    val out = Liveness.wentIdle(
      in.toDS().withWatermark("ts", "0 seconds").as[Activity], gapSeconds = 300)
    val q = out.writeStream.format("memory").queryName("idle2")
      .outputMode("append").start()
    try {
      in.addData(Activity("a", ts(1)))
      q.processAllAvailable()
      in.addData(Activity("z", ts(30))) // advance watermark far past a
      q.processAllAvailable()
      in.addData(Activity("a", ts(31))) // a comes back
      q.processAllAvailable()
      in.addData(Activity("z", ts(59)))
      q.processAllAvailable()
      in.addData(Activity("z", ts(59))) // extra batch to fire a's 2nd timeout
      q.processAllAvailable()
      val byUser = spark.table("idle2").as[WentIdle].collect()
        .filter(_.user == "a").sortBy(_.lastActive.getTime)
      assert(byUser.length == 2)
      assert(byUser(0).nEvents == 1L && byUser(1).nEvents == 1L) // reset state
    } finally q.stop()
  }
}
