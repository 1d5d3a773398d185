package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** Stream-stream interval join: click attribution within a bounded
  * event-time window, state evicted by watermark.
  */
class StreamStreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int, s: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$m%02d:$s%02d")

  test("responses join the trigger within the window; stragglers do not") {
    val imps = MemoryStream[(Long, Timestamp)](spark)
    val clicks = MemoryStream[(Long, Timestamp)](spark)
    val joined = StreamJoins.within(
      imps.toDF().toDF("user_id", "ts").withWatermark("ts", "1 minute"),
      clicks.toDF().toDF("user_id", "ts").withWatermark("ts", "1 minute"),
      keyCol = "user_id", tsCol = "ts", windowSeconds = 120)
    val q = joined.writeStream.format("memory").queryName("attr")
      .outputMode("append").start()
    try {
      imps.addData((1L, ts(0)), (2L, ts(0)))
      clicks.addData(
        (1L, ts(1)),      // within 2 min  -> attributed
        (2L, ts(5)),      // 5 min later   -> outside window
        (3L, ts(1)))      // no impression -> inner join drops
      q.processAllAvailable()
      val rows = spark.table("attr")
        .select("t_user_id", "r_ts").as[(Long, Timestamp)].collect().toSet
      assert(rows == Set((1L, ts(1))), s"got $rows")

      // second impression for user 2; a click just inside the bound
      imps.addData((2L, ts(10)))
      clicks.addData((2L, ts(12)))
      q.processAllAvailable()
      val rows2 = spark.table("attr")
        .select("t_user_id", "r_ts").as[(Long, Timestamp)].collect().toSet
      assert(rows2 == Set((1L, ts(1)), (2L, ts(12))))
    } finally q.stop()
  }

  test("window bound is inclusive at both ends") {
    val imps = MemoryStream[(Long, Timestamp)](spark)
    val clicks = MemoryStream[(Long, Timestamp)](spark)
    val joined = StreamJoins.within(
      imps.toDF().toDF("k", "ts").withWatermark("ts", "1 minute"),
      clicks.toDF().toDF("k", "ts").withWatermark("ts", "1 minute"),
      keyCol = "k", tsCol = "ts", windowSeconds = 60)
    val q = joined.writeStream.format("memory").queryName("bounds")
      .outputMode("append").start()
    try {
      imps.addData((1L, ts(0)))
      clicks.addData((1L, ts(0)), (1L, ts(1)), (1L, ts(1, 1)))
      q.processAllAvailable()
      val got = spark.table("bounds").select("r_ts").as[Timestamp].collect().toSet
      assert(got == Set(ts(0), ts(1))) // t+0 and t+60s in; t+61s out
    } finally q.stop()
  }
}
