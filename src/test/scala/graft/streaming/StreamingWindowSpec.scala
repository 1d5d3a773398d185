package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

final case class Keyed(id: Long, ts: java.sql.Timestamp)
final case class ErrEv(err_ts: java.sql.Timestamp, err_user: String)
final case class ClkEv(clk_ts: java.sql.Timestamp, clk_user: String)

/** Streaming forms of the event-time operators whose batch forms are
  * oracle-checked in EventQueries: tumbling windows with watermark,
  * session windows, and streaming dedup (SURVEY.md §2.8 — capabilities
  * absent in the reference, declared engine extensions).
  */
class StreamingWindowSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  final case class Ev(ts: Timestamp, user: String, v: Double)

  test("stream-stream interval join: clicks within 10min after an error") {
    // streaming analog of RangeJoin/ev_range_follow: Spark's native
    // stream-stream join handles the time-bound condition with state
    // cleanup driven by the two watermarks — the same band semantics the
    // batch operator buckets by hand
    val errs = MemoryStream[ErrEv](spark)
    val clks = MemoryStream[ClkEv](spark)
    val joined = errs.toDF().withWatermark("err_ts", "30 minutes")
      .join(clks.toDF().withWatermark("clk_ts", "30 minutes"),
        expr("""err_user = clk_user AND
               |clk_ts >= err_ts + INTERVAL 1 SECOND AND
               |clk_ts <= err_ts + INTERVAL 10 MINUTES""".stripMargin))
    val q = joined.writeStream.format("memory").queryName("band_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      errs.addData(ErrEv(ts(5), "a"), ErrEv(ts(5), "b"))
      clks.addData(ClkEv(ts(7), "a"), ClkEv(ts(20), "a"), ClkEv(ts(6), "c"))
      q.processAllAvailable()
      val rows = spark.table("band_stream")
        .select($"err_user", $"clk_ts".cast("string"))
        .as[(String, String)].collect().toSet
      // only a's click at 10:07 lands inside (10:05, 10:15]; the 10:20
      // click is past the band and c has no matching error
      assert(rows == Set(("a", "2024-01-01 10:07:00")))
    } finally q.stop()
  }

  test("streaming tumbling window with watermark aggregates per window") {
    val in = MemoryStream[Ev](spark)
    val agg = in.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "15 minutes"), $"user")
      .agg(count(lit(1)).as("n"), sum($"v").as("sv"))
    val q = agg.writeStream.format("memory").queryName("tumbling")
      .outputMode(OutputMode.Update()).start()
    try {
      in.addData(Ev(ts(1), "a", 1), Ev(ts(7), "a", 2), Ev(ts(16), "a", 4),
        Ev(ts(3), "b", 8))
      q.processAllAvailable()
      val rows = spark.table("tumbling")
        .select($"window.start".cast("string"), $"user", $"n", $"sv")
        .as[(String, String, Long, Double)].collect().toSet
      assert(rows == Set(
        ("2024-01-01 10:00:00", "a", 2L, 3.0),
        ("2024-01-01 10:15:00", "a", 1L, 4.0),
        ("2024-01-01 10:00:00", "b", 1L, 8.0)))
    } finally q.stop()
  }

  test("streaming session window (10-min gap) merges adjacent events") {
    val in = MemoryStream[Ev](spark)
    val agg = in.toDF()
      .withWatermark("ts", "30 minutes")
      .groupBy(session_window($"ts", "10 minutes").as("w"), $"user")
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Complete()).start()
    try {
      // a: 10:01, 10:07 (same session), 10:30 (new session); b: 10:02
      in.addData(Ev(ts(1), "a", 1), Ev(ts(7), "a", 1), Ev(ts(30), "a", 1),
        Ev(ts(2), "b", 1))
      q.processAllAvailable()
      val rows = spark.table("sessions")
        .select($"user", $"n").as[(String, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
      assert(rows == Map("a" -> Seq(1L, 2L), "b" -> Seq(1L)))
    } finally q.stop()
  }

  test("streaming dropDuplicates with watermark suppresses replays") {
    val in = MemoryStream[Keyed](spark)
    val dedup = in.toDF()
      .withWatermark("ts", "20 minutes")
      .dropDuplicates("id")
      .groupBy().count()
    val q = dedup.writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Complete()).start()
    try {
      in.addData(Keyed(1, ts(1)), Keyed(2, ts(2)), Keyed(1, ts(3)))
      q.processAllAvailable()
      in.addData(Keyed(2, ts(4)), Keyed(3, ts(5))) // replay of 2 + new 3
      q.processAllAvailable()
      assert(spark.table("dedup").as[Long].head() == 3L)
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark bounds dedup state by event time") {
    // the scale-safe streaming dedup: state for a key is dropped once
    // the watermark passes it, so replays inside the window are
    // suppressed while state stays bounded (plain dropDuplicates keeps
    // every key forever without a watermark column in the key)
    val in = MemoryStream[Keyed](spark)
    val dedup = in.toDF()
      .withWatermark("ts", "5 minutes")
      .dropDuplicatesWithinWatermark("id")
    val q = dedup.writeStream.format("memory").queryName("dedup_wm")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(Keyed(1, ts(1)), Keyed(1, ts(2)), Keyed(2, ts(3)))
      q.processAllAvailable()
      // replay of id=1 within the watermark window: suppressed
      in.addData(Keyed(1, ts(4)))
      q.processAllAvailable()
      val rows = spark.table("dedup_wm").select($"id").as[Long].collect().toSeq
      assert(rows.sorted == Seq(1L, 2L))
    } finally q.stop()
  }
}
