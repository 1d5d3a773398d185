package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, StructField, StructType}

import graft.avro.AvroCodec
import graft.model.Message
import graft.pipeline.GraftConfig
import graft.sources.Tables

/** Throughput measurement for the reference's actual workload shape: a
  * checkpointed stream of Avro-encoded message bytes through
  * decode → enrich → dual keyed upsert (BackupMessageConsumer.java:39-61).
  * Batch queries measure the relational surface; this measures the
  * streaming hot path the reference was built for.
  *
  * Method: the message table for the scale factor is Avro-encoded into
  * `batches` parquet wire files (untimed setup — producing bytes is the
  * upstream system's job), then replayed through a file streaming source
  * with `maxFilesPerTrigger=1`, so [[MessagePipeline.run]] processes
  * exactly one wire file per micro-batch under `Trigger.AvailableNow`.
  * The timed region is stream start → all batches drained, i.e. it
  * includes per-batch checkpoint commits and the per-batch partition
  * merges of both sinks — the same costs a production run pays.
  */
object StreamingBench {

  final case class Result(records: Long, batches: Int, seconds: Double) {
    def rps: Double = if (seconds > 0) records / seconds else 0.0
  }

  private val wireSchema = StructType(Seq(StructField("value", BinaryType)))

  /** Encode the sf message table into `batches` wire files under `dir`.
    * Returns the record count. Runs as a narrow partition-wise map (the
    * repartition shuffles only raw bytes, once, outside the timed region).
    */
  def writeWire(spark: SparkSession, sfDir: String, dir: String, batches: Int): Long = {
    val msgs = Tables.messages(spark, sfDir).as[Message](Encoders.product[Message])
    msgs.repartition(batches)
      .mapPartitions(_.map(AvroCodec.encode))(Encoders.BINARY)
      .toDF("value")
      .write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).count()
  }

  /** Drive the full pipeline over a prepared wire dir; timed.
    *
    * Records/batches are counted through a [[StreamingQueryListener]]
    * rather than `q.recentProgress`: Spark retains only the last
    * `spark.sql.streaming.numRecentProgressUpdates` (default 100) progress
    * entries, so a run with more batches would silently under-count and
    * deflate the reported rps. The listener sees every progress event.
    */
  def drain(spark: SparkSession, wireDir: String, workDir: String): Result = {
    import org.apache.spark.sql.streaming.StreamingQueryListener
    val records = new java.util.concurrent.atomic.AtomicLong(0L)
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    // match on the query NAME, fixed before .start(): matching on runId
    // (assigned only after run() returns) would race the first progress
    // event and silently undercount, inflating the reported rps
    val queryName = "graft-stream-bench-" + java.util.UUID.randomUUID()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        if (e.progress.name == queryName && e.progress.numInputRows > 0) {
          records.addAndGet(e.progress.numInputRows)
          batches.incrementAndGet()
          ()
        }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    try {
      val raw = spark.readStream
        .schema(wireSchema)
        .option("maxFilesPerTrigger", 1)
        .parquet(wireDir)
      val t0 = System.nanoTime()
      val q = MessagePipeline.run(raw, GraftConfig.dev,
        s"$workDir/detail", s"$workDir/summary", s"$workDir/checkpoint",
        queryName = Some(queryName))
      q.processAllAvailable()
      q.stop()
      val secs = (System.nanoTime() - t0) / 1e9
      // listener events are delivered asynchronously — wait until the
      // counters go quiet (bounded) before reading them
      var last = -1L
      var spins = 0
      while (records.get() != last && spins < 50) {
        last = records.get(); Thread.sleep(100); spins += 1
      }
      Result(records.get(), batches.get(), secs)
    } finally spark.streams.removeListener(listener)
  }

  /** One-call form for Bench: encode at `sfDir`, replay, clean up. */
  def run(spark: SparkSession, sfDir: String, batches: Int = 8): Result = {
    val work = Files.createTempDirectory("graft-stream-bench").toFile
    try {
      writeWire(spark, sfDir, s"${work.getPath}/wire", batches)
      drain(spark, s"${work.getPath}/wire", work.getPath)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(work)
    }
  }
}
