package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{BinaryType, StructField, StructType}

import graft.pipeline.{Enrich, GraftConfig}
import graft.sink.ParquetUpsertSink
import graft.streaming.{MessagePipeline, StreamingBench}

/** Dev aid (r18): in-JVM alternating A/B of the streaming per-batch
  * changes — OLD (sequential sinks, broadcast-semi-join touched
  * partitions, rewrite-all summary) vs NEW (MessagePipeline.run at
  * HEAD: isin partition pruning, append-only-novel summary, overlapped
  * sinks). Same wire dir, fresh work dir per run, alternating in one
  * warmed JVM. `Test/runMain graft.DevStreamAB <sfdir> <reps>`.
  */
object DevStreamAB {
  private val wireSchema = StructType(Seq(StructField("value", BinaryType)))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = GraftSession.get(GraftSession.envCpus)
    val work = Files.createTempDirectory("graft-stream-ab").toFile
    val wire = s"${work.getPath}/wire"
    val n = StreamingBench.writeWire(spark, sfDir, wire, 8)

    // the r17 foreachBatch body, verbatim semantics
    def oldRun(dir: String): Double = {
      val raw = spark.readStream.schema(wireSchema)
        .option("maxFilesPerTrigger", 1).parquet(wire)
      val history = Enrich(MessagePipeline.decode(raw), GraftConfig.dev)
      val t0 = System.nanoTime()
      val q = history.writeStream
        .option("checkpointLocation", s"$dir/checkpoint")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val b = batch.persist()
          try {
            val existing = readExisting(s"$dir/detail", b)
            val touched = b.select("date_partition").distinct()
            val relevant = existing
              .join(broadcast(touched), Seq("date_partition"), "left_semi")
            val merged = ParquetUpsertSink.dedupByKey(
              relevant.unionByName(b), Seq("message_id"), "sent_time")
            merged.write.mode(SaveMode.Overwrite)
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy("date_partition").parquet(s"$dir/detail")
            val s0 = Enrich.summary(b)
            val sExisting = readExisting(s"$dir/summary", s0)
            sExisting.unionByName(s0).distinct()
              .write.mode(SaveMode.Overwrite).parquet(s"$dir/summary")
            ()
          } finally { b.unpersist(); () }
        }
        .start()
      q.processAllAvailable(); q.stop()
      (System.nanoTime() - t0) / 1e9
    }

    def readExisting(path: String, like: DataFrame): DataFrame = {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p) && fs.listStatus(p).nonEmpty)
        spark.read.schema(like.schema).parquet(path)
      else like.limit(0)
    }

    def newRun(dir: String): Double = {
      val raw = spark.readStream.schema(wireSchema)
        .option("maxFilesPerTrigger", 1).parquet(wire)
      val t0 = System.nanoTime()
      val q = MessagePipeline.run(raw, GraftConfig.dev,
        s"$dir/detail", s"$dir/summary", s"$dir/checkpoint")
      q.processAllAvailable(); q.stop()
      (System.nanoTime() - t0) / 1e9
    }

    var k = 0
    def freshDir(): String = { k += 1; s"${work.getPath}/run$k" }
    // warm both once
    oldRun(freshDir()); newRun(freshDir())
    (1 to reps).foreach { i =>
      spark.catalog.clearCache(); System.gc()
      val o = oldRun(freshDir())
      spark.catalog.clearCache(); System.gc()
      val nn = newRun(freshDir())
      println(f"[devstreamab] rep$i old=${o}%.2f s (${n / o}%.0f rps)  new=${nn}%.2f s (${n / nn}%.0f rps)")
    }
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(work)
    spark.stop()
  }
}
