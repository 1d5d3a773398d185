package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.Dedup

/** Streaming corpus ingestion: foreachBatch + [[Dedup.incrementalIngestDigests]]
  * against a persisted digest index — the streaming form of
  * `pipe_ingest_incremental`. State is externalized to the index table
  * (same design as the reference's Cassandra-upsert "state"), so a
  * replayed micro-batch converges instead of double-ingesting.
  */
class StreamingIngestSpec extends SparkSpec {
  import spark.implicits._

  private def readIndex(path: String): DataFrame =
    if (new java.io.File(path).exists()) spark.read.parquet(path)
    else Seq.empty[String].toDF("content_sha")

  private def ingestBatch(indexPath: String, outPath: String)(
      batch: DataFrame, id: Long): Unit = {
    val novel = Dedup.incrementalIngestDigests(
      readIndex(indexPath), batch, "text", "doc_id").cache()
    try {
      // land the novel documents, then extend the index — append order
      // matters for crash-safety: a re-run re-selects the same novel set
      // only if the index write is the last step
      batch.join(novel.select("doc_id"), Seq("doc_id"), "left_semi")
        .write.mode("append").parquet(outPath)
      novel.select("content_sha").write.mode("append").parquet(indexPath)
    } finally novel.unpersist()
  }

  test("only novel content lands; in-batch and cross-batch dups drop") {
    val root = tmpDir("ingest")
    val indexPath = s"$root/index"
    val outPath = s"$root/docs"
    val in = MemoryStream[(Long, String)](spark)
    val q = in.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch(ingestBatch(indexPath, outPath) _)
      .option("checkpointLocation", s"$root/ckpt")
      .start()
    try {
      in.addData((1L, "alpha"), (2L, "beta"))
      q.processAllAvailable()
      assert(spark.read.parquet(outPath).as[(Long, String)].collect().toSet ==
        Set((1L, "alpha"), (2L, "beta")))

      // 3 replays batch-1 content, 4/5 are an in-batch dup pair
      in.addData((3L, "alpha"), (5L, "gamma"), (4L, "gamma"))
      q.processAllAvailable()
      val docs = spark.read.parquet(outPath).as[(Long, String)].collect().toSet
      assert(docs == Set((1L, "alpha"), (2L, "beta"), (4L, "gamma")),
        s"got $docs")

      // full replay of already-seen content: nothing new lands
      in.addData((6L, "alpha"), (7L, "gamma"))
      q.processAllAvailable()
      assert(spark.read.parquet(outPath).count() == 3)
      // index holds exactly the distinct corpus digests
      assert(spark.read.parquet(indexPath).distinct().count() == 3)
    } finally q.stop()
  }
}
