package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.avro.AvroCodec
import graft.model.Message
import graft.pipeline.{Enrich, GraftConfig}

class MessagePipelineSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = GraftConfig.dev

  private def msgs(ids: Range): Seq[Message] = ids.map { i =>
    Message(s"m$i", s"user${i % 3}", s"peer${i % 2}@x", s"""{"n": $i}""",
      1704067200000L + i * 86400000L) // spills across months every 31 msgs
  }

  test("end-to-end: avro byte stream → enrich → detail+summary sinks") {
    val detail = tmpDir("detail"); val summary = tmpDir("summary")
    val cp = tmpDir("cp")
    val input = MemoryStream[Array[Byte]](spark)
    input.addData(msgs(0 until 40).map(AvroCodec.encode))
    val q = MessagePipeline.run(input.toDF(), cfg, detail, summary, cp)
    q.processAllAvailable(); q.stop()

    val det = spark.read.parquet(detail)
    assert(det.count() == 40)
    assert(det.schema.fieldNames.sorted.toSeq ==
      Seq("date_partition", "jid", "message_id", "sent_time", "stanza", "username"))
    // stanza round-trips through AES
    val plain = det.filter($"message_id" === "m7")
      .select(graft.functions.MessageFunctions
        .decryptStanza($"stanza", cfg.encryptionKey, cfg.initVector))
      .as[String].head()
    assert(plain == """{"n": 7}""")

    val sum = spark.read.parquet(summary)
    assert(sum.count() ==
      Enrich.summary(Enrich.plain(msgs(0 until 40).toDF())).count())
  }

  test("restart + duplicate delivery converges (effectively-once)") {
    val detail = tmpDir("detail2"); val summary = tmpDir("summary2")
    val input = MemoryStream[Array[Byte]](spark)
    input.addData(msgs(0 until 10).map(AvroCodec.encode))
    val q1 = MessagePipeline.run(input.toDF(), cfg, detail, summary, tmpDir("cp2"))
    q1.processAllAvailable(); q1.stop()
    val snap1 = spark.read.parquet(detail).orderBy("message_id").collect().toSeq

    // fresh checkpoint: the same data is delivered AGAIN (at-least-once)
    val input2 = MemoryStream[Array[Byte]](spark)
    input2.addData(msgs(0 until 10).map(AvroCodec.encode))
    val q2 = MessagePipeline.run(input2.toDF(), cfg, detail, summary, tmpDir("cp3"))
    q2.processAllAvailable(); q2.stop()

    val snap2 = spark.read.parquet(detail).orderBy("message_id").collect().toSeq
    assert(snap1 == snap2) // idempotent upsert: replay is invisible
    assert(spark.read.parquet(summary).count() ==
      Enrich.summary(Enrich.plain(msgs(0 until 10).toDF())).count())
  }
}
