package graft.sources

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.avro.AvroCodec
import graft.model.Message
import graft.pipeline.GraftConfig
import graft.streaming.MessagePipeline

class MessageSourceSpec extends SparkSpec {
  import spark.implicits._

  test("kafka config projection strips the reference prefix (F2 parity)") {
    val props = Map(
      "kafka.message.backup.topic" -> "message-topic",
      "kafka.message.backup.group.id" -> "message-consumer",
      "kafka.message.backup.zookeeper.connect" -> "zk:2181",
      "cassandra.hosts" -> "c1,c2", // unrelated keys are dropped
      "record.ttl" -> "86400")
    val kp = MessageSource.kafkaProps(props)
    assert(kp == Map("topic" -> "message-topic",
      "group.id" -> "message-consumer", "zookeeper.connect" -> "zk:2181"))
  }

  test("file source streams binary values end-to-end through the pipeline") {
    val msgs = (0 until 8).map(i =>
      Message(s"f$i", s"u$i", "peer@x", s"payload-$i", 1704067200000L + i))
    val inDir = tmpDir("msrc_in")
    msgs.map(AvroCodec.encode).toDF("value").write.parquet(inDir)

    val detail = tmpDir("msrc_det"); val summary = tmpDir("msrc_sum")
    val q = MessagePipeline.run(
      MessageSource.Files(inDir).stream(spark),
      GraftConfig.dev, detail, summary, tmpDir("msrc_cp"))
    q.processAllAvailable(); q.stop()
    assert(spark.read.parquet(detail).count() == 8)
  }

  test("wrapped memory stream source matches the pipeline contract") {
    val in = MemoryStream[Array[Byte]](spark)
    in.addData(Seq(Message("w1", "u", "p@x", "s", 0L)).map(AvroCodec.encode))
    val src = MessageSource.Wrapped(in.toDF())
    val detail = tmpDir("msrc2_det")
    val q = MessagePipeline.run(src.stream(spark), GraftConfig.dev,
      detail, tmpDir("msrc2_sum"), tmpDir("msrc2_cp"))
    q.processAllAvailable(); q.stop()
    assert(spark.read.parquet(detail).count() == 1)
  }

  test("kafka source rejects zookeeper-only config with a clear message") {
    val src = MessageSource.Kafka(Map(
      "kafka.message.backup.topic" -> "t",
      "kafka.message.backup.zookeeper.connect" -> "zk:2181"))
    val e = intercept[IllegalArgumentException] { src.stream(spark) }
    assert(e.getMessage.contains("bootstrap.servers"))
  }

  test("kafka source fails lazily without the connector jar") {
    val src = MessageSource.Kafka(Map(
      "kafka.message.backup.topic" -> "t",
      "kafka.message.backup.bootstrap.servers" -> "broker:9092"))
    intercept[Exception] { src.stream(spark) } // DATA_SOURCE_NOT_FOUND offline
  }
}
