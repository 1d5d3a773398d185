package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{BinaryType, StructField, StructType}

/** Streaming message-source abstraction (SURVEY.md §2.1 S1 / §7.3).
  *
  * Every implementation yields a streaming DataFrame with a single binary
  * `value` column — the same shape Spark's Kafka source produces — which
  * [[graft.streaming.MessagePipeline]] decodes and enriches. The Kafka
  * implementation is a configuration swap once `spark-sql-kafka` is on
  * the classpath (offline container ships without it); files and
  * MemoryStream cover dev/test and batch-replay.
  */
trait MessageSource {
  def stream(spark: SparkSession): DataFrame
}

object MessageSource {

  /** Configuration keys follow the reference's property convention:
    * entries under `kafka.message.backup.` are Kafka consumer settings
    * with the prefix stripped (BackupMessageConsumer.java:77-87, F2).
    */
  val KafkaPrefix = "kafka.message.backup."

  /** Prefix-filter + rename of the raw properties — the reference's
    * config projection (BackupMessageConsumer.java:77-87) as a pure
    * function.
    */
  def kafkaProps(props: Map[String, String]): Map[String, String] =
    props.collect {
      case (k, v) if k.startsWith(KafkaPrefix) =>
        k.stripPrefix(KafkaPrefix) -> v
    }

  /** Reference consumer properties → Spark Kafka reader options, as a
    * PURE function so the translation is unit-testable without the
    * connector jar (offline container ships without it):
    *
    *  - `topic` → `subscribe` (conf default `message-topic`,
    *    message-consumer.properties:4)
    *  - `bootstrap.servers` → `kafka.bootstrap.servers`, REQUIRED: the
    *    reference's Kafka-0.8-era configs carry `zookeeper.connect`,
    *    which is a ZooKeeper address, not a broker endpoint — fail fast
    *    rather than dialing ZK
    *  - `auto.offset.reset` → `startingOffsets`, accepting the 0.8-era
    *    values (`smallest`/`largest`) alongside the modern ones — Spark's
    *    source reserves `kafka.auto.offset.reset` and would reject a
    *    blind passthrough
    *  - `zookeeper.connect` dropped (the Spark source speaks only to
    *    brokers; offsets live in the checkpoint, not ZK)
    *  - everything else passes through under the `kafka.` option prefix
    *    the consumer config expects (`group.id` → `kafka.group.id`, …)
    */
  def kafkaReaderOptions(props: Map[String, String]): Map[String, String] = {
    val kp = kafkaProps(props)
    val topic = kp.getOrElse("topic", "message-topic")
    val servers = kp.getOrElse("bootstrap.servers",
      throw new IllegalArgumentException(
        s"${KafkaPrefix}bootstrap.servers is required (zookeeper.connect " +
          "is a ZooKeeper address, not a Kafka broker endpoint)"))
    val starting = kp.get("auto.offset.reset").map {
      case "smallest" | "earliest" => "startingOffsets" -> "earliest"
      case "largest" | "latest" => "startingOffsets" -> "latest"
      case x => throw new IllegalArgumentException(
        s"unsupported auto.offset.reset: $x (smallest/largest/earliest/latest)")
    }
    val handled = Set("topic", "bootstrap.servers", "auto.offset.reset",
      "zookeeper.connect")
    val passthrough = (kp -- handled).map { case (k, v) => s"kafka.$k" -> v }
    Map("subscribe" -> topic, "kafka.bootstrap.servers" -> servers) ++
      starting ++ passthrough
  }

  /** Kafka source (requires the spark-sql-kafka connector jar; not on the
    * offline classpath — constructing the reader fails lazily at
    * `stream()` with Spark's missing-data-source error if absent).
    */
  final case class Kafka(props: Map[String, String]) extends MessageSource {
    def stream(spark: SparkSession): DataFrame =
      spark.readStream.format("kafka")
        .options(kafkaReaderOptions(props))
        .load()
        .select(col("value"))
  }

  /** File-stream source: binary-value parquet files under `path` (the
    * offline stand-in for a durable log; exactly-once via the file
    * source's offset log + checkpoint).
    */
  final case class Files(path: String) extends MessageSource {
    def stream(spark: SparkSession): DataFrame =
      spark.readStream
        .schema(StructType(Seq(StructField("value", BinaryType))))
        .parquet(path)
        .select(col("value"))
  }

  /** Wrap an existing streaming DataFrame (MemoryStream in tests). */
  final case class Wrapped(df: DataFrame) extends MessageSource {
    def stream(spark: SparkSession): DataFrame = df.select(col("value"))
  }
}
