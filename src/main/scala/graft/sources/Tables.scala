package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loaders over the driver testdata layout
  * (`/root/testdata/sf{N}/<table>.parquet`, TESTDATA.md).
  *
  * These are thin: the point is that every query reads through here so
  * scan-level concerns (the ns-timestamp quirk, column pruning) are
  * handled once.
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** `events.parquet` carries INT64 TIMESTAMP(NANOS) which Spark's parquet
    * reader rejects; read nanos as long
    * (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to micros with
    * integral division (a double-precision divide would lose sub-ms bits
    * at 2024-era epoch-nano magnitudes).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumn("ts_ns", col("ts"))
      .withColumn("ts", expr("timestamp_micros(ts_ns div 1000)"))
  }

  /** The reference-domain message stream, synthesized from `events`
    * (column mapping per FIXTURES.md §2: event_id→msgId, user_id→username,
    * ts→sentTime epoch-millis, props→stanza, event_type→peer hint).
    */
  def messages(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).select(
      concat(lit("m"), col("event_id")).as("msgId"),
      concat(lit("user"), col("user_id")).as("username"),
      concat(col("event_type"), lit("@chat.example")).as("jid"),
      col("props").as("stanza"),
      expr("ts_ns div 1000000").as("sentTime")
    )
}
