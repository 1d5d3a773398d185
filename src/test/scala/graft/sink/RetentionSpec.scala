package graft.sink

import java.sql.Timestamp

import graft.SparkSpec

class RetentionSpec extends SparkSpec {
  import spark.implicits._

  test("compact rewrites mixed partitions and drops fully-expired ones") {
    val dir = tmpDir("ttl")
    val rows = Seq(
      // 202401M: fully expired
      ("a", Timestamp.valueOf("2024-01-10 00:00:00"), "202401M"),
      ("b", Timestamp.valueOf("2024-01-20 00:00:00"), "202401M"),
      // 202402M: mixed
      ("c", Timestamp.valueOf("2024-02-01 00:00:00"), "202402M"),
      ("d", Timestamp.valueOf("2024-02-25 00:00:00"), "202402M"),
      // 202403M: fully live (must not be rewritten)
      ("e", Timestamp.valueOf("2024-03-05 00:00:00"), "202403M"))
      .toDF("id", "sent_time", "date_partition")
    rows.write.partitionBy("date_partition").parquet(dir)

    // now = 2024-03-10; ttl = 20 days → cutoff 2024-02-19
    val now = Timestamp.valueOf("2024-03-10 00:00:00").getTime / 1000
    Retention.compact(spark, dir, "sent_time", "date_partition",
      ttlSeconds = 20L * 86400, nowEpochSec = now)

    val left = spark.read.parquet(dir)
      .select("id").as[String].collect().sorted.toSeq
    assert(left == Seq("d", "e"))
    // partition directory of the fully-expired month is gone
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/date_partition=202401M")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/date_partition=202403M")))
  }

  test("compact with ttl<=0 is a no-op") {
    val dir = tmpDir("ttl_off")
    Seq(("a", Timestamp.valueOf("2020-01-01 00:00:00"), "202001M"))
      .toDF("id", "sent_time", "date_partition")
      .write.partitionBy("date_partition").parquet(dir)
    Retention.compact(spark, dir, "sent_time", "date_partition", -1, 0)
    assert(spark.read.parquet(dir).count() == 1)
  }
}
