package graft.sink

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The V2 `format("graft-upsert")` facade must reproduce the
  * [[ParquetUpsertSink]] method-API semantics through the connector
  * write protocol — and a failed job must leave the target untouched
  * (BatchWrite.abort), which the method API cannot promise.
  */
class GraftUpsertDataSourceSpec extends SparkSpec {
  import spark.implicits._

  private def save(df: DataFrame, dir: String, opts: (String, String)*): Unit = {
    val w = df.write.format("graft-upsert").mode("append")
    opts.foreach { case (k, v) => w.option(k, v) }
    w.save(dir)
  }

  test("keyed upsert through the V2 path: idempotent replay, newer version wins") {
    val dir = tmpDir("v2_upsert")
    val b1 = Seq(("k1", 1L, "a"), ("k2", 1L, "b")).toDF("id", "v", "payload")
    save(b1, dir, "keys" -> "id", "version" -> "v")
    save(b1, dir, "keys" -> "id", "version" -> "v") // replay: no-op
    assert(spark.read.parquet(dir).count() == 2)

    val b2 = Seq(("k1", 2L, "a2"), ("k3", 1L, "c")).toDF("id", "v", "payload")
    save(b2, dir, "keys" -> "id", "version" -> "v")
    save(b1, dir, "keys" -> "id", "version" -> "v") // stale replay loses
    val out = spark.read.parquet(dir).orderBy("id")
      .as[(String, Long, String)].collect().toSeq
    assert(out == Seq(("k1", 2L, "a2"), ("k2", 1L, "b"), ("k3", 1L, "c")))
  }

  test("bucketed upsert through the V2 path merges only touched buckets") {
    val dir = tmpDir("v2_bucketed")
    save(Seq(("k1", 1L, "202401M"), ("k2", 1L, "202402M")).toDF("id", "v", "p"),
      dir, "keys" -> "id", "version" -> "v", "bucket" -> "p")
    save(Seq(("k2", 2L, "202402M")).toDF("id", "v", "p"),
      dir, "keys" -> "id", "version" -> "v", "bucket" -> "p")
    val out = spark.read.parquet(dir).orderBy("id")
      .as[(String, Long, String)].collect().toSeq
    assert(out == Seq(("k1", 1L, "202401M"), ("k2", 2L, "202402M")))
  }

  test("mode=global removes the stale copy when a key migrates buckets") {
    val dir = tmpDir("v2_global")
    save(Seq(("k1", 1L, "202401M"), ("k2", 1L, "202401M")).toDF("id", "v", "p"),
      dir, "keys" -> "id", "version" -> "v", "bucket" -> "p", "mode" -> "global")
    save(Seq(("k1", 2L, "202402M")).toDF("id", "v", "p"),
      dir, "keys" -> "id", "version" -> "v", "bucket" -> "p", "mode" -> "global")
    val out = spark.read.parquet(dir).orderBy("id")
      .as[(String, Long, String)].collect().toSeq
    assert(out == Seq(("k1", 2L, "202402M"), ("k2", 1L, "202401M")))
  }

  test("mode=distinct is the summary table's set-union semantics") {
    val dir = tmpDir("v2_distinct")
    save(Seq(("u1", "p1"), ("u1", "p2")).toDF("user", "peer"), dir,
      "mode" -> "distinct")
    save(Seq(("u1", "p2"), ("u2", "p1")).toDF("user", "peer"), dir,
      "mode" -> "distinct") // overlap unions away
    val out = spark.read.parquet(dir).orderBy("user", "peer")
      .as[(String, String)].collect().toSeq
    assert(out == Seq(("u1", "p1"), ("u1", "p2"), ("u2", "p1")))
  }

  test("a failing write job aborts: target byte-identical, staging cleaned") {
    val dir = tmpDir("v2_abort")
    save(Seq(("k1", 1L, "a")).toDF("id", "v", "payload"), dir,
      "keys" -> "id", "version" -> "v")
    val before = spark.read.parquet(dir).collect().map(_.toString).sorted.toSeq

    val boom = udf((s: String) =>
      if (s == "k3") throw new RuntimeException("boom") else s)
    val bad = Seq(("k2", 2L, "b"), ("k3", 2L, "c")).toDF("id", "v", "payload")
      .withColumn("id", boom($"id"))
    intercept[Exception] {
      save(bad, dir, "keys" -> "id", "version" -> "v")
    }
    val after = spark.read.parquet(dir).collect().map(_.toString).sorted.toSeq
    assert(after == before, "aborted write mutated the target")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/_staging")),
      "staging survived the abort")
  }

  test("missing keys/version options fail fast; distinct does not need them") {
    val dir = tmpDir("v2_opts")
    val df = Seq(("k1", 1L)).toDF("id", "v")
    intercept[Exception] { save(df, dir, "version" -> "v") }
    intercept[Exception] { save(df, dir, "keys" -> "id") }
    save(df, dir, "mode" -> "distinct") // fine
    assert(spark.read.parquet(dir).count() == 1)
  }

  test("an unknown mode is rejected, never silently downgraded to upsert") {
    val dir = tmpDir("v2_badmode")
    val df = Seq(("k1", 1L)).toDF("id", "v")
    val e = intercept[Exception] {
      save(df, dir, "keys" -> "id", "version" -> "v", "mode" -> "globel")
    }
    assert(e.getMessage.contains("globel") ||
      Option(e.getCause).exists(_.getMessage.contains("globel")))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir)) ||
      spark.read.parquet(dir).isEmpty, "bad-mode write mutated the target")
  }
}
