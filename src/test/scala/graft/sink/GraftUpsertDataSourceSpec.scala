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

  test("simulated executor retry: only committed attempts' rows reach the target") {
    // the environment-blocked Cassandra endpoint's job-level promise,
    // exercised at the V2 protocol seam directly: partition 0's first
    // attempt dies two ways — (a) aborted by the task (file deleted),
    // (b) executor lost WITHOUT abort (orphan staged file) — then a
    // retry attempt succeeds. Job commit must apply exactly the
    // committed messages' rows once, ignore the orphan, and clear
    // staging entirely.
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types._
    import org.apache.spark.unsafe.types.UTF8String
    val dir = tmpDir("v2_retry")
    val schema = StructType(Seq(StructField("id", StringType),
      StructField("v", LongType)))
    val staging = s"$dir/_staging/q-retry-spec"
    val batch = new GraftUpsertBatchWrite(schema, dir, staging,
      "upsert", Seq("id"), "v", None)
    val factory = batch.createBatchWriterFactory(null)
    def row(id: String, v: Long): InternalRow =
      InternalRow(UTF8String.fromString(id), v)
    // attempt 0 of partition 0: writes, then task-aborts (retry case a)
    val w0a = factory.createWriter(0, 100L)
    w0a.write(row("stale-aborted", 1L)); w0a.abort()
    // attempt 1 of partition 0: executor dies silently — file ORPHANED
    val w0b = factory.createWriter(0, 101L)
    w0b.write(row("stale-orphan", 1L))
    // never committed, never aborted: simulate lost executor
    // attempt 2 of partition 0 succeeds; partition 1 first try
    val w0c = factory.createWriter(0, 102L)
    w0c.write(row("k0", 7L))
    val m0 = w0c.commit()
    val w1 = factory.createWriter(1, 103L)
    w1.write(row("k1", 7L))
    val m1 = w1.commit()
    batch.commit(Array(m0, m1))
    val got = spark.read.parquet(dir).as[(String, Long)].collect().toSet
    assert(got == Set("k0" -> 7L, "k1" -> 7L),
      s"retry attempts leaked into the target: $got")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/_staging")),
      "staging (incl. the orphan) must be cleaned on commit")
  }
}
