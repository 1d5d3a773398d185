package graft.sink

import org.apache.spark.sql.functions._

import graft.SparkSpec

class UpsertSinkSpec extends SparkSpec {
  import spark.implicits._

  test("upsert is an idempotent keyed merge (at-least-once replay converges)") {
    val dir = tmpDir("upsert")
    val sink = new ParquetUpsertSink(spark, dir)
    val b1 = Seq(("k1", 1L, "a"), ("k2", 1L, "b")).toDF("id", "v", "payload")
    sink.upsert(b1, Seq("id"), "v")
    sink.upsert(b1, Seq("id"), "v") // replay of the same batch: no-op
    assert(sink.read().count() == 2)

    // newer version wins; older replay loses
    val b2 = Seq(("k1", 2L, "a2"), ("k3", 1L, "c")).toDF("id", "v", "payload")
    sink.upsert(b2, Seq("id"), "v")
    sink.upsert(b1, Seq("id"), "v") // stale replay must not undo k1@2
    val out = sink.read().orderBy("id").as[(String, Long, String)].collect().toSeq
    assert(out == Seq(("k1", 2L, "a2"), ("k2", 1L, "b"), ("k3", 1L, "c")))
  }

  test("partitioned upsert only rewrites touched partitions") {
    val dir = tmpDir("upsert_part")
    val sink = new ParquetUpsertSink(spark, dir, Some("p"))
    sink.upsert(Seq(("k1", 1L, "202401M"), ("k2", 1L, "202402M")).toDF("id", "v", "p"),
      Seq("id"), "v")
    // second batch touches only 202402M
    sink.upsert(Seq(("k2", 2L, "202402M")).toDF("id", "v", "p"), Seq("id"), "v")
    val out = sink.read().orderBy("id").as[(String, Long, String)].collect().toSeq
    assert(out == Seq(("k1", 1L, "202401M"), ("k2", 2L, "202402M")))
  }

  test("partition-crossing rewrite: old-bucket row survives (Cassandra parity, ADVICE r1)") {
    // the bucket column is part of the reference table's PRIMARY KEY
    // (date_partition, CassandraOutputFormat.java:87-89), so a later
    // write whose derived bucket changed addresses a DIFFERENT Cassandra
    // row and the old one stays — this sink documents and reproduces
    // exactly that; global per-key LWW requires keys ⇒ bucket
    val dir = tmpDir("upsert_cross")
    val sink = new ParquetUpsertSink(spark, dir, Some("p"))
    sink.upsert(Seq(("k1", 1L, "202401M")).toDF("id", "v", "p"), Seq("id"), "v")
    // corrected timestamp moved k1 into the next month bucket
    sink.upsert(Seq(("k1", 2L, "202402M")).toDF("id", "v", "p"), Seq("id"), "v")
    val out = sink.read().orderBy("v").as[(String, Long, String)].collect().toSeq
    assert(out == Seq(("k1", 1L, "202401M"), ("k1", 2L, "202402M")))
    // with the bucket in the key (the supported global-LWW shape), the
    // same sequence keeps both rows too and each is the latest FOR ITS KEY
    val sink2 = new ParquetUpsertSink(spark, dir, Some("p"))
    sink2.upsert(Seq(("k1", 3L, "202402M")).toDF("id", "v", "p"), Seq("id", "p"), "v")
    assert(sink2.read().filter($"p" === "202402M").as[(String, Long, String)]
      .collect().toSeq == Seq(("k1", 3L, "202402M")))
  }

  test("upsertGlobal removes the stale row when a key migrates buckets") {
    val dir = tmpDir("upsert_global")
    val sink = new ParquetUpsertSink(spark, dir, Some("p"))
    sink.upsertGlobal(
      Seq(("k1", 1L, "202401M"), ("k2", 1L, "202401M"), ("k3", 1L, "202403M"))
        .toDF("id", "v", "p"), Seq("id"), "v")
    // k1's corrected timestamp moves it a month forward: the 202401M copy
    // must die in the same commit, k2 (untouched neighbour) must survive
    sink.upsertGlobal(Seq(("k1", 2L, "202402M")).toDF("id", "v", "p"),
      Seq("id"), "v")
    val out = sink.read().orderBy("id").as[(String, Long, String)].collect().toSeq
    assert(out == Seq(("k1", 2L, "202402M"), ("k2", 1L, "202401M"),
      ("k3", 1L, "202403M")))
    // migrating the last key out of a bucket drops the bucket entirely
    sink.upsertGlobal(Seq(("k3", 2L, "202404M")).toDF("id", "v", "p"),
      Seq("id"), "v")
    val after = sink.read()
    assert(after.filter($"p" === "202403M").count() == 0)
    assert(after.count() == 3)
    // replay of the migrating batch converges (idempotent)
    sink.upsertGlobal(Seq(("k1", 2L, "202402M")).toDF("id", "v", "p"),
      Seq("id"), "v")
    // at-least-once replay of the ORIGINAL (older) batch: every row loses
    // the cross-bucket version arbitration — the migrated rows must NOT
    // regress to their old buckets/versions, and the dropped bucket must
    // not resurrect
    sink.upsertGlobal(
      Seq(("k1", 1L, "202401M"), ("k2", 1L, "202401M"), ("k3", 1L, "202403M"))
        .toDF("id", "v", "p"), Seq("id"), "v")
    assert(sink.read().orderBy("id").as[(String, Long, String)].collect().toSeq
      == Seq(("k1", 2L, "202402M"), ("k2", 1L, "202401M"), ("k3", 2L, "202404M")))
    assert(sink.read().filter($"p" === "202403M").count() == 0)
  }

  test("distinct-set upsert converges under replay (summary semantics)") {
    val dir = tmpDir("upsert_set")
    val sink = new ParquetUpsertSink(spark, dir)
    val s = Seq(("u1", "j1", "202401M"), ("u1", "j1", "202401M")).toDF("u", "j", "p")
    sink.upsertDistinct(s)
    sink.upsertDistinct(s)
    sink.upsertDistinct(Seq(("u2", "j1", "202401M")).toDF("u", "j", "p"))
    assert(sink.read().count() == 2)
  }

  test("distinct-set upsert: append-only-novel equals the rewrite-all reference, nulls included (r18)") {
    // the r18 form appends only rows proven absent (null-safe anti-join)
    // instead of rewriting the whole table; the observable contract —
    // table == distinct union of everything ever delivered — must hold
    // through replays, and rows carrying NULLs (where a plain equality
    // anti-join would never match and re-append forever) must converge
    val dir = tmpDir("upsert_set_ref")
    val sink = new ParquetUpsertSink(spark, dir)
    val batches: Seq[Seq[(String, String, String)]] = Seq(
      Seq(("u1", "j1", "202401M"), ("u2", null, "202401M")),
      Seq(("u1", "j1", "202401M"), ("u3", "j2", null)), // full replay + new
      Seq(("u2", null, "202401M"), (null, null, null)), // null replay + all-null row
      Seq((null, null, null)) // all-null replay: must not duplicate
    )
    var ref = Set.empty[(String, String, String)]
    batches.foreach { b =>
      sink.upsertDistinct(b.toDF("u", "j", "p"))
      sink.upsertDistinct(b.toDF("u", "j", "p")) // immediate at-least-once replay
      ref = ref ++ b
      val got = sink.read().collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
      assert(got.size == ref.size, s"duplicates after $b: $got")
      assert(got.toSet == ref)
    }
  }

  test("distinct-set upsert: aborted append publishes nothing; the retry converges (r18)") {
    val dir = tmpDir("upsert_set_abort")
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftflaky.impl", classOf[FlakyRenameFs].getName)
    val sink = new ParquetUpsertSink(spark, s"graftflaky:$dir",
      retry = RetryPolicy(maxRetries = 1))
    val b = Seq(("u1", "j1", "202401M"), ("u2", "j2", "202402M")).toDF("u", "j", "p")
    FlakyRenameFs.failing.set(true)
    try {
      intercept[Throwable] { sink.upsertDistinct(b) }
      // the aborted commit must not have published any row file (only
      // _temporary state may exist) — a partially visible append is the
      // case the anti-join makes safe, but v1 commits publish nothing
      val visible = Option(new java.io.File(dir).listFiles())
        .fold(Seq.empty[String])(_.map(_.getName).toSeq)
        .filter(f => f.endsWith(".parquet") && !f.startsWith("_"))
      assert(visible.isEmpty, s"aborted append published: $visible")
    } finally FlakyRenameFs.failing.set(false)
    // the at-least-once retry of the SAME batch converges to exactly-once
    sink.upsertDistinct(b)
    sink.upsertDistinct(b)
    assert(sink.read().count() == 2)
  }

  test("retention predicate drops expired rows, keeps all when ttl<=0") {
    val df = Seq(
      ("a", java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      ("b", java.sql.Timestamp.valueOf("2024-06-01 00:00:00"))).toDF("id", "ts")
    val now = java.sql.Timestamp.valueOf("2024-06-02 00:00:00").getTime / 1000
    assert(Retention.live(df, "ts", 7 * 86400, now).count() == 1)
    assert(Retention.live(df, "ts", -1, now).count() == 2)
  }

  test("retry ladder degrades then fails (strict) or drops (lenient)") {
    var levels = Vector.empty[String]
    val strict = RetryPolicy(maxRetries = 3)
    intercept[RuntimeException] {
      strict.runWith[Unit] { l => levels :+= l; throw new RuntimeException("down") }
    }
    assert(levels == Vector("QUORUM", "THREE", "TWO"))

    val lenient = RetryPolicy(maxRetries = 2, lenient = true)
    assert(lenient.runWith[Unit] { _ => throw new RuntimeException("x") }.isEmpty)

    // succeeds on a later rung
    var n = 0
    val got = RetryPolicy(maxRetries = 5).runWith { l =>
      n += 1; if (n < 3) throw new RuntimeException("retry me") else l
    }
    assert(got.contains("TWO") && n == 3)

    intercept[IllegalArgumentException] { RetryPolicy(maxRetries = 0) }
  }
}

/** Switchable fault-injection filesystem (r18): local semantics, but
  * every rename throws while [[FlakyRenameFs.failing]] is set — drives
  * the abort-then-retry path of the sinks (the always-throwing cousin
  * lives in CorpusIngestSpec). Registered per-test via
  * `fs.graftflaky.impl`; the flag is static because Hadoop caches FS
  * instances per scheme.
  */
class FlakyRenameFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("graftflaky:///")
  override def rename(src: org.apache.hadoop.fs.Path,
      dst: org.apache.hadoop.fs.Path): Boolean =
    if (FlakyRenameFs.failing.get())
      throw new java.io.IOException("injected rename fault (flaky)")
    else super.rename(src, dst)
}

object FlakyRenameFs {
  val failing = new java.util.concurrent.atomic.AtomicBoolean(false)
}
