package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CorpusIngestSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, text: String, src: String = "srcA") =
    (id, text, "en", src, text.length.toLong)

  private def writeArrival(dir: String, docs: Seq[(Long, String, String, String, Long)]): Unit =
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("append").parquet(dir)

  private def drain(src: String, corpus: String, ckpt: String,
      maxFiles: Option[Int] = Some(1)): Unit = {
    val q = CorpusIngest.start(spark, src, corpus, ckpt,
      minTokens = 3, maxFilesPerTrigger = maxFiles)
    q.awaitTermination()
  }

  test("quality gate, cross-batch dedup, deterministic within-batch resolve") {
    val src = tmpDir("ci_src"); val corpus = tmpDir("ci_corp")
    val ckpt = tmpDir("ci_ckpt")
    // arrival 1: a dup pair within the batch (2 < 9 → 2 survives), one
    // short doc that must fail the 3-token gate
    writeArrival(src, Seq(
      doc(2, "alpha beta gamma delta"),
      doc(9, "alpha beta gamma delta"),
      doc(3, "too short")))
    // arrival 2: a cross-batch dup of the survivor (larger id — must be
    // dropped by the anti-join) and a genuinely new doc
    writeArrival(src, Seq(
      doc(7, "alpha beta gamma delta"),
      doc(4, "epsilon zeta eta theta")))
    drain(src, corpus, ckpt)
    val landed = spark.read.parquet(corpus)
      .select("doc_id", "n_tokens").as[(Long, Long)].collect().sortBy(_._1)
    assert(landed.toSeq == Seq((2L, 4L), (4L, 4L)))
  }

  test("crash replay is a no-op: rerunning processed files appends nothing") {
    val src = tmpDir("ci_src2"); val corpus = tmpDir("ci_corp2")
    writeArrival(src, Seq(doc(1, "one two three four"),
      doc(2, "five six seven eight")))
    drain(src, corpus, tmpDir("ci_ckpt2a"))
    val first = spark.read.parquet(corpus).count()
    // a FRESH checkpoint replays every source file from scratch — the
    // worst-case at-least-once replay; the sink-as-state anti-join must
    // keep the corpus unchanged
    drain(src, corpus, tmpDir("ci_ckpt2b"))
    assert(spark.read.parquet(corpus).count() == first)
  }

  test("restart with kept checkpoint processes only new arrivals") {
    val src = tmpDir("ci_src3"); val corpus = tmpDir("ci_corp3")
    val ckpt = tmpDir("ci_ckpt3")
    writeArrival(src, Seq(doc(1, "aa bb cc dd")))
    drain(src, corpus, ckpt)
    writeArrival(src, Seq(doc(5, "ee ff gg hh")))
    drain(src, corpus, ckpt)
    val ids = spark.read.parquet(corpus).select("doc_id")
      .as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 5L))
  }

  private def drainNd(src: String, corpus: String, ckpt: String): Unit = {
    val q = CorpusIngest.startNearDup(spark, src, corpus, ckpt,
      minTokens = 3, threshold = 0.5, maxFilesPerTrigger = Some(1))
    q.awaitTermination()
  }

  test("near-dup ingest: sink-held band keys reject near-dups across batches") {
    val src = tmpDir("cind_src"); val corpus = tmpDir("cind_corp")
    val ckpt = tmpDir("cind_ckpt")
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    // arrival 1: the base doc + an in-batch near-dup (one word changed,
    // jaccard over 3-shingles >= 0.5) → min id 2 survives alone
    writeArrival(src, Seq(
      doc(2, base),
      doc(9, base.replace("lima", "CHANGED"))))
    // arrival 2: an exact replay (digest hit), a near-dup of the landed
    // doc (band hit — the state crossed micro-batches through the SINK),
    // and a genuinely novel doc
    writeArrival(src, Seq(
      doc(7, base),
      doc(8, base.replace("alpha", "OMEGA")),
      doc(4, "one two three four five six seven eight nine ten eleven twelve")))
    drainNd(src, corpus, ckpt)
    val landed = spark.read.parquet(corpus)
    val ids = landed.select("doc_id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(2L, 4L), s"landed: ${ids.toSeq}")
    // the band keys really live in the sink, beside the rows they index
    assert(landed.schema.fieldNames.contains("bands"))
    assert(landed.filter(size(col("bands")) === 0).isEmpty)
    // worst-case at-least-once replay (fresh checkpoint, same sources):
    // the sink-held digest + band state keeps the corpus unchanged
    drainNd(src, corpus, tmpDir("cind_ckpt2"))
    assert(spark.read.parquet(corpus).select("doc_id")
      .as[Long].collect().sorted.toSeq == Seq(2L, 4L))
  }

  test("near-dup ingest: transitive A-B-C cluster replays as a no-op") {
    // A-B and B-C are verified near-dup pairs (one word apart each) but
    // A and C differ in two words (Jaccard ~0.25 < 0.5): component
    // chaining must land ONLY A, and — the crash-replay trap — a full
    // replay must not re-admit C now that B never landed. Pinning the
    // resolve-before-screen order: resolution is a pure function of
    // the batch, so the replay resolves to {A} again and A digest-drops
    val a = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo"
    val b = a.replace("echo", "CHANGED1")
    val cdoc = b.replace("november", "CHANGED2")
    val src = tmpDir("cind3_src"); val corpus = tmpDir("cind3_corp")
    writeArrival(src, Seq(doc(1, a), doc(2, b), doc(3, cdoc)))
    drainNd(src, corpus, tmpDir("cind3_ckpt"))
    assert(spark.read.parquet(corpus).select("doc_id")
      .as[Long].collect().toSeq == Seq(1L),
      "the chained cluster must admit only its min id")
    // the at-least-once worst case: full replay from a fresh checkpoint
    drainNd(src, corpus, tmpDir("cind3_ckpt2"))
    assert(spark.read.parquet(corpus).select("doc_id")
      .as[Long].collect().toSeq == Seq(1L),
      "replay re-admitted part of a transitive cluster")
  }
}
