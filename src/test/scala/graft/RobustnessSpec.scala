package graft

import org.apache.spark.sql.functions._

import graft.avro.AvroCodec
import graft.model.Message
import graft.operators.{Dedup, Similarity, TextAnalysis}
import graft.pipeline.{Enrich, GraftConfig}
import graft.streaming.MessagePipeline

/** Degenerate-input behavior: empty frames, single rows, and malformed
  * records must flow through every operator without errors — at corpus
  * scale some partition or some batch is always empty.
  */
class RobustnessSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emptyDocs =
    Seq.empty[(Long, String, String, String)].toDF("doc_id", "text", "lang", "source")

  test("enrich and summary on an empty message frame") {
    val empty = Seq.empty[Message].toDF()
    assert(Enrich(empty, GraftConfig.dev).count() == 0)
    assert(Enrich.summary(Enrich.plain(empty)).count() == 0)
  }

  test("dedup operators on empty and single-row frames") {
    assert(Dedup.exactGroups(emptyDocs, "text", "doc_id").count() == 0)
    assert(Dedup.minhashNearDups(emptyDocs, "text", "doc_id").count() == 0)
    assert(Dedup.simhashNearDups(emptyDocs, "text", "doc_id",
      Seq("lang", "source")).count() == 0)
    val one = Seq((1L, "only doc here now", "en", "s")).toDF("doc_id", "text", "lang", "source")
    assert(Dedup.minhashNearDups(one, "text", "doc_id").count() == 0)
    assert(Dedup.ngramJaccardBlocked(one, "text", "doc_id",
      Seq("lang"), 0.5).count() == 0)
  }

  test("round-2 operators on empty and degenerate frames") {
    import graft.operators.{Decontaminate, Packing, RangeJoin}
    // interval join: empty either side → empty, no errors
    val l = Seq((1L, 7L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("l_id", "l_user", "l_ts")
    val emptyR = Seq.empty[(Long, Long, java.sql.Timestamp)]
      .toDF("r_id", "r_user", "r_ts")
    assert(RangeJoin.intervalJoin(l, emptyR, "l_ts", "r_ts", 1, 60,
      Seq("l_user" -> "r_user")).count() == 0)
    // packing: empty input → empty output; single row → bin 0
    val emptyToks = Seq.empty[(Long, Long)].toDF("doc_id", "tok")
    assert(Packing.packByBudget(emptyToks, "doc_id", "tok", 100).count() == 0)
    val oneTok = Seq((5L, 42L)).toDF("doc_id", "tok")
    assert(Packing.packByBudget(oneTok, "doc_id", "tok", 100)
      .select("seq_id").as[Long].head() == 0L)
    // components: empty pair list → empty labels; self-pairs only → empty
    assert(Dedup.connectedComponents(
      Seq.empty[(Long, Long)].toDF("id_a", "id_b")).count() == 0)
    assert(Dedup.connectedComponents(
      Seq((3L, 3L)).toDF("id_a", "id_b")).count() == 0)
    // decontamination: empty bench → nothing flagged
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val emptyBench = Seq.empty[(Long, String)].toDF("bench_id", "btext")
    assert(Decontaminate.overlaps(docs, "text", "doc_id",
      emptyBench, "btext", "bench_id", n = 3).count() == 0)
    // k-means with fewer vectors than k still converges deterministically
    val tiny = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val cents = Similarity.kmeansCentroids(tiny, k = 8, iters = 2)
    assert(cents.count() == 2)
  }

  test("similarity on empty corpus and empty query panel") {
    val empty = Seq.empty[(Long, Array[Float], Int)].toDF("vec_id", "embedding", "label")
    val some = Seq((1L, Array(1f, 0f), 0), (2L, Array(1f, 0f), 0))
      .toDF("vec_id", "embedding", "label")
    assert(Similarity.bruteForceTopK(empty, some, 5).count() == 0)
    assert(Similarity.bruteForceTopK(some, empty, 5).count() == 0)
    // identical vectors share every table's bucket — a guaranteed hit
    // (orthogonal vectors can legitimately miss all LSH buckets)
    assert(Similarity.lshTopK(some, some, 5, dim = 2).count() > 0)
  }

  test("text analysis on empty strings and whitespace") {
    val got = Seq("", "   ", "\t\n")
      .toDF("t")
      .select(TextAnalysis.tokenCount($"t"), TextAnalysis.qualityScore($"t"),
        TextAnalysis.langId($"t"), TextAnalysis.fingerprint($"t"))
      .collect()
    assert(got.length == 3) // no errors; values defined
    assert(got.forall(_.getAs[String](2) == "und"))
  }

  test("dead-letter split quarantines malformed bytes, keeps good ones") {
    val good = AvroCodec.encode(Message("g1", "u", "p@x", "s", 1L))
    val bad = Array[Byte](1, 2, 3)
    val (decoded, dead) = MessagePipeline.decodeWithDeadLetter(
      Seq(good, bad).toDF("value"))
    assert(decoded.select("msgId").as[String].collect().toSeq == Seq("g1"))
    assert(dead.count() == 1)
  }

  test("round-4 operators on empty and degenerate frames") {
    import graft.operators.{Chunking, Decontaminate, Search}
    // degenerate: single doc, doc shorter than one chunk/gram
    val one = Seq((1L, "only")).toDF("doc_id", "text")
    assert(Chunking.chunkTokens(one, "text", "doc_id", 32, 24).count() == 1)
    assert(Decontaminate.duplicatePassageStats(one, "text", "doc_id").count() == 0)
    assert(Search.bm25(one, "text", "doc_id", Seq("absent")).count() == 0)
    assert(Search.bm25TopK(one, "text", "doc_id", Seq("only"), 5).count() == 1)
    // whitespace-only text must not crash tokenize-based ops
    val ws = Seq((1L, "   ")).toDF("doc_id", "text")
    assert(Chunking.chunkTokens(ws, "text", "doc_id", 4, 4).count() == 1)
    assert(Decontaminate.duplicatePassageStats(emptyDocs, "text", "doc_id").count() == 0)
    // empty candidate lists through the fusion
    val noRanks = Seq.empty[(Long, Long)].toDF("doc_id", "rank")
    assert(Search.rrfFuse(Seq(noRanks, noRanks), "doc_id").count() == 0)
  }

  test("semantic dedup / cluster quality / lm score on degenerate inputs") {
    import graft.operators.{Similarity, TextAnalysis}
    val tiny = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0f, 1f)), (2L, Array(1f, 0.01f)))
      .toDF("vec_id", "embedding")
    // corpus smaller than the seed count: every vector is its own seed →
    // all-singleton cells, zero pairs — degenerate but well-defined
    assert(Similarity.semanticNearDups(tiny, k = 8, topPairs = 10).count() == 0)
    // with 2 seeds, vector 2 joins seed 0's cell and pairs with it
    val pairs = Similarity.semanticNearDups(tiny, k = 2, topPairs = 10)
    assert(pairs.count() >= 1)
    // zero-norm member: counted, contributes 0 cohesion (not null-poisoned)
    val withZero = tiny.union(Seq((3L, Array(0f, 0f))).toDF("vec_id", "embedding"))
    val cq = Similarity.clusterQuality(withZero,
      Similarity.seedCentroids(withZero, 2))
      .as[(Int, Long, Double)].collect()
    assert(cq.map(_._2).sum == 4, "zero vector still lands in a cell")
    assert(cq.forall { case (_, _, m) => !m.isNaN })
    // single-doc corpus: every token has c=1, score well-defined;
    // whitespace-only text tokenizes to one empty token, not a crash
    val oneDoc = Seq((1L, "alpha beta alpha")).toDF("doc_id", "text")
    val lm = TextAnalysis.lmScore(oneDoc, "text", "doc_id")
      .as[(Long, Long, Double)].head()
    assert(lm._2 == 3 && lm._3 > 0)
    val wsDoc = Seq((1L, "   ")).toDF("doc_id", "text")
    assert(TextAnalysis.lmScore(wsDoc, "text", "doc_id").count() == 1)
  }

  test("round-8 operators on empty and degenerate frames") {
    import graft.operators.{Dedup, Sampling, Similarity, SubstringDedup, TextAnalysis}
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val one = Seq((1L, "only a handful of words here")).toDF("doc_id", "text")
    // dedup rewrite: empty in → empty out; single doc passes through
    assert(SubstringDedup.removeDupSpans(emptyDocs, 8).count() == 0)
    assert(SubstringDedup.removeDupSpans(one, 8)
      .as[(Long, String)].head()._2 == "only a handful of words here")
    // leakproof split: empty frame fine; string ids rejected loudly
    assert(Sampling.leakproofSplit(emptyDocs, "text", "doc_id").count() == 0)
    val strIds = Seq(("a", "x")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Sampling.leakproofSplit(strIds, "text", "doc_id")
    }
    assert(e.getMessage.contains("must be integral"))
    // gopher flags: empty and whitespace-only never crash
    assert(TextAnalysis.withGopherFlags(emptyDocs, "text").count() == 0)
    assert(TextAnalysis.withGopherFlags(
      Seq((1L, "   ")).toDF("doc_id", "text"), "text").count() == 1)
    // outliers: empty corpus; single-member group still ranks itself
    val emptyEmb = Seq.empty[(Long, Int, Array[Float])]
      .toDF("vec_id", "label", "embedding")
    assert(Similarity.groupOutliers(emptyEmb, 3, "label", "vec_id").count() == 0)
    val solo = Seq((7L, 1, Array(1f, 2f))).toDF("vec_id", "label", "embedding")
    assert(Similarity.groupOutliers(solo, 3, "label", "vec_id").count() == 1)
    // near-dup ingest: empty batch, and an empty index accepts all
    val emptyIdx = Dedup.nearDupIndex(emptyDocs, "text", "doc_id")
    assert(Dedup.incrementalIngestNearDup(emptyIdx, emptyDocs,
      "text", "doc_id").count() == 0)
    assert(Dedup.incrementalIngestNearDup(emptyIdx, one,
      "text", "doc_id").count() == 1)
    // winnow pairs with dfCap on an empty frame
    assert(SubstringDedup.winnowedPairs(emptyDocs, dfCap = Some(4)).count() == 0)
  }
}
