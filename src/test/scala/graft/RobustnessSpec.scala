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
}
