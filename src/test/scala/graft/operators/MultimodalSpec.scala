package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Multimodal._
import graft.sources.Tables

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = syntheticMedia(Tables.documents(spark, sf001)).cache()

  test("blobStats: byte length and digest match the payload") {
    val one = media.join(
      Tables.documents(spark, sf001).select("doc_id", "text"), "doc_id")
      .limit(1).select("text", "doc_id").as[(String, Long)].head()
    val stats = blobStats(media).filter($"doc_id" === one._2)
      .as[(Long, Int, String)].head()
    assert(stats._2 == one._1.getBytes("UTF-8").length)
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val hex = md.digest(one._1.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(stats._3 == hex)
  }

  test("extractMeta: deterministic stub decode, full coverage, sane ranges") {
    val meta = extractMeta(media, () => new StubDecoder).cache()
    assert(meta.count() == media.count())
    val m = meta.agg(min("width"), max("width"), min("n_frames")).head()
    assert(m.getInt(0) >= 64 && m.getInt(2) >= 1)
    // deterministic: second run produces identical rows
    val a = meta.orderBy("doc_id").collect().toSeq
    val b = extractMeta(media, () => new StubDecoder).orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("sampleFrames: stride sampling produces ceil(frames/stride) rows per doc") {
    val meta = extractMeta(media, () => new StubDecoder)
      .select($"doc_id", $"n_frames").as[(Long, Int)].collect().toMap
    val frames = sampleFrames(media, () => new StubDecoder, stride = 30)
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    meta.foreach { case (id, nf) =>
      val expect = (nf + 29) / 30
      assert(frames(id) == expect, s"doc $id: frames=$nf sampled=${frames(id)}")
    }
  }
}
