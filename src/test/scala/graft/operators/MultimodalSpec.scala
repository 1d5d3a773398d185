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

  test("HeaderDecoder parses real WAV and BMP headers, falls back otherwise") {
    // minimal valid PCM WAV: 16kHz mono 16-bit, 32 sample frames
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    val dataBytes = 64 // 32 frames * 2 bytes
    val wav = "RIFF".getBytes ++ le32(36 + dataBytes) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(16000) ++
      le32(32000) ++ le16(2) ++ le16(16) ++
      "data".getBytes ++ le32(dataBytes) ++ Array.fill[Byte](dataBytes)(0)
    val bmp = "BM".getBytes ++ Array.fill[Byte](16)(0) ++
      le32(640) ++ le32(480) ++ Array.fill[Byte](4)(0)
    val dec = new HeaderDecoder
    assert(dec.probe(wav) == ("wav", 16000, 1, 32))
    assert(dec.probe(bmp) == ("bmp", 640, 480, 1))
    // unknown payload → stub fallback, deterministic
    val other = "just text bytes".getBytes("UTF-8")
    assert(dec.probe(other) == new StubDecoder().probe(other))
  }

  test("extractMeta with HeaderDecoder over a mixed-media frame") {
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    val bmp = "BM".getBytes ++ Array.fill[Byte](16)(0) ++
      le32(100) ++ le32(50) ++ Array.fill[Byte](4)(0)
    val mixed = Seq((1L, bmp), (2L, "opaque".getBytes("UTF-8")))
      .toDF("doc_id", "blob")
    val meta = extractMeta(mixed, () => new HeaderDecoder)
      .collect().map(m => m.doc_id -> m).toMap
    assert(meta(1L).format == "bmp" && meta(1L).width == 100 && meta(1L).height == 50)
    assert(meta(2L).format != "bmp") // stub-decoded
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
