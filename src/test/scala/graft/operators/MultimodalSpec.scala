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

  private def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
  private def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)

  /** Canonical PCM WAV: given rate/channels/bits with n frames of data. */
  private def wavBytes(rate: Int, channels: Int, bits: Int, frames: Int,
      audioFormat: Int = 1): Array[Byte] = {
    val dataBytes = frames * channels * bits / 8
    "RIFF".getBytes ++ le32(36 + dataBytes) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(audioFormat) ++ le16(channels) ++
      le32(rate) ++ le32(rate * channels * bits / 8) ++
      le16(channels * bits / 8) ++ le16(bits) ++
      "data".getBytes ++ le32(dataBytes) ++
      Array.tabulate[Byte](dataBytes)(i => i.toByte)
  }

  private def bmpBytes(w: Int, h: Int, dibSize: Int = 40): Array[Byte] =
    "BM".getBytes ++ Array.fill[Byte](12)(0) ++ le32(dibSize) ++
      le32(w) ++ le32(h) ++ Array.fill[Byte](4)(0)

  test("HeaderDecoder parses canonical PCM WAV and BMP, falls back otherwise") {
    val dec = new HeaderDecoder
    assert(dec.probe(wavBytes(16000, 1, 16, 32)) == ("wav", 16000, 1, 32))
    assert(dec.probe(bmpBytes(640, 480)) == ("bmp", 640, 480, 1))
    // top-down bitmap: negative height normalizes to magnitude
    assert(dec.probe(bmpBytes(640, -480)) == ("bmp", 640, 480, 1))
    // non-PCM (ADPCM) and unknown DIB headers must NOT be misparsed
    val adpcm = wavBytes(16000, 1, 4, 32, audioFormat = 0x11)
    assert(dec.probe(adpcm) == new StubDecoder().probe(adpcm))
    val coreBmp = bmpBytes(100, 50, dibSize = 12)
    assert(dec.probe(coreBmp) == new StubDecoder().probe(coreBmp))
    // arbitrary text starting with "BM" is not a bitmap
    val bmText = "BMW drivers love spark".getBytes("UTF-8")
    assert(dec.probe(bmText) == new StubDecoder().probe(bmText))
    val other = "just text bytes".getBytes("UTF-8")
    assert(dec.probe(other) == new StubDecoder().probe(other))
  }

  test("HeaderDecoder frame() extracts the real idx-th PCM sample frame") {
    val wav = wavBytes(8000, 2, 16, 10) // 4 bytes per frame
    val dec = new HeaderDecoder
    // frame 3 starts at byte 44 + 3*4 = 56; data bytes are tabulated 0,1,2,…
    assert(dec.frame(wav, 3).toSeq == Seq[Byte](12, 13, 14, 15))
  }

  test("extractMeta with HeaderDecoder over a mixed-media frame") {
    val mixed = Seq((1L, bmpBytes(100, 50)), (2L, "opaque".getBytes("UTF-8")))
      .toDF("doc_id", "blob")
    val meta = extractMeta(mixed, () => new HeaderDecoder)
      .collect().map(m => m.doc_id -> m).toMap
    assert(meta(1L).format == "bmp" && meta(1L).width == 100 && meta(1L).height == 50)
    assert(meta(2L).format != "bmp") // stub-decoded
  }

  test("sampleFrames bounds per-doc output (long media can't explode rows)") {
    val wav = wavBytes(8000, 1, 16, 5000)
    val n = sampleFrames(Seq((1L, wav)).toDF("doc_id", "blob"),
      () => new HeaderDecoder, stride = 1, maxSamples = 100).count()
    assert(n == 100)
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
