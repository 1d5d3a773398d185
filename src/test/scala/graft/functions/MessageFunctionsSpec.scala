package graft.functions

import javax.crypto.Cipher
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}

import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks._

import graft.SparkSpec
import graft.functions.MessageFunctions._
import graft.model.MessageTypes

class MessageFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private val key = "0123456789abcdef"
  private val iv = "fedcba9876543210"

  /** Independent JCE oracle with the reference's exact cipher config
    * (Encryptor.java:15-28: AES/CBC/PKCS5Padding, raw ASCII key/IV,
    * Base64 of ciphertext only).
    */
  private def jceEncrypt(plain: String): String = {
    val c = Cipher.getInstance("AES/CBC/PKCS5PADDING")
    c.init(Cipher.ENCRYPT_MODE,
      new SecretKeySpec(key.getBytes("UTF-8"), "AES"),
      new IvParameterSpec(iv.getBytes("UTF-8")))
    java.util.Base64.getEncoder.encodeToString(c.doFinal(plain.getBytes("UTF-8")))
  }

  test("encryptStanza is byte-identical to the reference's JCE cipher") {
    val plains = Seq("hello", "", "çok güzel ☺", "emoji 😀 ok",
      "<message to='a@b'><body>hi</body></message>", "x" * 1000)
    val got = plains.toDF("p")
      .select(encryptStanza($"p", key, iv).as("e")).as[String].collect()
    assert(got.toSeq == plains.map(jceEncrypt))
  }

  test("decrypt(encrypt(s)) == s for unicode incl. emoji") {
    val plains = Seq("a", "tab\tchar", "multi\nline", "☃ 😀🎉", "{\"k\": 1}")
    val got = plains.toDF("p")
      .select(decryptStanza(encryptStanza($"p", key, iv), key, iv).as("d"))
      .as[String].collect()
    assert(got.toSeq == plains)
  }

  test("tryDecryptStanza yields null on garbage, not an error") {
    val got = Seq("definitely-not-ciphertext!")
      .toDF("e").select(tryDecryptStanza($"e", key, iv)).collect()
    assert(got.head.isNullAt(0))
  }

  test("datePartition matches reference yyyyMM + M semantics (UTC)") {
    val cases = Table(
      ("millis", "expected"),
      (0L, "197001M"), // epoch
      (1704067199999L, "202312M"), // 2023-12-31T23:59:59.999Z
      (1704067200000L, "202401M"), // 2024-01-01T00:00:00.000Z
      (-1L, "196912M"), // pre-epoch
      (4102444800000L, "210001M") // far future
    )
    forAll(cases) { (ms, exp) =>
      val got = Seq(ms).toDF("ms")
        .select(datePartitionFromMillis($"ms")).as[String].head()
      assert(got == exp, s"for millis=$ms")
    }
  }

  test("message-type maps are total over the 18 reference constants") {
    assert(MessageTypes.nameToCode.size == 18)
    assert(MessageTypes.codeToName.size == 16) // P and M collapse
    assert(MessageTypes.nameToCode("PHOTO") == "P" && MessageTypes.nameToCode("IMAGE") == "P")
    assert(MessageTypes.codeToName("P") == "PHOTO") // first-declared wins
    assert(MessageTypes.codeToName("M") == "CAPS_MEME")
    // every declared code classifies through the Column path
    val codes = MessageTypes.codeToName.keys.toSeq
    val got = codes.toDF("c").select(classifyType($"c").as("n")).as[String].collect()
    assert(got.toSet == MessageTypes.codeToName.values.toSet)
  }

  test("classifyType yields null for unknown codes") {
    val got = Seq("ZZ").toDF("c").select(classifyType($"c")).collect()
    assert(got.head.isNullAt(0))
  }

  test("parseStanza projects XMPP message fields; xmlns suppressed by schema") {
    val xml = """<message xmlns="jabber:client" to="alice@x" from="bob@x" type="chat" id="m1"><body>hi ☺</body></message>"""
    val row = Seq(xml).toDF("s").select(parseStanza($"s").as("p")).select("p.*")
    val r = row.collect().head
    assert(r.getAs[String]("_to") == "alice@x")
    assert(r.getAs[String]("_from") == "bob@x")
    assert(r.getAs[String]("body") == "hi ☺")
  }

  test("illegal XML control chars are flagged; emoji admitted (MXParser policy)") {
    val got = Seq("ok 😀 text", "bad \u0001 char", "tab\tok")
      .toDF("s").select(hasIllegalXmlChars($"s")).as[Boolean].collect()
    assert(got.toSeq == Seq(false, true, false))
  }

  // --- MXParser edge-case parity (XmppPacketReader.java:308-435 /
  // MXParser.java:44-344): the reference's hand-written pull parser
  // handles CDATA sections, the five predefined entities, numeric char
  // refs (incl. supplementary-plane emoji), comments, and processing
  // instructions. from_xml must cover the same inputs.

  test("CDATA section bodies survive (MXParser parseCDSect parity, modulo edge trim)") {
    // documented delta vs the reference: MXParser preserves CDATA
    // verbatim; from_xml trims SURROUNDING whitespace of element text.
    // Interior markup characters — the thing CDATA exists for — survive
    // exactly, which is the semantics message bodies rely on
    val xml = """<message to="a@x"><body><![CDATA[<not> & "markup" ]]></body></message>"""
    val r = Seq(xml).toDF("s").select(parseStanza($"s").as("p")).select("p.*")
      .collect().head
    assert(r.getAs[String]("body") == """<not> & "markup"""")
  }

  test("predefined entities and numeric char refs decode (parseEntityRef parity)") {
    val xml = "<message to=\"a@x\"><body>&lt;tag&gt; &amp; &quot;q&quot; &apos;a&apos; &#128512; &#x1F600;</body></message>"
    val r = Seq(xml).toDF("s").select(parseStanza($"s").as("p")).select("p.*")
      .collect().head
    assert(r.getAs[String]("body") == "<tag> & \"q\" 'a' \uD83D\uDE00 \uD83D\uDE00")
  }

  test("comments and an XML declaration around the stanza are tolerated") {
    val xml = """<?xml version="1.0" encoding="UTF-8"?><!-- relay --><message to="a@x"><!-- mid --><body>hi</body></message>"""
    val r = Seq(xml).toDF("s").select(parseStanza($"s").as("p")).select("p.*")
      .collect().head
    assert(r.getAs[String]("_to") == "a@x")
    assert(r.getAs[String]("body") == "hi")
  }

  test("malformed stanzas parse to null fields, never throw (tolerant-reader parity)") {
    val bad = Seq("<message><body>unclosed", "not xml at all", "")
    val rows = bad.toDF("s").select(parseStanza($"s").as("p")).select("p.*")
      .collect()
    assert(rows.length == 3) // no exception; per-row nulls
    assert(rows.forall(r => r.isNullAt(r.fieldIndex("body")) ||
      r.getAs[String]("body") == null))
  }
}
