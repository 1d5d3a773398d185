package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.model.MessageTypes

/** Pure-`Column` scalar layer: every scalar the reference computes,
  * re-expressed as codegen'd Spark built-ins (no UDFs on the hot path).
  *
  * Reference sites:
  *  - AES-CBC encrypt/decrypt: Encryptor.java:15-43 (key/IV are 16-byte
  *    ASCII strings; ciphertext is Base64 with NO IV prefix)
  *  - month bucket: CassandraOutputFormat.java:56,106 (`yyyyMM` + "M")
  *  - epoch millis → timestamp: CassandraOutputFormat.java:103
  *  - type taxonomy: message/MessageType.java:6-24
  */
object MessageFunctions {

  /** Epoch-millis long → TimestampType (CassandraOutputFormat.java:103). */
  def sentTs(millis: Column): Column = timestamp_millis(millis)

  /** Month partition key: `yyyyMM` of the timestamp + literal "M"
    * (CassandraOutputFormat.java:106). Session TZ is pinned UTC; the
    * reference used the JVM default zone (SURVEY.md §7.5.2).
    */
  def datePartition(ts: Column): Column =
    concat(date_format(ts, "yyyyMM"), lit("M"))

  /** Same, straight from epoch millis. */
  def datePartitionFromMillis(millis: Column): Column =
    datePartition(sentTs(millis))

  // --- AES-128-CBC-PKCS5, byte-parity with Encryptor.java ---------------
  //
  // Spark's aes_encrypt(mode="CBC") returns IV ++ ciphertext; the
  // reference emits Base64(ciphertext) with the IV fixed out-of-band.
  // We pass the IV explicitly and strip the 16-byte prefix to match.

  private val IvLen = 16

  /** Spark's `base64` can emit RFC-2045 chunked output (a newline every 76
    * chars) depending on `spark.sql.legacy.chunkBase64String.enabled`; the
    * reference's commons-codec `encodeBase64String` never chunks
    * (Encryptor.java:22). Normalize unconditionally so parity doesn't
    * depend on session conf.
    */
  private def base64NoWrap(c: Column): Column =
    translate(base64(c), "\r\n", "")

  /** Base64(AES-128-CBC-PKCS5(plaintext)) under an explicit key/IV —
    * identical bytes to Encryptor.encrypt (Encryptor.java:15-28).
    */
  def encryptStanza(plain: Column, key: String, iv: String): Column = {
    val full = aes_encrypt(
      plain.cast("binary"),
      lit(key.getBytes("UTF-8")), lit("CBC"), lit("PKCS"),
      lit(iv.getBytes("UTF-8")))
    base64NoWrap(substring(full, IvLen + 1, Int.MaxValue))
  }

  /** Inverse of [[encryptStanza]] (Encryptor.java:30-43): Base64 in,
    * UTF-8 string out. Spark expects IV ++ ciphertext, so we re-prepend.
    */
  def decryptStanza(enc: Column, key: String, iv: String): Column = {
    val full = concat(lit(iv.getBytes("UTF-8")), unbase64(enc))
    aes_decrypt(full, lit(key.getBytes("UTF-8")), lit("CBC"), lit("PKCS"))
      .cast("string")
  }

  /** Lenient variant: null (instead of error) on undecryptable input,
    * mirroring Encryptor's catch-all → null (Encryptor.java:23-27).
    */
  def tryDecryptStanza(enc: Column, key: String, iv: String): Column = {
    val full = concat(lit(iv.getBytes("UTF-8")), unbase64(enc))
    try_aes_decrypt(full, lit(key.getBytes("UTF-8")), lit("CBC"), lit("PKCS"))
      .cast("string")
  }

  // --- message-type taxonomy (MessageType.java:6-24) --------------------

  private def mapLit(m: Map[String, String]): Column =
    map(m.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)

  /** code → canonical name ("T" → "TEXT"); null for unknown codes. */
  def classifyType(code: Column): Column =
    element_at(mapLit(MessageTypes.codeToName), code)

  /** name → code ("PHOTO" → "P"). */
  def typeCode(name: Column): Column =
    element_at(mapLit(MessageTypes.nameToCode), name)

  // --- XMPP stanza parsing (XmppPacketReader.java:308-435) --------------

  /** Default stanza projection schema: the common XMPP message shape.
    * Namespace suppression (XmppPacketReader.java:373-378) is modeled by
    * simply not projecting xmlns attributes.
    */
  val stanzaSchema: String =
    "_to STRING, _from STRING, _type STRING, _id STRING, body STRING, subject STRING"

  /** Parse a stanza XML string into a struct column (SURVEY.md §2.5 M1;
    * replaces the reference's 890-LoC pull-parser with Spark's from_xml).
    */
  def parseStanza(stanza: Column): Column =
    from_xml(stanza, lit(stanzaSchema))

  /** The reference's tolerant char policy (MXParser.java:378-382) widened
    * the legal XML range to 0x20–0xFFFD to admit emoji; as a column-level
    * validator we flag strings containing chars outside that policy
    * (plus tab/CR/LF which XML always allows).
    */
  def hasIllegalXmlChars(s: Column): Column =
    s.rlike("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\uFFFE\\uFFFF]")
}
