package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.MessageFunctions._
import graft.pipeline.{Enrich, GraftConfig}
import graft.sources.Tables

/** Reference-domain queries (SURVEY.md §2.1-§2.6) over the `events`
  * stand-in stream (FIXTURES.md §2 column mapping).
  *
  * Every oracle-checked query is pure built-in Catalyst; crypto/avro
  * paths are covered by rows-only checks plus unit/property tests.
  */
object MessageQueries {

  /** event_type → MessageType code (X8 demo dimension; the events table
    * has no native codes, so this CASE is the declared mapping).
    */
  private def eventCode(c: org.apache.spark.sql.Column) =
    when(c === "purchase", "T")
      .when(c === "view", "P")
      .when(c === "signup", "R")
      .when(c === "click", "B")
      .when(c === "error", "MC")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P1+X4+X5+X6: the whole hot path minus crypto, oracle-checkable
    "msg_enrich" -> ((s, d) =>
      Enrich.plain(Tables.messages(s, d)).orderBy("message_id")),

    // A1: summary distinct set
    "msg_summary" -> ((s, d) =>
      Enrich.summary(Enrich.plain(Tables.messages(s, d)))
        .orderBy("username", "jid", "first_date_partition")),

    // the reference's raison d'être: one user's history in one month
    // bucket (partition-pruned when the table is written partitioned)
    "msg_history_month" -> ((s, d) =>
      Enrich.plain(Tables.messages(s, d))
        .filter(col("date_partition") === "202401M" && col("username") === "user13")
        .orderBy("message_id")),

    // X8: taxonomy lookup through the MessageTypes dictionary
    "msg_classify" -> ((s, d) => {
      val ev = Tables.events(s, d)
      ev.withColumn("code", eventCode(col("event_type")))
        .withColumn("type_name", classifyType(col("code")))
        .groupBy("event_type", "code", "type_name")
        .agg(count(lit(1)).as("n"))
        .orderBy("event_type")
    }),

    // conversation history: per (user, peer) ordered timeline with
    // position and inter-message gap — the window-function form of the
    // reference's read-side use case (SURVEY §2.9 "conversation-history
    // queries")
    "msg_conversation" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("username", "jid")
        .orderBy("sentTime", "msgId")
      Tables.messages(s, d)
        .withColumn("seq", row_number().over(w))
        .withColumn("gap_ms", col("sentTime") - lag("sentTime", 1).over(w))
        .select("username", "jid", "seq", "msgId", "gap_ms")
        .orderBy("username", "jid", "seq")}),

    // M1: stanza synthesis + from_xml projection back to columns (the
    // reference's XMPP parse capability on the oracle-checked surface)
    "msg_stanza_parse" -> ((s, d) => {
      val stanza = concat(
        lit("""<message xmlns="jabber:client" to=""""), col("jid"),
        lit("""" id=""""), col("msgId"), lit(""""><body>"""),
        col("stanza"), lit("</body></message>"))
      Tables.messages(s, d)
        .withColumn("xml", stanza)
        .withColumn("p", parseStanza(col("xml")))
        .select(col("msgId").as("message_id"),
          col("p._to").as("to_jid"), col("p._id").as("xml_id"),
          col("p.body").as("body"))
        .orderBy("message_id")}),

    // X1+F1: full enrich incl. AES — rows-only check (crypto not
    // expressible in the oracle; golden vectors cover it)
    "msg_pipeline_encrypted" -> ((s, d) =>
      Enrich(Tables.messages(s, d), GraftConfig.dev).orderBy("message_id")),

    // M2: the reference's tolerant char policy (MXParser.java:371-387
    // widened legal XML to 0x20–0xFFFD + tab/CR/LF to admit emoji) as an
    // oracle-checked validator. The synthetic payloads are clean, so the
    // probe chars are injected in-query from the message id — both
    // engines build the identical strings (same move as text_scrub):
    // BEL/VT/U+FFFF violate the policy; tab and 😀 (the emoji case the
    // reference's widening exists for) are admitted.
    "msg_xml_policy" -> ((s, d) => {
      val idNum = substring(col("msgId"), 2, 18).cast("long")
      val probe = pmod(idNum, lit(6))
      val injected = concat(col("stanza"),
        when(probe === 0, lit("\u0007"))
          .when(probe === 1, lit("\u000b"))
          .when(probe === 2, lit("\uffff"))
          .when(probe === 3, lit("\t"))
          .when(probe === 4, lit("😀"))
          .otherwise(lit("")))
      Tables.messages(s, d)
        .select(col("msgId").as("message_id"),
          hasIllegalXmlChars(injected).as("illegal"))
        .orderBy("message_id")}),

    // M1+: the reference pull parser's TEXT-event resolution
    // (MXParser.java:207-247, XmppPacketReader.java:319-355) as a
    // differential oracle: CDATA verbatim, predefined entities, numeric
    // char refs (incl. beyond-BMP), comment/PI skipping, descendant
    // text concatenation, quote-aware attributes. Edge constructs are
    // injected in-query from the message id (the msg_xml_policy move),
    // the general xml_text scanner extracts, and the oracle computes
    // each case's EXPECTED string independently with plain string
    // functions — spec vs implementation, not replay vs replay
    "msg_xml_extract" -> ((s, d) => {
      val idNum = substring(col("msgId"), 2, 18).cast("long")
      val probe = pmod(idNum, lit(6))
      val body =
        when(probe === 0, concat(lit("<![CDATA[<raw & "), col("msgId"), lit("]]>")))
          .when(probe === 1, lit("A &amp; B &lt;x&gt; &apos;q&quot;"))
          .when(probe === 2, concat(lit("&#65;&#x42;&#x1F600;"), col("msgId")))
          .when(probe === 3, concat(lit("x<!-- c -->y<?pi d?>"), col("msgId")))
          .when(probe === 4, concat(lit("<i>in<b>ner</b></i>"), col("msgId")))
          .otherwise(col("msgId"))
      val xml = concat(lit("""<message note="a>b" to=""""), col("jid"),
        lit(""""><body>"""), body, lit("</body></message>"))
      Tables.messages(s, d)
        .select(col("msgId").as("message_id"),
          graft.plans.XmlText(xml, lit("body")).as("body_text"))
        .orderBy("message_id")}),

    // X2 round-trip: decrypt(encrypt(stanza)) == stanza, as a query the
    // oracle CAN check (it must equal the plaintext projection)
    "msg_roundtrip" -> ((s, d) => {
      val cfg = GraftConfig.dev
      Enrich(Tables.messages(s, d), cfg)
        .select(col("message_id"),
          decryptStanza(col("stanza"), cfg.encryptionKey, cfg.initVector).as("stanza"))
        .orderBy("message_id")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "msg_enrich" ->
      """SELECT 'm'||event_id AS message_id,
        |       'user'||user_id AS username,
        |       event_type||'@chat.example' AS jid,
        |       strftime(ts,'%Y%m')||'M' AS date_partition,
        |       make_timestamp((epoch_us(ts)//1000)*1000) AS sent_time,
        |       props AS stanza
        |FROM events ORDER BY message_id""".stripMargin,
    "msg_summary" ->
      """SELECT DISTINCT 'user'||user_id AS username,
        |       event_type||'@chat.example' AS jid,
        |       strftime(ts,'%Y%m')||'M' AS first_date_partition
        |FROM events ORDER BY username, jid, first_date_partition""".stripMargin,
    "msg_history_month" ->
      """SELECT 'm'||event_id AS message_id,
        |       'user'||user_id AS username,
        |       event_type||'@chat.example' AS jid,
        |       strftime(ts,'%Y%m')||'M' AS date_partition,
        |       make_timestamp((epoch_us(ts)//1000)*1000) AS sent_time,
        |       props AS stanza
        |FROM events
        |WHERE strftime(ts,'%Y%m')||'M' = '202401M' AND 'user'||user_id = 'user13'
        |ORDER BY message_id""".stripMargin,
    "msg_classify" ->
      """SELECT event_type,
        |       CASE event_type WHEN 'purchase' THEN 'T' WHEN 'view' THEN 'P'
        |            WHEN 'signup' THEN 'R' WHEN 'click' THEN 'B'
        |            WHEN 'error' THEN 'MC' END AS code,
        |       CASE event_type WHEN 'purchase' THEN 'TEXT' WHEN 'view' THEN 'PHOTO'
        |            WHEN 'signup' THEN 'REGISTER' WHEN 'click' THEN 'BUZZ'
        |            WHEN 'error' THEN 'MISSED_CALL' END AS type_name,
        |       count(*) AS n
        |FROM events GROUP BY 1,2,3 ORDER BY event_type""".stripMargin,
    "msg_roundtrip" ->
      """SELECT 'm'||event_id AS message_id, props AS stanza
        |FROM events ORDER BY message_id""".stripMargin,
    "msg_conversation" ->
      """WITH m AS (
        |  SELECT 'user'||user_id AS username,
        |         event_type||'@chat.example' AS jid,
        |         'm'||event_id AS msgId,
        |         epoch_us(CAST(ts AS TIMESTAMP)) // 1000 AS sentTime
        |  FROM events)
        |SELECT username, jid,
        |  row_number() OVER w AS seq, msgId,
        |  sentTime - lag(sentTime) OVER w AS gap_ms
        |FROM m
        |WINDOW w AS (PARTITION BY username, jid ORDER BY sentTime, msgId)
        |ORDER BY username, jid, seq""".stripMargin,
    "msg_xml_policy" ->
      """SELECT 'm'||event_id AS message_id,
        |  regexp_matches(props || CASE event_id % 6
        |      WHEN 0 THEN chr(7) WHEN 1 THEN chr(11) WHEN 2 THEN chr(65535)
        |      WHEN 3 THEN chr(9) WHEN 4 THEN chr(128512) ELSE '' END,
        |    '[\x00-\x08\x0B\x0C\x0E-\x1F\x{FFFE}\x{FFFF}]') AS illegal
        |FROM events ORDER BY message_id""".stripMargin,
    // each probe case's EXPECTED extraction, written out directly from
    // the XML spec (not by re-running a parser): what CDATA wraps, what
    // the entities denote, what survives comment/PI removal
    "msg_xml_extract" ->
      """SELECT 'm'||event_id AS message_id,
        |  CASE event_id % 6
        |    WHEN 0 THEN '<raw & ' || 'm'||event_id
        |    WHEN 1 THEN 'A & B <x> ''q"'
        |    WHEN 2 THEN 'AB' || chr(128512) || 'm'||event_id
        |    WHEN 3 THEN 'xy' || 'm'||event_id
        |    WHEN 4 THEN 'inner' || 'm'||event_id
        |    ELSE 'm'||event_id END AS body_text
        |FROM events ORDER BY message_id""".stripMargin,
    // from_xml must recover exactly what was embedded (no XML-special
    // chars exist in the synthetic payloads)
    "msg_stanza_parse" ->
      """SELECT 'm'||event_id AS message_id,
        |       event_type||'@chat.example' AS to_jid,
        |       'm'||event_id AS xml_id,
        |       props AS body
        |FROM events ORDER BY message_id""".stripMargin
  )
}
