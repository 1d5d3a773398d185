package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `xml_text(xml, tag)` → the character content of the first `<tag>`
  * element, resolved the way the reference's pull parser resolves text
  * events before the DOM sees them
  * (`MXParser.java:207-247` — entity references merged into the text
  * buffer; `XmppPacketReader.java:319-355` — TEXT/CDATA/ENTITY_REF
  * events appended, COMMENT routed away from text):
  *
  *  - CDATA sections contribute verbatim (no entity decoding inside);
  *  - the five predefined entities and numeric character references
  *    (`&#dd;` / `&#xhh;`, incl. beyond the BMP: `&#x1F600;` → 😀)
  *    decode to their code points;
  *  - comments and processing instructions are skipped;
  *  - descendant elements' text concatenates in document order
  *    (XPath `string()` semantics), with same-name nesting tracked by
  *    depth;
  *  - attribute values may contain `>` (tag ends are scanned
  *    quote-aware).
  *
  * Error semantics mirror the reference parser's throw-on-malformed
  * (`MXParser.java:218-226`: unresolvable entity → exception): an
  * unknown entity, an out-of-range/garbled character reference, or an
  * unterminated construct yields NULL — the dead-letter contract every
  * other decode step here uses — never a silently truncated string.
  * A missing or self-closing-only `tag` also yields NULL (no text
  * event ever fired), distinguishing "absent" from "empty element",
  * which yields the empty string.
  */
case class XmlTextExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"xml_text expects (string, string), got (${a.sql}, ${b.sql})")
    }

  override def nullSafeEval(xmlAny: Any, tagAny: Any): Any = {
    val out = XmlTextExpr.extract(xmlAny.toString, tagAny.toString)
    if (out == null) null else UTF8String.fromString(out)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): XmlTextExpr =
    copy(left = l, right = r)

  override def prettyName: String = "xml_text"
}

object XmlTextExpr {

  private def isNameChar(c: Char): Boolean =
    Character.isLetterOrDigit(c) || c == '-' || c == '_' || c == ':' || c == '.'

  /** XML names may not start with a digit/dot/dash; a `<` followed by
    * anything that can't open a name is the reference parser's
    * "unexpected character in markup" throw (MXParser.java:202-204).
    */
  private def isNameStart(c: Char): Boolean =
    Character.isLetter(c) || c == '_' || c == ':'

  /** Quote-aware scan for the `>` ending a tag opened at `lt`. -1 when
    * unterminated.
    */
  private def tagEnd(xml: String, lt: Int): Int = {
    var k = lt + 1
    var quote = 0.toChar
    val n = xml.length
    while (k < n && (quote != 0 || xml.charAt(k) != '>')) {
      val c = xml.charAt(k)
      if (quote == 0 && (c == '"' || c == '\'')) quote = c
      else if (quote != 0 && c == quote) quote = 0
      k += 1
    }
    if (k >= n) -1 else k
  }

  /** Decode one entity reference starting at `amp` (pointing at `&`).
    * Returns (replacement, indexAfterSemicolon), or null on anything
    * the reference parser would throw on.
    */
  private def entity(xml: String, amp: Int): (String, Int) = {
    val semi = xml.indexOf(';', amp)
    // 32 bounds the scan after a stray '&' while admitting spec-valid
    // leading-zero character references (&#00065; is legal CharRef);
    // an over-long digit string still nulls via NumberFormatException
    if (semi < 0 || semi - amp > 32) return null
    val name = xml.substring(amp + 1, semi)
    val rep: String = name match {
      case "amp" => "&"
      case "lt" => "<"
      case "gt" => ">"
      case "apos" => "'"
      case "quot" => "\""
      case _ if name.length > 1 && name.charAt(0) == '#' =>
        try {
          val cp =
            if (name.length > 2 && (name.charAt(1) == 'x' || name.charAt(1) == 'X'))
              Integer.parseInt(name.substring(2), 16)
            else Integer.parseInt(name.substring(1))
          new String(Character.toChars(cp))
        } catch { case _: Exception => null }
      case _ => null
    }
    if (rep == null) null else (rep, semi + 1)
  }

  /** The scan itself; shared with the spec's golden vectors. */
  def extract(xml: String, tag: String): String = {
    val n = xml.length
    var i = 0
    var depth = 0
    var found = false
    val sb = new java.lang.StringBuilder
    while (i < n) {
      val c = xml.charAt(i)
      if (c == '<') {
        if (xml.startsWith("<!--", i)) {
          val e = xml.indexOf("-->", i + 4)
          if (e < 0) return null
          i = e + 3
        } else if (xml.startsWith("<![CDATA[", i)) {
          val e = xml.indexOf("]]>", i + 9)
          if (e < 0) return null
          if (depth > 0) sb.append(xml, i + 9, e)
          i = e + 3
        } else if (xml.startsWith("<?", i)) {
          val e = xml.indexOf("?>", i + 2)
          if (e < 0) return null
          i = e + 2
        } else if (xml.startsWith("</", i)) {
          val e = xml.indexOf('>', i)
          if (e < 0) return null
          val name = xml.substring(i + 2, e).trim
          if (depth > 0 && name == tag) {
            depth -= 1
            if (depth == 0) return sb.toString
          }
          i = e + 1
        } else {
          // a '<' that opens nothing nameable is character data gone
          // wrong — the reference parser throws; we dead-letter NULL
          // rather than consuming a fake tag and truncating silently
          if (i + 1 >= n || !isNameStart(xml.charAt(i + 1))) return null
          val e = tagEnd(xml, i)
          if (e < 0) return null
          var j = i + 1
          while (j < e && isNameChar(xml.charAt(j))) j += 1
          val name = xml.substring(i + 1, j)
          val selfClosing = xml.charAt(e - 1) == '/'
          if (name == tag && !selfClosing) {
            if (!found) { found = true; depth = 1 }
            else if (depth > 0) depth += 1
          }
          i = e + 1
        }
      } else if (c == '&') {
        entity(xml, i) match {
          case null => return null
          case (rep, next) =>
            if (depth > 0) sb.append(rep)
            i = next
        }
      } else {
        if (depth > 0) sb.append(c)
        i += 1
      }
    }
    // ran off the end: either the element never closed (malformed) or
    // it never opened (absent) — both NULL
    null
  }
}

object XmlText {
  def apply(xml: Column, tag: Column): Column =
    bridge.column(XmlTextExpr(bridge.expression(xml), bridge.expression(tag)))
}
