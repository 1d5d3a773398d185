package graft.plans

import java.math.RoundingMode
import java.util.Locale
import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `text_features(text)` → struct of every per-row quality signal the
  * corpus pipeline needs, computed in ONE pass over the string:
  *
  *   - n_tokens     = size(split(trim(text), "\\s+"))
  *   - n_punct      = regexp_count(text, "[^A-Za-z0-9_\\s]")
  *   - n_stopwords  = tokens exactly in [[graft.operators.TextAnalysis.stopwords]]
  *   - n_chars      = length(text)   (code points)
  *   - n_nonws      = length(regexp_replace(trim(text), "\\s+", ""))
  *   - n_markers    = tokens whose lowercase is in `markers` (langScore)
  *   - quality      = the composite [[graft.operators.TextAnalysis.qualityScore]]
  *
  * Each field is BIT-IDENTICAL to the Column-API form it names (specs
  * cross-check): same trim-then-`\s+` tokenization as [[TextHash]], code
  * points counted the way `length`/`ascii` do, and `quality` assembled
  * with the exact double-op order of the Column expression, rounded via
  * BigDecimal HALF_UP like Spark's `round`.
  *
  * Why it exists: Catalyst has no let-binding — `qualityScore(text)`
  * referenced in a filter and two aggregates re-evaluates its whole
  * regex/HOF tree per reference (the round-3 `pipe_clean_corpus` cost).
  * This expression makes each reference a single string traversal, and
  * the Generate-barrier binding in `TextAnalysis.withFeatures` drops
  * that to one traversal per ROW. At 100 TB the feature stage is a
  * narrow, scan-colocated projection either way — this is constant-
  * factor work, not a plan-shape change.
  */
case class TextFeaturesExpr(
    child: Expression, stopwords: Seq[String], markers: Seq[String])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = TextFeaturesExpr.schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"text_features expects a string column, got ${t.sql}")
  }

  @transient private lazy val stopSet: Set[String] = stopwords.toSet
  @transient private lazy val markerSet: Set[String] = markers.toSet

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val s = u.toString
    // one code-point scan of the ORIGINAL text: length + punct class
    // ([^A-Za-z0-9_\s] with Java's ASCII \s, one match per code point)
    var nChars = 0
    var nPunct = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      nChars += 1
      val word = (cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') ||
        (cp >= '0' && cp <= '9') || cp == '_'
      val ws = cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0b ||
        cp == '\f' || cp == '\r'
      if (!word && !ws) nPunct += 1
      i += Character.charCount(cp)
    }
    // trim strips ASCII spaces only (UTF8String.trim parity); Pattern
    // .split(_, -1) keeps leading/trailing empty tokens like Spark split
    val toks = TextFeaturesExpr.Ws.split(u.trim().toString, -1)
    val nTokens = toks.length
    var nStop = 0
    var nMark = 0
    var nNonWs = 0
    var j = 0
    while (j < nTokens) {
      val t = toks(j)
      nNonWs += t.codePointCount(0, t.length)
      if (stopSet.contains(t)) nStop += 1
      if (markerSet.nonEmpty &&
        markerSet.contains(t.toLowerCase(Locale.ROOT))) nMark += 1
      j += 1
    }
    // qualityScore parity: identical operand order so every double op
    // reproduces the Column form bit for bit
    val lenScore = math.min(nTokens.toDouble / 64.0, 1.0)
    val punctPenalty =
      math.min(nPunct.toDouble / math.max(nChars, 1).toDouble * 4.0, 1.0)
    val swScore =
      math.min(nStop.toDouble / math.max(nTokens, 1).toDouble * 5.0, 1.0)
    val quality = java.math.BigDecimal
      .valueOf(lenScore * 0.5 + (1.0 - punctPenalty) * 0.25 + swScore * 0.25)
      .setScale(6, RoundingMode.HALF_UP).doubleValue()
    new GenericInternalRow(Array[Any](
      nTokens, nPunct, nStop, nChars, nNonWs, nMark, quality))
  }

  override protected def withNewChildInternal(newChild: Expression): TextFeaturesExpr =
    copy(child = newChild)

  override def prettyName: String = "text_features"
}

object TextFeaturesExpr {
  private val Ws = Pattern.compile("\\s+")

  val schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_stopwords", IntegerType, nullable = false),
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_nonws", IntegerType, nullable = false),
    StructField("n_markers", IntegerType, nullable = false),
    StructField("quality", DoubleType, nullable = false)))
}

object TextFeatures {
  def apply(text: Column, stopwords: Seq[String], markers: Seq[String] = Nil): Column =
    bridge.column(TextFeaturesExpr(bridge.expression(text), stopwords, markers))
}
