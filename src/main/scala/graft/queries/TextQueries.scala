package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis._
import graft.sources.Tables

/** Text-analysis query surface over `documents` (north-star extension:
  * token counting, quality scoring, language ID, fingerprinting), each
  * with a DuckDB oracle re-expressing the same deterministic arithmetic.
  */
object TextQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "text_stats" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        tokenCount(col("text")).as("n_tokens"),
        subwordCount(col("text")).as("n_subwords"),
        round(punctRatio(col("text")), 6).as("punct_ratio"),
        round(stopwordRatio(col("text")), 6).as("stopword_ratio"),
        round(meanTokenLen(col("text")), 6).as("mean_token_len"),
        qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")),

    "text_langid" -> ((s, d) =>
      langIdAgg(Tables.documents(s, d), "text", Seq("doc_id", "lang"))
        .groupBy("lang", "lang_guess")
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "lang_guess")),

    "text_fingerprint" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")),

    // corpus-level quality report: per-source doc counts + mean quality
    "text_quality_by_source" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("q", qualityScore(col("text")))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          round(sum(col("q")) / count(lit(1)), 6).as("mean_quality"),
          sum(tokenCount(col("text"))).as("total_tokens"))
        .orderBy("source"))
  )

  private val swList = stopwords.map(s => s"'$s'").mkString("[", ", ", "]")

  private def markers(l: String) =
    langMarkers(l).map(s => s"'$s'").mkString("[", ", ", "]")

  private val statsExprs =
    s"""  len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
       |  len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]')) AS n_subwords,
       |  round(len(regexp_extract_all(text, '[^A-Za-z0-9_\\s]'))::DOUBLE
       |        / greatest(length(text), 1), 6) AS punct_ratio,
       |  round(len(list_filter(string_split_regex(trim(text), '\\s+'),
       |            t -> list_contains($swList, t)))::DOUBLE
       |        / greatest(len(string_split_regex(trim(text), '\\s+')), 1), 6) AS stopword_ratio,
       |  round(length(regexp_replace(trim(text), '\\s+', '', 'g'))::DOUBLE
       |        / greatest(len(string_split_regex(trim(text), '\\s+')), 1), 6) AS mean_token_len""".stripMargin

  private val qualityExpr =
    """round(least(len(string_split_regex(trim(text), '\s+')) / 64.0, 1.0) * 0.5
      |  + (1.0 - least(len(regexp_extract_all(text, '[^A-Za-z0-9_\s]'))::DOUBLE
      |                 / greatest(length(text), 1) * 4.0, 1.0)) * 0.25
      |  + least(len(list_filter(string_split_regex(trim(text), '\s+'),
      |              t -> list_contains(SWLIST, t)))::DOUBLE
      |          / greatest(len(string_split_regex(trim(text), '\s+')), 1) * 5.0, 1.0) * 0.25,
      |  6)""".stripMargin.replace("SWLIST", swList)

  private val langScoreExprs = langMarkers.keys.toSeq.sorted.map { l =>
    s"""len(list_filter(string_split_regex(trim(text), '\\s+'),
       |    t -> list_contains(${markers(l)}, lower(t)))) AS s_$l""".stripMargin
  }.mkString(",\n")

  def oracleSql: Map[String, String] = Map(
    "text_stats" ->
      s"""SELECT doc_id,
         |$statsExprs,
         |  $qualityExpr AS quality
         |FROM documents ORDER BY doc_id""".stripMargin,
    "text_langid" ->
      s"""WITH scored AS (
         |  SELECT lang, $langScoreExprs
         |  FROM documents
         |), best AS (
         |  SELECT lang,
         |    CASE WHEN greatest(s_de, s_en, s_es, s_fr, s_zh) = 0 THEN 'und'
         |         WHEN s_de = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'de'
         |         WHEN s_en = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'en'
         |         WHEN s_es = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'es'
         |         WHEN s_fr = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'fr'
         |         ELSE 'zh' END AS lang_guess
         |  FROM scored)
         |SELECT lang, lang_guess, count(*) AS n
         |FROM best GROUP BY lang, lang_guess ORDER BY lang, lang_guess""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce([0] || list_transform(string_split(text, ''), c -> unicode(c)::BIGINT),
        |              (a, b) -> (a * 31 + b) % 1000000007) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_quality_by_source" ->
      s"""SELECT source, count(*) AS n_docs,
         |  round(sum($qualityExpr) / count(*), 6) AS mean_quality,
         |  CAST(sum(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS total_tokens
         |FROM documents GROUP BY source ORDER BY source""".stripMargin
  )
}
