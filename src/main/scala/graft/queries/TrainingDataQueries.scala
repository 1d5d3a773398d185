package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Bpe, ImportanceWeights}
import graft.sources.Tables

/** Round-8 training-data-pipeline operators over `documents`:
  * DSIR-style importance weighting (every arithmetic step replayed by
  * the DuckDB oracle) and distributed BPE vocabulary learning (pair
  * counting oracle-checked; the iterative merge loop SQL-inexpressible,
  * covered by a must-be-empty round-trip violation set + BpeSpec
  * ground truth).
  */
object TrainingDataQueries {

  private val B = ImportanceWeights.DefaultBuckets // 512

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // DSIR importance score per document, target = English slice. Every
    // step — md5 bucket, smoothed log10 ratio rounded to 9 decimals,
    // decimal sum, keep flag — is bit-replayed by the oracle.
    "text_dsir_score" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      ImportanceWeights.dsir(docs, "text", "doc_id", col("lang") === "en", B)
        .orderBy("doc_id")}),

    // the resampling view: per-source keep census + mean score — what a
    // pipeline operator actually acts on when re-weighting a mixture.
    // Sums stay decimal until the one double divide (order-independent).
    "pipe_dsir_sample" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val scored = ImportanceWeights.scoreDocsExact(docs, "text", "doc_id",
        ImportanceWeights.bucketRatios(docs, "text", col("lang") === "en", B), B)
      scored.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("score_dec") > lit(BigDecimal(0)).cast("decimal(18,9)"),
            1L).otherwise(0L)).as("n_kept"),
          round(sum(col("score_dec")).cast("double") / count(lit(1)), 6)
            .as("mean_score"))
        .orderBy("source")}),

    // BPE merge #1: the most frequent adjacent character pair over the
    // word histogram — the pair-counting machinery the whole learner
    // iterates, hash-checked against a plain-SQL replay
    "text_bpe_top_pair" -> ((s, d) =>
      Bpe.topPair(Bpe.wordHistogram(Tables.documents(s, d), "text"))),

    // ORACLE COMPANION for the BPE tokenizer: word types where encoding
    // with 48 learned merges does not concatenate back to the original
    // word. Must be EMPTY — any merge-application or encode-ordering
    // bug surfaces a row and the oracle (1=0) goes red
    "text_bpe_roundtrip" -> ((s, d) => {
      val hist = Bpe.wordHistogram(Tables.documents(s, d), "text")
      val merges = Bpe.learnMerges(hist, nMerges = 48)
      Bpe.encodeTypes(hist, merges)
        .select(col("word"), concat_ws("", col("pieces")).as("joined"))
        .filter(col("joined") =!= col("word"))
        .orderBy("word")}),

    // per-source subword statistics under the learned vocabulary: the
    // "how many training tokens is this corpus" question. Word types
    // are encoded ONCE and joined back — documents are never
    // re-encoded per occurrence (rows-only: the merge loop is not
    // SQL-expressible; the round-trip companion + BpeSpec carry it)
    "text_bpe_tokenize" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val hist = Bpe.wordHistogram(docs, "text")
      val merges = Bpe.learnMerges(hist, nMerges = 48)
      val types = Bpe.encodeTypes(hist, merges).select("word", "n_pieces")
      docs.select(col("source"),
          explode(graft.operators.TextAnalysis.tokens(col("text"))).as("word"))
        .filter(length(col("word")) > 0)
        .join(types, "word")
        .groupBy("source")
        .agg(count(lit(1)).as("n_words"),
          sum(col("n_pieces")).as("n_subwords"),
          round(sum(col("n_pieces")).cast("double") / count(lit(1)), 6)
            .as("pieces_per_word"))
        .orderBy("source")})
  )

  def oracleSql: Map[String, String] = {
    // the shared DSIR pipeline, replayed step for step (same op order)
    val dsirCtes =
      s"""WITH toks AS (
         |  SELECT doc_id, lang,
         |    unnest(string_split_regex(trim(text), '\\s+')) AS term
         |  FROM documents),
         |bt AS (
         |  SELECT doc_id, lang,
         |    CAST(('0x' || substr(md5(term), 1, 6)) AS BIGINT) % $B AS b
         |  FROM toks),
         |counts AS (
         |  SELECT b,
         |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ct,
         |    CAST(count(*) AS BIGINT) AS cr
         |  FROM bt GROUP BY b),
         |tot AS (
         |  SELECT CAST(sum(ct) AS BIGINT) AS nt,
         |         CAST(sum(cr) AS BIGINT) AS nr FROM counts),
         |ratios AS (
         |  SELECT b,
         |    CAST(round(log10(
         |      (CAST(ct + 1 AS DOUBLE) / CAST(nt + $B AS DOUBLE)) /
         |      (CAST(cr + 1 AS DOUBLE) / CAST(nr + $B AS DOUBLE))), 9)
         |      AS DECIMAL(18,9)) AS r
         |  FROM counts, tot),
         |scored AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens, sum(r) AS s
         |  FROM bt JOIN ratios USING (b) GROUP BY doc_id)""".stripMargin
    Map(
      "text_dsir_score" ->
        s"""$dsirCtes
           |SELECT doc_id, n_tokens, CAST(s AS DOUBLE) AS dsir_score,
           |       s > 0 AS kept
           |FROM scored ORDER BY doc_id""".stripMargin,
      "pipe_dsir_sample" ->
        s"""$dsirCtes
           |SELECT source, count(*) AS n_docs,
           |  CAST(sum(CASE WHEN s > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           |  round(CAST(sum(s) AS DOUBLE) / count(*), 6) AS mean_score
           |FROM scored JOIN documents USING (doc_id)
           |GROUP BY source ORDER BY source""".stripMargin,
      "text_bpe_top_pair" ->
        """WITH words AS (
          |  SELECT term AS word, CAST(count(*) AS BIGINT) AS cnt
          |  FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS term
          |        FROM documents)
          |  WHERE len(term) > 0 GROUP BY term),
          |chars AS (SELECT string_split(word, '') AS c, cnt FROM words),
          |pairs AS (
          |  SELECT unnest([struct_pack(l := c[i], r := c[i+1])
          |                 FOR i IN range(1, len(c))]) AS p, cnt
          |  FROM chars WHERE len(c) >= 2)
          |SELECT p.l AS left_sym, p.r AS right_sym,
          |       CAST(sum(cnt) AS BIGINT) AS pair_count
          |FROM pairs GROUP BY 1, 2
          |ORDER BY pair_count DESC, left_sym, right_sym LIMIT 1""".stripMargin,
      "text_bpe_roundtrip" ->
        """SELECT CAST(NULL AS VARCHAR) AS joined, CAST(NULL AS VARCHAR) AS word
          |WHERE 1 = 0""".stripMargin
    )
  }
}
