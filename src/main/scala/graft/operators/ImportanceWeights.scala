package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection via importance resampling (Xie et al.,
  * "Data Selection for Language Models via Importance Resampling",
  * NeurIPS 2023): score every raw document by how much more likely its
  * hashed-unigram features are under a TARGET distribution than under
  * the RAW corpus distribution, then keep the documents the target
  * would up-weight.
  *
  * Scale shape (100 TB): the learned state is ONE table of `buckets`
  * rows (default 512) — two token-count aggregations over 8-byte
  * bucket ids build it, and scoring is a broadcast join of that tiny
  * table against exploded tokens followed by a per-doc sum. Documents
  * never shuffle; only (doc_id, bucket) pairs do, and the map-side
  * combine collapses those to (doc_id × distinct-buckets) rows.
  *
  * Cross-engine determinism (the DuckDB oracle replays every step):
  * - the bucket hash is the first 6 hex chars of md5 — identical
  *   strings on both engines — parsed base-16 and reduced mod B;
  * - per-bucket log10 ratios are computed from exact integer counts in
  *   one pinned double-op sequence, then ROUNDED to 9 decimals and
  *   summed as DECIMAL(18,9) (the [[TextAnalysis.lmScore]] move): the
  *   per-doc score is bit-stable at any parallelism and row order.
  */
object ImportanceWeights {

  val DefaultBuckets = 512

  /** Hashed-unigram feature bucket: md5 → first 6 hex → mod B.
    * (DuckDB: `CAST(('0x' || substr(md5(t),1,6)) AS BIGINT) % B`.)
    */
  def bucket(term: Column, buckets: Int = DefaultBuckets): Column =
    pmod(conv(substring(md5(term), 1, 6), 16, 10).cast("long"), lit(buckets))

  /** The learned importance table: one row per feature bucket with the
    * rounded log10 likelihood ratio between the target and raw unigram
    * distributions (add-one smoothed). `targetPred` marks the target
    * slice of `docs`; the raw distribution is the whole corpus, so every
    * bucket that can appear at scoring time has a row here.
    */
  def bucketRatios(docs: DataFrame, textCol: String, targetPred: Column,
                   buckets: Int = DefaultBuckets): DataFrame = {
    val b = buckets
    val toks = docs
      .select(targetPred.as("is_target"),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .select(col("is_target"), bucket(col("term"), b).as("b"))
    val counts = toks.groupBy("b").agg(
      sum(when(col("is_target"), 1L).otherwise(0L)).as("ct"),
      count(lit(1)).as("cr"))
    val totals = counts.agg(sum(col("ct")).as("nt"), sum(col("cr")).as("nr"))
    // pinned op sequence — mirrored verbatim in the oracle SQL:
    // round(log10( ((ct+1)/(nt+B)) / ((cr+1)/(nr+B)) ), 9)
    counts.join(broadcast(totals))
      .select(col("b"),
        round(log10(
          ((col("ct") + lit(1)).cast("double") /
            (col("nt") + lit(b)).cast("double")) /
          ((col("cr") + lit(1)).cast("double") /
            (col("nr") + lit(b)).cast("double"))), 9)
          .cast("decimal(18,9)").as("r"))
  }

  /** Per-document exact score: (id, n_tokens, score_dec DECIMAL) — the
    * decimal form downstream aggregations sum exactly (a double here
    * would make any per-source rollup shuffle-order-dependent).
    */
  def scoreDocsExact(docs: DataFrame, textCol: String, idCol: String,
                     ratios: DataFrame, buckets: Int = DefaultBuckets): DataFrame =
    docs
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .select(col(idCol), bucket(col("term"), buckets).as("b"))
      .join(broadcast(ratios), "b")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"), sum(col("r")).as("score_dec"))

  /** Per-document DSIR score: the decimal-exact sum of its tokens'
    * bucket log-ratios, plus the keep decision (score > 0 ⇔ the doc
    * looks more like the target than like the average raw doc).
    * Emits one row per doc of `docs` that has at least one token —
    * after `trim`+split every string has one, so that is every row.
    */
  def scoreDocs(docs: DataFrame, textCol: String, idCol: String,
                ratios: DataFrame, buckets: Int = DefaultBuckets): DataFrame =
    scoreDocsExact(docs, textCol, idCol, ratios, buckets)
      .select(col(idCol), col("n_tokens"),
        col("score_dec").cast("double").as("dsir_score"),
        (col("score_dec") > lit(BigDecimal(0)).cast("decimal(18,9)")).as("kept"))

  /** End-to-end: learn ratios from `targetPred`, score, return per-doc
    * rows. The two passes share nothing but the broadcast ratio table.
    */
  def dsir(docs: DataFrame, textCol: String, idCol: String,
           targetPred: Column, buckets: Int = DefaultBuckets): DataFrame =
    scoreDocs(docs, textCol, idCol,
      bucketRatios(docs, textCol, targetPred, buckets), buckets)
}
