package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level mixture diagnostics for training-data curation: how
  * diverse is each source's text, and how far does each source's token
  * distribution sit from the corpus mixture? These are the signals a
  * data-mixing loop (DoReMi-style reweighting, RefinedWeb-style source
  * triage) reads before deciding sampling rates. The reference engine
  * has no analytics surface at all (SURVEY §2.9 absence table); both
  * operators are pure Spark aggregations.
  *
  * Scale shape: one tokenize pass feeds everything; grams shuffle once
  * as (group, gram) partial counts (map-side combine), never documents.
  * Exact `countDistinct` keeps the oracle exact at test SFs; at
  * 100 TB swap in `approx_count_distinct` (HLL, fixed-size state) —
  * the query shape is otherwise unchanged.
  */
object MixtureStats {

  private def toks(df: DataFrame, text: String): DataFrame =
    df.withColumn("__t", split(trim(col(text)), "\\s+"))

  /** Per-group n-gram diversity: distinct/total unigrams and bigrams
    * plus the distinct ratios (a corpus-level repetition signal —
    * distinct-n-gram ratios are the standard templated-text detector,
    * complementing the per-document `text_repetition` view). One
    * explode per n-gram order; both aggregate map-side before the
    * single shuffle on the group key.
    */
  def ngramDiversity(df: DataFrame, text: String, group: String): DataFrame = {
    val t = toks(df, text)
    val uni = t.select(col(group), explode(col("__t")).as("g"))
      .groupBy(group)
      .agg(count(lit(1)).as("n_tokens"),
        countDistinct(col("g")).as("distinct_tokens"))
    val bi = t.filter(size(col("__t")) >= 2)
      .select(col(group), explode(expr(
        "transform(sequence(0, size(__t) - 2), i -> concat(__t[i], ' ', __t[i + 1]))")).as("g"))
      .groupBy(group)
      .agg(count(lit(1)).as("n_bigrams"),
        countDistinct(col("g")).as("distinct_bigrams"))
    uni.join(bi, Seq(group))
      .select(col(group), col("n_tokens"), col("distinct_tokens"),
        round(col("distinct_tokens") / col("n_tokens"), 6).as("uni_diversity"),
        col("n_bigrams"), col("distinct_bigrams"),
        round(col("distinct_bigrams") / col("n_bigrams"), 6).as("bi_diversity"))
      .orderBy(group)
  }

  /** Per-group KL divergence KL(p_group ‖ p_corpus) over unigram
    * distributions, in nats — the distance-from-the-mixture signal
    * data-reweighting reads. The plan is deliberately LINEAR: term
    * counts aggregate per (group, term) once (map-side combine — the
    * only corpus pass), and all three marginals (group total, corpus
    * term total, grand total) come from window sums chained over that
    * counts table, so no self-join ever re-derives the tokenize
    * subtree (a marginals-as-joins form scanned the corpus up to four
    * times when exchange reuse missed). Every post-explode shuffle —
    * including the single-partition grand-total window — carries
    * (term, count) pairs, bounded by vocabulary, not corpus size. The
    * double sum is order-dependent only below the rounding decimals
    * (|terms| · ulp ≪ 1e-6).
    */
  def klFromMixture(df: DataFrame, text: String, group: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = toks(df, text)
      .select(col(group), explode(col("__t")).as("g"))
      .groupBy(group, "g").agg(count(lit(1)).as("c"))
    counts
      .withColumn("gt", sum("c").over(Window.partitionBy(group)))
      .withColumn("cc", sum("c").over(Window.partitionBy("g")))
      .withColumn("ct", sum("c").over(Window.partitionBy()))
      .withColumn("term_kl",
        (col("c") / col("gt")) *
          log((col("c") / col("gt")) / (col("cc") / col("ct"))))
      .groupBy(group)
      .agg(max("gt").cast("long").as("n_tokens"),
        round(sum("term_kl"), 6).as("kl_nats"))
      .orderBy(group)
  }
}
