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
    * complementing the per-document `text_repetition` view). ONE
    * corpus pass (pinned in PlanSpec): both n-gram orders explode from
    * the same row as (order, gram) pairs, aggregate per
    * (group, order, gram) with map-side combine, and the final
    * order→column pivot runs over two rows per group. An explode per
    * order would scan and tokenize the corpus twice.
    */
  def ngramDiversity(df: DataFrame, text: String, group: String): DataFrame = {
    val grams = toks(df, text)
      .select(col(group), explode(concat(
        transform(col("__t"), x => struct(lit(1).as("n"), x.as("g"))),
        // sequence(0, -1) would DESCEND, not empty — guard short docs
        expr("""CASE WHEN size(__t) >= 2
               |  THEN transform(sequence(0, size(__t) - 2),
               |         i -> struct(2 AS n, concat(__t[i], ' ', __t[i + 1]) AS g))
               |  ELSE array() END""".stripMargin))).as("kg"))
      .select(col(group), col("kg.n").as("n"), col("kg.g").as("g"))
    val byOrder = grams.groupBy(group, "n")
      .agg(count(lit(1)).as("total"), countDistinct(col("g")).as("dist"))
    byOrder.groupBy(group)
      .agg(max(when(col("n") === 1, col("total"))).as("n_tokens"),
        max(when(col("n") === 1, col("dist"))).as("distinct_tokens"),
        max(when(col("n") === 2, col("total"))).as("n_bigrams"),
        max(when(col("n") === 2, col("dist"))).as("distinct_bigrams"))
      // inner-join parity with the two-branch form: a group whose docs
      // are all single-token has no bigram row and is dropped
      .filter(col("n_bigrams").isNotNull)
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
