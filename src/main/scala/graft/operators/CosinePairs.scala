package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact all-pairs cosine similarity join over term-frequency vectors
  * (Bayardo/Ramakrishnan/Tumkur "Scaling Up All Pairs Similarity
  * Search", WWW'07 — the weighted-cosine sibling of the PPJoin
  * prefix-filter family in [[Dedup.ngramJaccardBlockedManaged]]).
  *
  * Documents become sparse integer tf vectors over word n-gram shingles
  * (shingles, not unigrams: the synthetic corpus has a ~31-word
  * vocabulary, so unigram vectors are dense and every pair is similar;
  * 3-gram space decorrelates unrelated documents while near-duplicates
  * keep cosine ≈ 1). All arithmetic that decides the answer is
  * integer-exact — dot products and squared norms are BIGINT sums of
  * BIGINT products — and the only floating point is the final
  * `dot / (sqrt(n2_a)·sqrt(n2_b))`, identical correctly-rounded IEEE
  * ops on identical integers in any engine, so a SQL oracle replays
  * bit-for-bit.
  *
  * Scale shape (the reason this is not a naive inverted-index
  * self-join): terms are globally ordered by (document frequency ASC,
  * term), and each document only indexes its PREFIX under that order —
  * the shortest prefix whose REMAINING suffix has L2 mass below the
  * threshold. Soundness: take a qualifying pair (cos ≥ t) and its
  * first shared term s in the global order. If s were outside a's
  * prefix, every shared term would lie in a's suffix, so
  * dot(a,b) ≤ ‖a_suffix‖·‖b‖ < t·‖a‖·‖b‖ (Cauchy-Schwarz) —
  * contradiction; hence s is in BOTH prefixes and the prefix-to-prefix
  * equi-join on the term loses no pairs. Hot shingles (large df) sort
  * LAST, so they land in suffixes and never generate candidates — the
  * candidate volume is Σ df² over RARE terms only, which is what makes
  * the join survive a corpus-scale document table. Candidates are then
  * verified exactly against the full tf maps.
  */
object CosinePairs {

  /** Word n-gram shingle list WITH multiplicity (unlike the hashed
    * distinct shingles in [[graft.plans.TextHashExprs]] — tf weighting
    * needs the counts). Empty for texts shorter than n tokens; the
    * CASE-guard matters because `sequence(0, -1)` DESCENDS rather than
    * yielding an empty array.
    */
  def shingleList(text: Column, n: Int): Column = {
    val toks = split(trim(lower(text)), "\\s+")
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** All document pairs with tf-cosine ≥ `threshold` over `shingleN`-gram
    * vectors: `(id_a, id_b, cosine)` with id_a < id_b, cosine exact and
    * rounded to 6 for cross-engine output stability. The returned
    * release handle unpersists the per-document vector cache (read by
    * the df join, the prefix explode and the verify join).
    *
    * `dfCap`: with it set, terms appearing in more than `dfCap`
    * documents are removed from the VECTORS (stop-shingle removal —
    * cosine over the rare-term subspace, a well-defined semantics both
    * engines can replay, not a lossy candidate heuristic). This is the
    * saturated-vocabulary guard: the prefix filter bounds candidate
    * volume by Σ df² over prefix terms, which stays subquadratic when
    * the term space grows with the corpus (Heaps' law, true of real
    * text) but degenerates when a FIXED vocabulary saturates and every
    * df scales with N — there, capping df bounds per-term join fan-out
    * at dfCap² regardless of corpus size. None = exact full-vocabulary
    * semantics (the oracle-companion form; quadratic on saturated
    * vocabularies by nature — any exact all-pairs similarity is).
    */
  def tfCosinePairsManaged(
      df: DataFrame, textCol: String, idCol: String,
      threshold: Double, shingleN: Int = 3,
      dfCap: Option[Int] = None): (DataFrame, () => Unit) = {
    require(threshold > 0.0 && threshold <= 1.0, "0 < threshold <= 1")
    require(dfCap.forall(_ >= 2), "dfCap >= 2 (df=1 terms never pair)")
    // (id, term, tf) — integer term frequencies per document
    val dt = df
      .select(col(idCol).as("id"),
        explode(shingleList(col(textCol), shingleN)).as("term"))
      .groupBy("id", "term")
      .agg(count(lit(1)).as("tf"))
    // global term order key: document frequency. The join is by term —
    // the inverted-index build — and only (term, df) pairs shuffle.
    val dfreqAll = dt.groupBy("term").agg(count(lit(1)).as("df"))
    val dfreq = dfCap.fold(dfreqAll)(c => dfreqAll.filter(col("df") <= c))
    // per-document sorted vector state: terms ascending (df, term) so a
    // position index IS the global order; struct sort gives a total
    // order because terms are unique within a document. With dfCap the
    // inner join here IS the stop-shingle removal: capped-out terms
    // vanish from the vectors before norms/prefixes are computed.
    val docs = dt.join(dfreq, "term")
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("df"), col("term"), col("tf"))))
        .as("ts"))
      .select(col("id"),
        transform(col("ts"), x => x("term")).as("terms"),
        transform(col("ts"), x => x("tf")).as("tfs"))
      .withColumn("n2", aggregate(col("tfs"), lit(0L), (a, x) => a + x * x))
      .persist()
    // prefix length p: drop the longest TAIL whose cumulative squared
    // mass stays under t²·n2 — a single O(|terms|) fold over the
    // reversed tf array with constant state (no suffix-sum array). The
    // kept-count condition is prefix-monotone because the running sum
    // only grows, so the simple conditional increment implements
    // "count while under the bound".
    val bound = lit(threshold * threshold) * col("n2").cast("double")
    val tailLen = aggregate(reverse(col("tfs")),
      struct(lit(0L).as("s"), lit(0).as("c")),
      (acc, x) => {
        val s2 = acc("s") + x * x
        struct(s2.as("s"),
          (acc("c") + when(s2.cast("double") < bound, 1).otherwise(0)).as("c"))
      },
      acc => acc("c"))
    val pre = docs
      .select(col("id"),
        explode(slice(col("terms"), lit(1), size(col("terms")) - tailLen))
          .as("term"))
    // candidate pairs: prefix-to-prefix equi-join; a qualifying pair's
    // first shared term is in both prefixes (Scaladoc proof)
    val cands = pre.as("l")
      .join(pre.as("r"),
        col("l.term") === col("r.term") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    // exact verification: BIGINT dot over the shared terms via tf maps
    val sides = docs.select(col("id"),
      map_from_arrays(col("terms"), col("tfs")).as("m"), col("n2"))
    val dot = aggregate(map_entries(col("ma")), lit(0L),
      (acc, e) => acc +
        e("value") * coalesce(element_at(col("mb"), e("key")), lit(0L)))
    val out = cands
      .join(sides.select(col("id").as("id_a"), col("m").as("ma"),
        col("n2").as("n2_a")), "id_a")
      .join(sides.select(col("id").as("id_b"), col("m").as("mb"),
        col("n2").as("n2_b")), "id_b")
      .withColumn("cos_raw",
        dot.cast("double") /
          (sqrt(col("n2_a").cast("double")) * sqrt(col("n2_b").cast("double"))))
      .filter(col("cos_raw") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos_raw"), 6).as("cosine"))
    (out, () => { docs.unpersist(); () })
  }

  /** [[tfCosinePairsManaged]] without the cache handle (spec/dev use —
    * production corpus passes should release).
    */
  def tfCosinePairs(df: DataFrame, textCol: String, idCol: String,
      threshold: Double, shingleN: Int = 3,
      dfCap: Option[Int] = None): DataFrame =
    tfCosinePairsManaged(df, textCol, idCol, threshold, shingleN, dfCap)._1
}
