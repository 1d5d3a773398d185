package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lexical (keyword) search: Okapi BM25 ranking over a tokenized text
  * column — the exact-match complement to [[Similarity]]'s ANN search
  * in a retrieval pipeline (hybrid search = BM25 candidates ∪ ANN
  * candidates, re-ranked downstream).
  *
  * Scale design (100 TB): the per-document work is one tokenize pass;
  * only (id, dl, term) rows for terms IN THE QUERY survive to the
  * shuffle, so shuffle volume is O(matching docs × |query|), never
  * O(corpus tokens) — the `isin` filter sits under the explode's
  * projection and the aggregate is map-side partial. Corpus statistics
  * (N, avgdl) are a 1-row aggregate and the per-term document
  * frequencies are at most |query| rows: both broadcast. Nothing wide
  * ever shuffles. For a standing query workload you'd materialize the
  * inverted index (term → postings) once and join queries against it;
  * this operator is the ad-hoc/one-shot form of the same plan.
  */
object Search {

  /** BM25 scores for `queryTerms` against `docs`, one row per document
    * containing at least one query term: (idCol, score). IDF uses the
    * Lucene-style non-negative form ln(1 + (N - df + 0.5)/(df + 0.5)).
    * Deterministic given the corpus; `round` the score before any
    * cross-engine comparison (double summation order is not fixed).
    */
  def bm25(docs: DataFrame, textCol: String, idCol: String,
           queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25: empty query")
    val base = docs.select(col(idCol),
      TextAnalysis.tokens(col(textCol)).as("toks"))
      .select(col(idCol), col("toks"), size(col("toks")).as("dl"))
    // 1-row corpus statistics: broadcast, never a shuffle barrier for
    // the big side (exact long sum / count — no double drift)
    val stats = base.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    // term frequencies for query terms only — the isin filter runs
    // before the aggregate so non-matching tokens die in the map stage
    val tf = base
      .select(col(idCol), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
    val norm = col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("w", idf * col("tf") / norm)
      .groupBy(col(idCol))
      .agg(sum(col("w")).as("score"))
  }

  /** Top-k BM25 with a deterministic cross-engine order: ranks on the
    * ROUNDED score (ties broken by id) so the k-boundary does not
    * depend on sub-ulp double differences between engines.
    */
  def bm25TopK(docs: DataFrame, textCol: String, idCol: String,
               queryTerms: Seq[String], k: Int): DataFrame =
    bm25(docs, textCol, idCol, queryTerms)
      .withColumn("score", round(col("score"), 6))
      .orderBy(desc("score"), col(idCol))
      .limit(k)

  /** Reciprocal-rank fusion: merge N ranked candidate lists (each
    * (idCol, rankCol), rank 1-based) into one score
    * Σ 1/(k0 + rank) — the standard hybrid-retrieval combiner (BM25
    * list ∪ ANN list) because it needs no score calibration between
    * modalities. Returns (idCol, rrf, n_lists).
    *
    * Scale shape: candidate lists are top-k, so every input is k rows —
    * the union + re-aggregation runs on N·k rows total regardless of
    * corpus size. With two lists the per-id sum has at most two terms,
    * so the result is bit-exact under any execution order (IEEE
    * addition is commutative); for N > 2 round before cross-engine
    * comparison.
    */
  def rrfFuse(lists: Seq[DataFrame], idCol: String,
              rankCol: String = "rank", k0: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrfFuse: no candidate lists")
    lists
      .map(_.select(col(idCol),
        (lit(1.0) / (lit(k0) + col(rankCol))).as("contrib")))
      .reduce(_ unionByName _)
      .groupBy(col(idCol))
      .agg(sum(col("contrib")).as("rrf"), count(lit(1)).as("n_lists"))
  }
}
