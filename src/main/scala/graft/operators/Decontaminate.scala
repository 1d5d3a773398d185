package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag corpus documents that share verbatim
  * word n-gram spans with an evaluation/benchmark set — the standard
  * pre-training hygiene step (n=8..13 word overlap is the common
  * contamination criterion).
  *
  * Scale shape: the benchmark side is small by nature (eval sets are
  * MBs, the corpus is the 100 TB side), so its exploded distinct n-gram
  * table is BROADCAST; the corpus streams through scan → shingle →
  * explode → broadcast-hash-join with no corpus shuffle at all. The
  * per-(doc, benchmark) overlap count then aggregates only matching
  * rows (contamination is sparse by construction).
  */
object Decontaminate {

  /** (docId, benchId, n_shared): distinct shared n-grams per
    * (corpus doc, benchmark doc) pair, matches only.
    *
    * `excludeSelfPairs` drops pairs with equal ids — ONLY for the case
    * where the benchmark set is drawn from the corpus itself (dedup-
    * style hygiene, tests); with an independent eval set the id spaces
    * are unrelated and numeric collisions would silently unflag real
    * contamination, so it defaults to off.
    */
  def overlaps(
      corpus: DataFrame, textCol: String, idCol: String,
      bench: DataFrame, benchTextCol: String, benchIdCol: String,
      n: Int = 8, excludeSelfPairs: Boolean = false): DataFrame = {
    // grams join on their 64-bit rotate-XOR hash (the native shingle
    // expression), not on strings: same distinct-gram semantics up to a
    // ~2^-64 collision, ~4× less work per row and an 8-byte broadcast
    // key instead of an n-word string
    val c = corpus.select(col(idCol).as("doc_id"),
      explode(Dedup.hashedShingles(col(textCol), n)).as("gram"))
    val b = bench.select(col(benchIdCol).as("bench_id"),
      explode(Dedup.hashedShingles(col(benchTextCol), n)).as("gram"))
    val joined = c.join(broadcast(b), "gram")
    val paired =
      if (excludeSelfPairs) joined.filter(col("doc_id") =!= col("bench_id"))
      else joined
    paired
      .groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Intra-corpus duplicate-passage census: per document, how many of
    * its distinct word n-grams also occur in at least one OTHER
    * document, and that count as a fraction — the passage-level dedup
    * signal (documents can be globally unique yet stitched from
    * recycled spans; span-level dedup is what removes the memorization
    * pressure document-level dedup misses).
    *
    * Scale shape: two aggregations over 8-byte hashed grams (per-gram
    * doc counts, then per-doc shared counts via a gram-keyed join).
    * Gram strings never materialize and documents never shuffle —
    * volume is O(corpus tokens) long rows, with map-side partial
    * aggregation collapsing repeats before each exchange.
    */
  def duplicatePassageStats(corpus: DataFrame, textCol: String,
                            idCol: String, n: Int = 4): DataFrame = {
    val grams = corpus.select(col(idCol).as("doc_id"),
      explode(Dedup.hashedShingles(col(textCol), n)).as("gram"))
    // per-doc distinct grams ⇒ count(*) per gram = containing-doc count
    val docFreq = grams.groupBy("gram").agg(count(lit(1)).as("nd"))
    grams.join(docFreq, "gram")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_shared"))
      .select(col("doc_id"), col("n_grams"), col("n_shared"),
        round(col("n_shared").cast("double") / col("n_grams"), 6)
          .as("dup_frac"))
  }
}
