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
    * (corpus doc, benchmark doc) pair, matches only. Self-pairs are
    * excluded so a benchmark set drawn from the corpus itself (as in
    * tests) does not flag its own rows.
    */
  def overlaps(
      corpus: DataFrame, textCol: String, idCol: String,
      bench: DataFrame, benchTextCol: String, benchIdCol: String,
      n: Int = 8): DataFrame = {
    // grams join on their 64-bit rotate-XOR hash (the native shingle
    // expression), not on strings: same distinct-gram semantics up to a
    // ~2^-64 collision, ~4× less work per row and an 8-byte broadcast
    // key instead of an n-word string
    val c = corpus.select(col(idCol).as("doc_id"),
      explode(Dedup.hashedShingles(col(textCol), n)).as("gram"))
    val b = bench.select(col(benchIdCol).as("bench_id"),
      explode(Dedup.hashedShingles(col(benchTextCol), n)).as("gram"))
    c.join(broadcast(b), "gram")
      .filter(col("doc_id") =!= col("bench_id"))
      .groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("n_shared"))
  }
}
