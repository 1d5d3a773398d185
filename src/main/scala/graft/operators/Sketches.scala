package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Mergeable frequency sketches: Count-Min term-frequency estimation —
  * the streaming/one-pass answer to "how often does each of these terms
  * occur" when the term universe is too large to aggregate exactly.
  * Rounds out the sketch family (HLL distinct counts, KLL-style
  * quantiles, MinHash/SimHash signatures, Bloom membership).
  *
  * Scale shape: `count_min_sketch` is an algebraic aggregate — each
  * partition builds a fixed-size (depth × width) table and the driver
  * merges partials, so the shuffle carries one sketch per partition
  * regardless of token count. Probing happens driver-side against the
  * merged sketch (bounded: |probe terms| lookups).
  *
  * Guarantees (one-sided): estimate ≥ true count, and with probability
  * ≥ confidence, estimate ≤ true count + eps·N where N = total tokens.
  * No SQL oracle (the sketch layout is Spark-internal); the bounds are
  * asserted against exact counts in SketchesSpec.
  */
object Sketches {

  /** Build one Count-Min sketch over the tokens of `textCol` and return
    * (term, est_count) for each probe term.
    */
  def cmsTermCounts(spark: SparkSession, docs: DataFrame, textCol: String,
                    probeTerms: Seq[String], eps: Double = 0.001,
                    confidence: Double = 0.99, seed: Int = 42): DataFrame = {
    require(probeTerms.nonEmpty, "cmsTermCounts: no probe terms")
    import spark.implicits._
    val bytes = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .agg(expr(
        s"count_min_sketch(term, ${eps}d, ${confidence}d, $seed)"))
      .head().getAs[Array[Byte]](0)
    val cms = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
    probeTerms.map(t => (t, cms.estimateCount(t)))
      .toDF("term", "est_count")
  }
}
