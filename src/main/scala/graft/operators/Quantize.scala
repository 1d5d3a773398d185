package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding compression for training-data pipelines: symmetric int8
  * quantization of a float-array column (the storage/bandwidth lever for
  * 100 TB embedding corpora — 4× smaller vectors, and ANN candidate
  * generation happily runs on the quantized form with exact re-scoring
  * on the fp32 originals).
  *
  * All pure `Column` arithmetic over IEEE-deterministic operations
  * (+ − × ÷, abs, max, round-half-away) so the oracle can replay it
  * bit-for-bit: no transcendental functions anywhere (log/exp differ
  * by ulps across engines; ÷ and sqrt are exact-rounded by IEEE 754
  * and engine-portable).
  *
  * Scale shape: a narrow per-row map — no shuffle, scan-colocated, same
  * plan at 2k vectors and at 100 TB.
  */
object Quantize {

  /** The production form: the whole quantization — scale, codes, code
    * norm, integer checksums, worst residual — as ONE O(dim) native
    * pass ([[graft.plans.Int8QuantizeExpr]]). The Column forms below
    * are the readable reference semantics and the spec's parity
    * baseline; they re-evaluate the scale sub-expression per element
    * (no let-binding inside lambdas), which is O(dim²) per row — fine
    * at dim 64, wrong at dim 1024.
    */
  def int8(vec: Column): Column = graft.plans.Int8Quantize(vec)

  /** Per-vector symmetric scale: max|v| / 127 (0 for the zero vector —
    * callers treat q=0 everywhere as exact).
    */
  def int8Scale(vec: Column): Column =
    array_max(transform(vec, v => abs(v.cast("double")))) / lit(127.0)

  /** Round-half-away-from-zero without BigDecimal: matches both Spark's
    * `round` and DuckDB's `round` on the values reachable here, and
    * keeps the expression in primitive codegen.
    */
  private def roundAway(x: Column): Column =
    when(x >= 0, floor(x + lit(0.5))).otherwise(ceil(x - lit(0.5))).cast("int")

  /** Quantized codes in [-127, 127] (empty-safe; zero vectors quantize
    * to all zeros).
    */
  def int8Codes(vec: Column): Column = {
    val s = int8Scale(vec)
    transform(vec, v =>
      when(s > 0, roundAway(v.cast("double") / s)).otherwise(lit(0)))
  }

  /** Reconstruction residuals |v - q·scale| (same order as the input). */
  def int8Error(vec: Column): Column = {
    val s = int8Scale(vec)
    zip_with(vec, int8Codes(vec),
      (v, q) => abs(v.cast("double") - q.cast("double") * s))
  }
}
