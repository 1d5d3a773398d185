package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines. Unlike
  * `df.sample` (seeded per-partition RNG ⇒ results change with
  * partitioning), these are pure functions of the data: re-runs,
  * retries, and different cluster layouts select the same rows — which
  * is what a reproducible data pipeline needs.
  */
object Sampling {

  /** Keep ~numerator/denominator of rows, selected by a hash of `key`
    * (uniform, deterministic, partitioning-independent).
    */
  def hashSample(df: DataFrame, key: Column, numerator: Int, denominator: Int): DataFrame =
    df.filter(pmod(xxhash64(key), lit(denominator.toLong)) < numerator)

  /** Systematic sampling by a dense numeric key (every k-th row by id) —
    * fully oracle-expressible; use when the key is already uniform.
    */
  def systematicSample(df: DataFrame, key: Column, numerator: Int, denominator: Int): DataFrame =
    df.filter(pmod(key, lit(denominator.toLong)) < numerator)

  /** Per-stratum rates: `fractions` maps stratum value → (num, denom).
    * Strata missing from the map are dropped.
    */
  def stratifiedSystematic(
      df: DataFrame, stratum: Column, key: Column,
      fractions: Map[String, (Int, Int)]): DataFrame = {
    val keep = fractions.foldLeft(lit(false)) { case (acc, (s, (n, d))) =>
      acc || (stratum === s && pmod(key, lit(d.toLong)) < n)
    }
    df.filter(keep)
  }
}
