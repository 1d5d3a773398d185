package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (band) join: pair (l, r) when r's timestamp falls in
  * [l.ts + lower, l.ts + upper] and optional equi-keys match.
  *
  * Spark has no native band-join strategy — a naive formulation
  * (`l.join(r, keys && rTs.between(...))`) degenerates: with equi-keys
  * it ships whole key groups through a sort-merge join and filters
  * O(|group|²) pairs; without keys it is a broadcast nested loop over
  * the full cross product. This operator makes the band an EQUI-join
  * key: both sides bucket time by the band width W = upper − lower, the
  * right side lands in exactly one bucket, and each left row probes the
  * ≤ 2 consecutive buckets its band [l.ts+lower, l.ts+upper] can
  * overlap (a `sequence` + `explode`, so left is duplicated at most
  * 2×). The shuffle then partitions by (equiKeys, bucket) — bounded
  * fan-out, no group-quadratic work, AQE-splittable if a bucket is hot.
  * The exact band predicate refines after the hash join.
  *
  * This is the batch analog of a stream-stream interval join
  * (Structured Streaming's time-bound join condition); the reference
  * has no join surface at all (SURVEY.md §2.9) — this is a declared
  * engine extension.
  */
object RangeJoin {

  /** Inner band join. `left` and `right` must not share column names
    * (alias upstream, as with any self-join — both sides of a band join
    * typically derive from the same table and unqualified names would be
    * ambiguous). Bounds are in seconds, lower < upper; the pair
    * qualifies when `rightTs ∈ [leftTs + lower, leftTs + upper]`.
    */
  def intervalJoin(
      left: DataFrame, right: DataFrame,
      leftTs: String, rightTs: String,
      lowerSec: Long, upperSec: Long,
      equiKeys: Seq[(String, String)] = Nil): DataFrame = {
    require(upperSec > lowerSec, "band must be non-empty: lower < upper")
    val shared = left.columns.toSet.intersect(right.columns.toSet)
    require(shared.isEmpty,
      s"left/right share column names $shared — alias one side first")
    // internal columns use BandJoinRule's marker names: the refinement
    // conjuncts below would otherwise re-match the optimizer rule and
    // stack a SECOND explode+bucket layer on the already-bucketed join
    // (the rule's re-fire guard keys on these names); they are reserved
    val lUs = graft.plans.BandJoinRule.LUs; val lB = graft.plans.BandJoinRule.LBucket
    val rUs = graft.plans.BandJoinRule.RUs; val rB = graft.plans.BandJoinRule.RBucket
    val reserved = Set(lUs, lB, rUs, rB)
    val clash = (left.columns.toSet ++ right.columns.toSet).intersect(reserved)
    require(clash.isEmpty, s"column names $clash are reserved by intervalJoin")
    val w = (upperSec - lowerSec) * 1000000L // band width in micros
    val loUs = lowerSec * 1000000L
    val hiUs = upperSec * 1000000L
    def bucketOf(tsUs: Column): Column = floor(tsUs / lit(w))
    val l = left
      .withColumn(lUs, unix_micros(col(leftTs)))
      .withColumn(lB,
        explode(sequence(bucketOf(col(lUs) + lit(loUs)),
          bucketOf(col(lUs) + lit(hiUs)))))
    val r = right
      .withColumn(rUs, unix_micros(col(rightTs)))
      .withColumn(rB, bucketOf(col(rUs)))
    val cond = equiKeys
      .map { case (lk, rk) => col(lk) === col(rk) }
      .foldLeft(col(lB) === col(rB))(_ && _) &&
      col(rUs) >= col(lUs) + lit(loUs) &&
      col(rUs) <= col(lUs) + lit(hiUs)
    l.join(r, cond)
      .drop(lUs, rUs, lB, rB)
  }
}
