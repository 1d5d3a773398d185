package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities: salting for hot keys in aggregations and
  * joins. AQE's runtime skew-join handles most cases
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default); these helpers
  * cover the two shapes AQE doesn't: skewed *aggregation* keys, and
  * broadcast-ineligible joins where one side's key distribution is known
  * pathological up front.
  */
object Skew {

  /** Deterministic per-row salt in [0, n) derived from a row-distinct
    * column (deterministic ⇒ replays/retries land in the same bucket).
    */
  def salt(rowDistinct: Column, n: Int): Column =
    pmod(xxhash64(rowDistinct), lit(n.toLong)).cast("int")

  /** Two-phase aggregation over a skewed key: phase 1 aggregates on
    * (keys, salt) — spreading a hot key over `n` reducers — phase 2
    * merges the partials. `partial` aggregates raw rows; `merge` folds
    * partial columns (by name) into finals. Works for any
    * self-decomposable aggregate (sum/count/min/max, and avg as
    * sum+count merged at the end).
    */
  def saltedAgg(
      df: DataFrame, keys: Seq[String], saltOn: Column, n: Int,
      partial: Seq[Column], merge: Seq[Column]): DataFrame =
    df.withColumn("__salt", salt(saltOn, n))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)

  /** Skew-resilient equi-join: the big side gets a per-row salt, the
    * small side is replicated once per salt value, and the join key
    * becomes (key, salt) — a hot key's rows spread over `n` tasks
    * instead of landing on one. Replication factor n multiplies the
    * small side only.
    */
  def saltedJoin(
      big: DataFrame, small: DataFrame, keys: Seq[String],
      bigSaltOn: Column, n: Int, joinType: String = "inner"): DataFrame = {
    // replicate-and-salt preserves semantics only when unmatched
    // SMALL-side rows never surface: a right/full outer join would emit
    // each unmatched small row once per salt replica
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti")
      .contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left joins only, got $joinType")
    val b = big.withColumn("__salt", salt(bigSaltOn, n))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(n - 1))))
    b.join(s, keys :+ "__salt", joinType).drop("__salt")
  }
}
