package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream joins — the streaming counterpart of the
  * batch as-of/interval joins in `graft.operators`. Spark buffers both
  * sides in state; the event-time bound plus the watermarks let it
  * evict: rows older than (watermark − bound) can never match again.
  *
  * Scale notes: state size is bounded by (join-key cardinality ×
  * bound window × arrival rate), independent of stream length — the
  * property that makes the join runnable forever. Both sides shuffle
  * by the equi-key (co-partitioned state); the time bound is a
  * post-filter inside the state store, never a cross product.
  */
object StreamJoins {

  /** Attribute each `response` event to the `trigger` event with the
    * same key that happened at most `windowSeconds` earlier (inclusive
    * on both ends). Inner join: unmatched rows on either side emit
    * nothing. Inputs must already carry watermarks; columns are
    * (keyCol, tsCol, ...payload) on both sides, disambiguated here by
    * prefixing.
    */
  def within(trigger: DataFrame, response: DataFrame,
             keyCol: String, tsCol: String,
             windowSeconds: Long): DataFrame = {
    val t = trigger.select(
      trigger.columns.map(c => col(c).as(s"t_$c")): _*)
    val r = response.select(
      response.columns.map(c => col(c).as(s"r_$c")): _*)
    t.join(r,
      col(s"t_$keyCol") === col(s"r_$keyCol") &&
        col(s"r_$tsCol") >= col(s"t_$tsCol") &&
        col(s"r_$tsCol") <= col(s"t_$tsCol") + expr(s"INTERVAL $windowSeconds SECONDS"))
  }
}
