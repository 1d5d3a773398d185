package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Filter-cascade observability: a corpus-cleaning pipeline is an ordered
  * list of gates, and the number that matters operationally is how many
  * documents each gate rejects — a mix that suddenly loses 40% of a
  * source at the language gate is a data bug before it is a model bug.
  *
  * Each row is attributed to the FIRST stage whose predicate rejects it
  * (later predicates are not consulted, exactly like the short-circuit
  * `filter` chain the production pipeline runs), or to `"kept"`. One
  * narrow pass + one tiny aggregate — the census costs no more than the
  * cascade itself at any scale.
  */
object Funnel {

  final val Kept = "kept"

  /** Label column: first rejecting stage's label, else [[Kept]]. Stage
    * labels are prefixed with their 1-based index so the census sorts in
    * pipeline order. A null predicate value rejects (filter() would drop
    * the row), attributed to that stage.
    */
  def firstRejected(stages: Seq[(String, Column)]): Column = {
    require(stages.nonEmpty, "at least one stage")
    val whens = stages.zipWithIndex.map { case ((name, pred), i) =>
      (s"${i + 1}_$name", pred)
    }
    whens.tail.foldLeft(
      when(!coalesce(whens.head._2, lit(false)), lit(whens.head._1))) {
      case (chain, (label, pred)) =>
        chain.when(!coalesce(pred, lit(false)), lit(label))
    }.otherwise(lit(Kept))
  }

  /** Per-stage rejection census: (stage, n) with stages in pipeline
    * order and the survivors under [[Kept]].
    */
  def census(df: DataFrame, stages: Seq[(String, Column)]): DataFrame =
    df.select(firstRejected(stages).as("stage"))
      .groupBy("stage")
      .agg(count(lit(1)).as("n"))
      .orderBy("stage")
}
