package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics beyond [[Dedup.connectedComponents]]:
  * PageRank with a fixed iteration count — the importance measure a
  * data pipeline uses for source/domain weighting (rank pages/hosts by
  * link authority, then sample the corpus by rank).
  *
  * Scale shape: one rank⋈edges hash join + dst-aggregation per
  * iteration — the classic iterative-join PageRank (same dataflow
  * GraphX's Pregel emits for it). Ranks and edges both shuffle by key;
  * at scale, pre-partition `edges` by src once so every iteration
  * reuses that exchange. Dangling mass is folded in via a broadcast
  * 1-row aggregate instead of a per-iteration driver action, so the
  * whole run stays ONE lazy plan (nothing executes until the caller's
  * action). Iteration count is a constant here (lineage depth ~iters);
  * past ~10 iterations cut lineage per round the way the components
  * loop does.
  */
object Graph {

  /** Ranks after `iters` damped iterations from a uniform start.
    * Returns (id, pr); Σ pr = 1 at every step (mass conserved through
    * the dangling term). Multi-edges count multiply — dedupe first if
    * simple-graph semantics are wanted.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int, damping: Double = 0.85,
               nodes: Option[DataFrame] = None): DataFrame = {
    require(iters >= 1, "pageRank: iters >= 1")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val ns = nodes
      .map(_.toDF("id"))
      .getOrElse(e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id"))).distinct())
    val n = ns.count() // 1 driver scalar: the teleport denominator
    val deg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    val nodeDeg = ns.join(deg, Seq("id"), "left")
      .select(col("id"), coalesce(col("deg"), lit(0L)).as("deg"))
    var ranks = nodeDeg.select(col("id"), lit(1.0 / n).as("r"))
    for (_ <- 1 to iters) {
      val withDeg = ranks.join(nodeDeg, "id")
      // dangling (deg = 0) rank mass, as a broadcast scalar — not head()
      val m = withDeg.filter(col("deg") === 0)
        .agg(coalesce(sum(col("r")), lit(0.0)).as("m"))
      val contribs = e
        .join(withDeg.filter(col("deg") > 0)
          .select(col("id").as("src"), (col("r") / col("deg")).as("c")), "src")
        .groupBy(col("dst").as("id"))
        .agg(sum(col("c")).as("in_c"))
      ranks = nodeDeg.select("id")
        .join(contribs, Seq("id"), "left")
        .crossJoin(broadcast(m))
        .select(col("id"),
          (lit((1 - damping) / n) + lit(damping) *
            (coalesce(col("in_c"), lit(0.0)) + col("m") / n)).as("r"))
    }
    ranks.select(col("id"), col("r").as("pr"))
  }
}
