package graft

import org.apache.spark.sql.functions._

/** Dev-only micro-harness for the SemDeDup path (not part of the driver
  * contract): times each stage of sim_semantic_dedup on one sf dir to
  * locate where the decade-2 wall-clock goes (seed collect, narrow
  * assignment, block-size histogram, pair join).
  */
object DevSem {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get(GraftSession.envCpus)
    import spark.implicits._
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val n = emb.count() // warm
    val k = math.max(8, math.ceil(n / 1000.0).toInt)
    println(s"[devsem] n=$n k=$k")

    def time(tag: String)(f: => Unit): Unit = {
      val samples = (1 to 3).map { _ =>
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[devsem] $tag%-28s median ${samples.sorted.apply(1)}%.3f s (${samples.map(s => f"$s%.2f").mkString(",")})")
    }

    time("seedCentroids collect") {
      graft.operators.Similarity.seedCentroids(emb, k); ()
    }
    val seeds = graft.operators.Similarity.seedCentroids(emb, k)
    time("assignment count (1 scan)") {
      emb.withColumn("cell", explode(array(
        graft.plans.NearestCentroid(col("embedding"), seeds)))).count(); ()
    }
    time("cell-size histogram") {
      emb.withColumn("cell", explode(array(
        graft.plans.NearestCentroid(col("embedding"), seeds))))
        .groupBy("cell").count().count(); ()
    }
    // block-size distribution: how skewed are the Voronoi cells?
    val hist = emb.withColumn("cell", explode(array(
      graft.plans.NearestCentroid(col("embedding"), seeds))))
      .groupBy("cell").count().select($"count")
      .as[Long].collect().sorted.reverse
    println(s"[devsem] cells=${hist.length} max=${hist.head} " +
      s"top5=${hist.take(5).mkString(",")} mean=${hist.sum / hist.length} " +
      s"sum_sq=${hist.map(x => x * x).sum}")
    time("full semanticNearDups") {
      graft.operators.Similarity.semanticNearDups(emb, k = k, topPairs = 20)
        .count(); ()
    }
    // A/B the pair stage on the SAME cell assignment: join form vs the
    // CosTopPairs kernel (both triangle-split at the default target)
    val assigned = emb.withColumn("cell", explode(array(
      graft.plans.NearestCentroid(col("embedding"), seeds))))
      .cache()
    assigned.count()
    time("pair stage: join form") {
      graft.operators.Similarity.cosineNearDupsBlocked(
        assigned, Seq("cell"), topPairs = 20).count(); ()
    }
    time("pair stage: kernel") {
      graft.operators.Similarity.cosineNearDupsBlocked(
        assigned, Seq("cell"), topPairs = 20, kernel = true).count(); ()
    }
    assigned.unpersist()
    spark.stop()
  }
}
