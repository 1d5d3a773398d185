package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.Tables

/** Dev aid (r18): per-job breakdown of the refine phase-b regression.
  * `Test/runMain graft.DevShingle3 <sfdir>`.
  */
object DevShingle3 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = GraftSession.get(GraftSession.envCpus)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val d = Option(e.properties.getProperty("spark.job.description")).getOrElse("")
        jobs.put(e.jobId, (d, System.nanoTime())); ()
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(jobs.get(e.jobId)).foreach { case (d, t0) =>
          println(f"[devjob] job ${e.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%6.2f s  $d")
        }
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val tm = si.taskMetrics
        println(f"[devstage]   stage ${si.stageId}%3d ${si.name.take(60)}%-60s tasks=${si.numTasks}%3d " +
          f"in=${tm.inputMetrics.bytesRead / 1e6}%8.1fMB sr=${tm.shuffleReadMetrics.totalBytesRead / 1e6}%8.1fMB " +
          f"sw=${tm.shuffleWriteMetrics.bytesWritten / 1e6}%8.1fMB exec=${tm.executorRunTime / 1e3}%7.1fs")
      }
    }
    spark.sparkContext.addSparkListener(listener)

    def sect(s: String): Unit = { println(s"[devsect] ==== $s"); spark.sparkContext.setJobDescription(s) }

    def oldRefine(tag: String): Unit = {
      val docs = Tables.documents(spark, sfDir)
      val exact = Dedup.ngramJaccardBlocked(docs, "text", "doc_id",
        Seq("lang", "source"), threshold = 0.5).select("id_a", "id_b")
      sect(s"$tag old-a")
      val (pairs, releasePairs) = Dedup.minhashNearDupsManaged(
        docs, "text", "doc_id", threshold = 0.5)
      val mh = Dedup.connectedComponents(pairs)
      releasePairs()
      sect(s"$tag old-b")
      val ca = mh.select(col("id").as("id_a"), col("component").as("comp_a"))
      val cb = mh.select(col("id").as("id_b"), col("component").as("comp_b"))
      val t0 = System.nanoTime()
      exact.join(ca.hint("merge"), Seq("id_a"), "left")
        .join(cb.hint("merge"), Seq("id_b"), "left")
        .filter(coalesce(col("comp_a"), lit(-1L)) =!= coalesce(col("comp_b"), lit(-2L)))
        .select("id_a", "id_b").orderBy("id_a", "id_b").count()
      println(f"[devsect] $tag old-b wall: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    def newRefine(tag: String): Unit = {
      val docs = Tables.documents(spark, sfDir)
      val shared = Dedup.shingledDocs(docs, "text", "doc_id",
        Seq("lang", "source")).persist()
      try {
        sect(s"$tag new-a")
        val (pairs, releasePairs) = Dedup.minhashFromShingled(shared, threshold = 0.5)
        val mh = Dedup.connectedComponents(pairs)
        releasePairs()
        sect(s"$tag new-b")
        val exact = Dedup.ngramJaccardFromShingled(shared,
          Seq("lang", "source"), threshold = 0.5, dfCap = None,
          basePersisted = true)._1.select("id_a", "id_b")
        val ca = mh.select(col("id").as("id_a"), col("component").as("comp_a"))
        val cb = mh.select(col("id").as("id_b"), col("component").as("comp_b"))
        val t0 = System.nanoTime()
        exact.join(ca.hint("merge"), Seq("id_a"), "left")
          .join(cb.hint("merge"), Seq("id_b"), "left")
          .filter(coalesce(col("comp_a"), lit(-1L)) =!= coalesce(col("comp_b"), lit(-2L)))
          .select("id_a", "id_b").orderBy("id_a", "id_b").count()
        println(f"[devsect] $tag new-b wall: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      } finally { shared.unpersist(); () }
    }

    // warm both once, then measure one of each with job logs
    spark.sparkContext.setJobDescription("warm")
    oldRefine("warm"); spark.catalog.clearCache()
    newRefine("warm"); spark.catalog.clearCache()
    System.gc()
    oldRefine("M"); spark.catalog.clearCache(); System.gc()
    newRefine("M")
    spark.stop()
  }
}
