package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.Tables

/** Dev aid (r18): executed-plan dump of the exact-PPJoin side of
  * dedup_components_refine, OLD (own persist of t) vs NEW (shared
  * (id, sh, sig, blocks) cache) — diagnosing the sf1 phase-b regression.
  * `Test/runMain graft.DevShingle2 <sfdir> <outdir>`.
  */
object DevShingle2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    Files.createDirectories(Paths.get(outDir))
    val spark = GraftSession.get(GraftSession.envCpus)
    val docs = Tables.documents(spark, sfDir)

    // OLD: operator manages its own persist
    spark.catalog.clearCache()
    val (oldPairs, oldRel) = Dedup.ngramJaccardBlockedManaged(
      docs, "text", "doc_id", Seq("lang", "source"), threshold = 0.5)
    val oldOut = oldPairs.select("id_a", "id_b")
    val t0 = System.nanoTime()
    val nOld = oldOut.count()
    println(f"[devshingle2] old exact count: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$nOld)")
    Files.writeString(Paths.get(s"$outDir/exact_old_executed.txt"),
      oldOut.queryExecution.executedPlan.toString)
    oldRel()

    // NEW: shared cache pre-materialized (as refine's phase a does)
    spark.catalog.clearCache()
    val shared = Dedup.shingledDocs(docs, "text", "doc_id",
      Seq("lang", "source")).persist()
    shared.count() // simulate phase a having filled the cache
    val newOut = Dedup.ngramJaccardFromShingled(shared,
      Seq("lang", "source"), threshold = 0.5, dfCap = None,
      basePersisted = true)._1.select("id_a", "id_b")
    val t1 = System.nanoTime()
    val nNew = newOut.count()
    println(f"[devshingle2] new exact count: ${(System.nanoTime() - t1) / 1e9}%.2f s (rows=$nNew)")
    Files.writeString(Paths.get(s"$outDir/exact_new_executed.txt"),
      newOut.queryExecution.executedPlan.toString)
    shared.unpersist()
    spark.stop()
  }
}
