package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Dev aid (r17): in-JVM A/B of pipe_zorder_layout — OLD (per-component
  * qualityScore + full-row range exchange) vs NEW (features struct +
  * narrow projection). `Test/runMain graft.DevZ <sfdir> <reps>`.
  */
object DevZ {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = GraftSession.get(GraftSession.envCpus)

    def timeIt(label: String)(f: => Long): Unit = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      val n = f
      println(f"[devz] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n)")
    }

    def oldForm(): Long = {
      val docs = graft.sources.Tables.documents(spark, sfDir)
        .withColumn("qb", graft.operators.Layout.bucketize(
          TextAnalysis.qualityScore(col("text")), 0.0, 1.0, bits = 4))
        .withColumn("lb", graft.operators.Layout.bucketize(
          col("n_chars"), 0.0, 1024.0, bits = 4))
      val laidOut = graft.operators.Layout.zorderFiles(docs,
        graft.operators.Layout.zValue(col("qb"), col("lb"), bits = 4),
        col("doc_id"), nFiles = 8)
      graft.operators.Layout.fileSpans(laidOut,
        Seq("q" -> col("qb"), "len" -> col("lb"))).count()
    }

    def newForm(): Long =
      SparkEntry.queries("pipe_zorder_layout")(spark, sfDir).count()

    oldForm(); newForm()
    (1 to reps).foreach { i =>
      timeIt(s"old#$i")(oldForm())
      timeIt(s"new#$i")(newForm())
    }
    spark.stop()
  }
}
