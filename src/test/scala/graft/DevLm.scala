package graft

/** Dev-only micro-harness for the lm-score variants (not part of the
  * driver contract): times the two-pass form, the managed form with the
  * eager checkpoint, and the managed form without it, on one sf dir.
  */
object DevLm {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get(GraftSession.envCpus)
    val docs = graft.sources.Tables.documents(spark, sfDir)
    docs.count() // warm
    def time(tag: String)(f: => Unit): Unit = {
      val samples = (1 to 5).map { _ =>
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[devlm] $tag%-24s median ${samples.sorted.apply(2)}%.3f s (${samples.map(s => f"$s%.2f").mkString(",")})")
    }
    time("two-pass lmScore") {
      graft.operators.TextAnalysis.lmScore(docs, "text", "doc_id").count(); ()
    }
    time("managed + checkpoint") {
      val (res, rel) = graft.operators.TextAnalysis.lmScoreManaged(docs, "text", "doc_id")
      try res.orderBy("doc_id").localCheckpoint(true).count() finally rel()
      ()
    }
    time("managed, count only") {
      val (res, rel) = graft.operators.TextAnalysis.lmScoreManaged(docs, "text", "doc_id")
      try res.count() finally rel()
      ()
    }
    spark.stop()
  }
}
