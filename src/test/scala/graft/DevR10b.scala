package graft

import org.apache.spark.sql.functions._

import graft.operators.{QualityClassifier, TextAnalysis}

/** Scratch probe (round 10): classifier train wall-clock at an
  * arbitrary SF dir — the apples-to-apples full-batch vs mini-batch
  * comparison on ONE host (`Test/runMain graft.DevR10b /tmp/graft_sf10`).
  */
object DevR10b {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, dir)
    val l = docs.select(col("doc_id"), col("text"),
      (TextAnalysis.qualityScore(col("text")) >= 0.7).cast("int").as("y"),
      when(pmod(xxhash64(col("doc_id")), lit(10)) < 8, "train")
        .otherwise("holdout").as("split")).cache()
    l.count()
    for ((iters, bi) <- Seq((12, 4), (10, 1), (12, 4))) {
      val t0 = System.nanoTime()
      val m = QualityClassifier.train(l.filter(col("split") === "train"),
        "text", "y", QualityClassifier.TrainConfig(iters = iters, batchInv = bi))
      val secs = (System.nanoTime() - t0) / 1e9
      val acc = l.withColumn("pred",
          QualityClassifier.prediction(col("text"), m))
        .groupBy("split")
        .agg((sum((col("pred") === col("y")).cast("long")).cast("double") /
          count(lit(1)).cast("double")).as("acc"))
        .as[(String, Double)].collect().toMap
      println(f"[devr10b] $dir iters=$iters bi=$bi " +
        f"train=${acc("train")}%.4f holdout=${acc("holdout")}%.4f " +
        f"t=$secs%.1fs")
    }
    l.unpersist()
    ()
  }
}
