package graft

import org.apache.spark.sql.functions._

import graft.operators.{QualityClassifier, TextAnalysis}

/** Scratch probe (round 9): holdout accuracy + full-pass loss of the
  * quality classifier across mini-batch configs at both gate SFs.
  */
object DevR9 {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val docs = graft.sources.Tables.documents(spark, dir)
      val l = docs.select(col("doc_id"), col("text"),
        (TextAnalysis.qualityScore(col("text")) >= 0.7).cast("int").as("y"),
        when(pmod(xxhash64(col("doc_id")), lit(10)) < 8, "train")
          .otherwise("holdout").as("split")).cache()
      l.count()
      for ((iters, bi) <- Seq((10, 1), (10, 4), (12, 4), (16, 4), (12, 8))) {
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
        val loss = QualityClassifier.logLoss(
          l.filter(col("split") === "train"), "text", "y", m)
        println(f"[devr9] $dir iters=$iters bi=$bi train=${acc("train")}%.4f " +
          f"holdout=${acc("holdout")}%.4f loss=$loss%.4f t=$secs%.1fs")
      }
      l.unpersist()
    }
  }
}
