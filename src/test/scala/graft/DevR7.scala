package graft

import org.apache.spark.sql.functions._

/** Dev scratch for round-7 floors: JL recall hits per query and trained
  * classifier accuracy at both gate SFs. Not part of the driver
  * contract; kept for reproducing the floor measurements.
  */
object DevR7 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get(GraftSession.envCpus)
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb = graft.sources.Tables.embeddings(spark, sf)
      val panel = emb.filter(col("vec_id") < 10)
      val exact = graft.operators.Similarity.bruteForceTopK(panel, emb, k = 5)
        .select("query_id", "neighbor_id")
      val approx = graft.operators.Projection.projectedTopK(
        panel, emb, k = 5, dim = 64, outDim = 32, shortlist = 200)
        .select("query_id", "neighbor_id")
      val hits = exact.join(approx, Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy("query_id").agg(count(lit(1)).as("hits"))
      val mins = exact.select("query_id").distinct()
        .join(hits, Seq("query_id"), "left")
        .select(coalesce(col("hits"), lit(0L)).as("hits"))
        .agg(min("hits"), avg("hits")).collect()(0)
      println(s"[devr7] $sf JL recall min=${mins.get(0)} avg=${mins.get(1)}")

      val docs = graft.sources.Tables.documents(spark, sf)
      val labeled = docs.select(col("doc_id"), col("text"),
        (graft.operators.TextAnalysis.qualityScore(col("text")) >= 0.7)
          .cast("int").as("y"),
        when(pmod(xxhash64(col("doc_id")), lit(10)) < 8, "train")
          .otherwise("holdout").as("split"))
      val t0 = System.nanoTime()
      val model = graft.operators.QualityClassifier.train(
        labeled.filter(col("split") === "train"), "text", "y")
      val trainSec = (System.nanoTime() - t0) / 1e9
      val acc = labeled
        .withColumn("pred",
          graft.operators.QualityClassifier.prediction(col("text"), model))
        .groupBy("split")
        .agg(count(lit(1)).as("n"),
          avg((col("pred") === col("y")).cast("double")).as("acc"))
        .collect()
      println(s"[devr7] $sf classifier train=${trainSec}s " +
        acc.map(r => s"${r.get(0)}:n=${r.get(1)},acc=${r.get(2)}").mkString(" "))
    }
    spark.stop()
  }
}
