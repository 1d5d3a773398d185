package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.QualityClassifier

/** Scratch probe (round 10): where does a mini-batch iteration's time
  * go? Times 12 gradient-shaped jobs against three cache layouts:
  *   A. clustered cache + `__s = r` filter (stats-prunable equality)
  *   B. plain cache + `pmod(__k, k) = r` filter (the r9 design)
  *   C. k separately-persisted slice caches
  *   D. full-batch (no filter) for the baseline
  * `Test/runMain graft.DevR10c /tmp/graft_sf10`
  */
object DevR10c {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    val spark = TestSpark.spark
    import spark.implicits._
    val k = 4L
    val docs = graft.sources.Tables.documents(spark, dir)
      .filter(pmod(xxhash64(col("doc_id")), lit(10)) < 8)
    val dim = 64

    def feats(d: DataFrame) = d.select(
      (graft.operators.TextAnalysis.qualityScore(col("text")) >= 0.7)
        .cast("double").as("y"),
      QualityClassifier.featureEntries(col("text"), dim).as("entries"),
      xxhash64(col("text")).as("__k"))
      .withColumn("__s", pmod(col("__k"), lit(k)).cast("int"))

    def gradJob(slice: DataFrame): Long = {
      val wlit = array(Array.fill(dim)(lit(0.01)): _*)
      slice
        .withColumn("m", aggregate(col("entries"), lit(0.0), (acc, e) =>
          acc + element_at(wlit, e.getField("b") + 1) *
            e.getField("cnt").cast("double")))
        .withColumn("rfx",
          round(round(lit(1.0) / (lit(1.0) + exp(-col("m"))) - col("y"), 6)
            * 1e6, 0).cast("long"))
        .select(explode(col("entries")).as("e"), col("rfx"))
        .groupBy(col("e.b").as("b"))
        .agg(sum(col("rfx") * col("e.cnt").cast("long")).as("g"))
        .count()
    }

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[devr10c] $name%-34s ${(System.nanoTime() - t0) / 1e9}%6.1fs")
    }

    // A: clustered cache
    val a = feats(docs).repartitionByRange(col("__s"), col("__k"))
      .sortWithinPartitions("__s", "__k").persist()
    time("A build (clustered cache)") { a.count(); () }
    time("A 12 sliced iters") {
      (0 until 12).foreach(i => gradJob(a.filter(col("__s") === i % 4)))
    }
    a.unpersist()

    // B: plain cache, pmod filter
    val b = feats(docs).persist()
    time("B build (plain cache)") { b.count(); () }
    time("B 12 pmod-sliced iters") {
      (0 until 12).foreach(i =>
        gradJob(b.filter(pmod(col("__k"), lit(k)) === i % 4)))
    }
    time("D 12 FULL iters (same cache)") {
      (0 until 12).foreach(_ => gradJob(b))
    }
    b.unpersist()

    // C: per-slice caches, filter-before-featurize from source
    val slices = (0 until k.toInt).map { r =>
      feats(docs.filter(pmod(xxhash64(col("text")), lit(k)) === r)).persist()
    }
    time("C build (4 slice caches)") { slices.foreach(_.count()) }
    time("C 12 sliced iters") {
      (0 until 12).foreach(i => gradJob(slices(i % 4)))
    }
    slices.foreach(_.unpersist())
    ()
  }
}
