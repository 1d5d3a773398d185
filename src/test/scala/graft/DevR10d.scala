package graft

import org.apache.spark.sql.functions._

import graft.operators.{QualityClassifier, TextAnalysis}

/** Scratch probe (round 10): featurization cost split at sf10 — tokens
  * vs qualityScore vs the O(u·t) distinct-filter featureEntries vs a
  * sorted run-length variant. `Test/runMain graft.DevR10d /tmp/graft_sf10`
  */
object DevR10d {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    val spark = TestSpark.spark
    val docs = graft.sources.Tables.documents(spark, dir).select("text")
    docs.count()
    val dim = 64

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[devr10d] $name%-34s ${(System.nanoTime() - t0) / 1e9}%6.1fs")
    }

    time("tokens only (size sum)") {
      docs.select(sum(size(TextAnalysis.tokens(col("text"))))).collect(); ()
    }
    time("qualityScore only") {
      docs.select(sum(TextAnalysis.qualityScore(col("text")))).collect(); ()
    }
    val bks = transform(TextAnalysis.tokens(col("text")),
      t => QualityClassifier.bucketOf(t, dim))
    time("buckets only") {
      docs.select(sum(size(bks))).collect(); ()
    }
    time("buckets + array_distinct") {
      docs.select(sum(size(array_distinct(bks)))).collect(); ()
    }
    time("current featureEntries") {
      docs.select(sum(size(
        QualityClassifier.featureEntries(col("text"), dim)))).collect(); ()
    }
    // sorted run-length variant: O(t log t) sort + linear fold with at
    // most dim run closures
    val sorted = array_sort(bks)
    val acc0 = struct(
      array().cast("array<struct<b:int,cnt:int>>").as("out"),
      lit(-1).as("prev"), lit(0).as("c"))
    def close(a: org.apache.spark.sql.Column) =
      when(a.getField("c") > 0,
        concat(a.getField("out"), array(struct(
          a.getField("prev").as("b"), a.getField("c").as("cnt")))))
        .otherwise(a.getField("out"))
    val rle = aggregate(sorted, acc0,
      (a, b) => when(b === a.getField("prev"), struct(
          a.getField("out").as("out"), a.getField("prev").as("prev"),
          (a.getField("c") + 1).as("c")))
        .otherwise(struct(close(a).as("out"), b.as("prev"), lit(1).as("c"))),
      a => close(a))
    time("sorted run-length variant") {
      docs.select(sum(size(rle))).collect(); ()
    }
    // parity check on a sample: same (b, cnt) set
    val both = docs.limit(5000).select(
      QualityClassifier.featureEntries(col("text"), dim).as("cur"),
      rle.as("alt"))
      .select(size(array_except(col("cur"), col("alt"))).as("d1"),
        size(array_except(col("alt"), col("cur"))).as("d2"))
      .agg(sum(col("d1")), sum(col("d2"))).collect().head
    println(s"[devr10d] parity diffs (must be 0,0): $both")
    ()
  }
}
