package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.Tables

/** Dev-only stage profiler for the heavy bench queries (not part of the
  * driver contract; run via `sbt "runMain graft.DevProfile"`).
  */
object DevProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get(GraftSession.envCpus)
    val docs = Tables.documents(spark, sfDir)
    docs.count() // warm

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-32s ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$n")
    }

    time("scan_only") {
      docs.select(sum(length(col("text")))).collect().head.getLong(0)
    }
    time("shingles_only") {
      docs.select(Dedup.hashedShingles(col("text")).as("sh"))
        .select(sum(size(col("sh")))).collect().head.getLong(0)
    }
    time("shingles_plus_minhash") {
      docs.select(Dedup.hashedShingles(col("text")).as("sh"))
        .filter(size(col("sh")) > 0)
        .select(graft.plans.TextHashExprs.minhashSig(col("sh"), 64).as("sig"))
        .select(sum(size(col("sig")))).collect().head.getLong(0)
    }
    time("minhash_cands_only") {
      val withSig = docs.select(col("doc_id").as("id"),
        Dedup.hashedShingles(col("text")).as("sh"))
        .filter(size(col("sh")) > 0)
        .withColumn("sig", graft.plans.TextHashExprs.minhashSig(col("sh"), 64))
      val buckets = withSig.select(col("id"),
        explode(Dedup.lshBands(col("sig"), 16, 4)).as("band"))
      buckets.as("l").join(buckets.as("r"),
        col("l.band") === col("r.band") && col("l.id") < col("r.id"))
        .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
        .dropDuplicates("id_a", "id_b").count()
    }
    time("minhash_full") {
      Dedup.minhashNearDups(docs, "text", "doc_id", threshold = 0.5).count()
    }
    time("ngram_jaccard_full") {
      Dedup.ngramJaccardBlocked(docs, "text", "doc_id",
        Seq("lang", "source"), threshold = 0.5).count()
    }
    time("simhash_full") {
      Dedup.simhashNearDups(docs, "text", "doc_id",
        Seq("lang", "source"), maxDist = 8).count()
    }
    spark.stop()
  }
}
