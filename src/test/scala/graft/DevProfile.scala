package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Packing, RangeJoin, Similarity, TextAnalysis}
import graft.sources.Tables

/** Dev-only stage profiler for the heavy bench queries (not part of the
  * driver contract; run via `sbt "runMain graft.DevProfile"`).
  */
object DevProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.filterNot(_.startsWith("--")).headOption
      .getOrElse("/root/testdata/sf0.1")
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

    if (args.contains("--scale10")) {
      // 10× corpora by unioning id-shifted copies: checks the new
      // operators stay near-linear (the README scale table's source)
      val docs10 = (0 until 10).map(i => docs
        .withColumn("doc_id", col("doc_id") + lit(i * 1000000L)))
        .reduce(_ unionByName _).cache()
      docs10.count()
      val ev = Tables.events(spark, sfDir)
      val ev10 = (0 until 10).map(i => ev
        .withColumn("event_id", col("event_id") + lit(i * 10000000L)))
        .reduce(_ unionByName _).cache()
      ev10.count()
      val emb = Tables.embeddings(spark, sfDir)
      val emb10 = (0 until 10).map(i => emb
        .withColumn("vec_id", col("vec_id") + lit(i * 1000000L)))
        .reduce(_ unionByName _).cache()
      emb10.count()

      time("x10_minhash") {
        Dedup.minhashNearDups(docs10, "text", "doc_id", threshold = 0.5).count()
      }
      time("x10_simhash") {
        Dedup.simhashNearDups(docs10, "text", "doc_id",
          Seq("lang", "source"), maxDist = 8).count()
      }
      time("x10_packing") {
        Packing.packByBudget(
          docs10.select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("tok")),
          "doc_id", "tok", 2048).groupBy("seq_id").count().count()
      }
      time("x10_range_join") {
        val errors = ev10.filter(col("event_type") === "error")
          .select(col("event_id").as("err_id"), col("user_id").as("err_user"),
            col("ts").as("err_ts"))
        val clicks = ev10.filter(col("event_type") === "click")
          .select(col("user_id").as("clk_user"), col("ts").as("clk_ts"))
        RangeJoin.intervalJoin(errors, clicks, "err_ts", "clk_ts", 1, 600,
          Seq("err_user" -> "clk_user")).count()
      }
      time("x10_kmeans_ivf") {
        Similarity.ivfTopK(emb10.filter(col("vec_id") < 10), emb10,
          Similarity.kmeansCentroids(emb10, 8, 3), k = 5, nprobe = 4).count()
      }
      time("x10_lsh_topk") {
        Similarity.lshTopK(emb10.filter(col("vec_id") < 10), emb10,
          k = 5, dim = 64, planes = 4, tables = 12).count()
      }
    }
    spark.stop()
  }
}
