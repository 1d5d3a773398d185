package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ImportanceWeightsSpec extends SparkSpec {
  import spark.implicits._

  test("bucket matches a reference md5-prefix computation") {
    // python: int(hashlib.md5(b'hello').hexdigest()[:6], 16) = 6111552
    val b = spark.range(1).select(
      ImportanceWeights.bucket(lit("hello"), 512).as("b")).head.getLong(0)
    assert(b == 6111552L % 512)
  }

  test("target-only vocabulary scores positive, off-target negative") {
    val docs = Seq(
      (1L, "alpha alpha beta", "t"),
      (2L, "alpha beta beta", "t"),
      (3L, "gamma delta gamma", "r"),
      (4L, "delta gamma delta", "r")
    ).toDF("doc_id", "text", "tag")
    val scored = ImportanceWeights.dsir(docs, "text", "doc_id",
      col("tag") === "t").collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getBoolean(3))).toMap
    assert(scored(1L)._1 > 0 && scored(1L)._2)
    assert(scored(2L)._1 > 0)
    assert(scored(3L)._1 < 0 && !scored(3L)._2)
    assert(scored(4L)._1 < 0)
  }

  test("scores are bit-stable across parallelism (decimal summation)") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    def run(parts: Int) = {
      val d = docs.repartition(parts)
      ImportanceWeights.dsir(d, "text", "doc_id", col("lang") === "en")
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getDouble(2)))
    }
    assert(run(13).toSeq == run(2).toSeq)
  }

  test("every bucket a scoring token can hit has a learned row") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val ratios = ImportanceWeights.bucketRatios(docs, "text",
      col("lang") === "en")
    val perDoc = ImportanceWeights.scoreDocsExact(docs, "text", "doc_id", ratios)
    // inner-join scoring loses no tokens: per-doc token counts must sum
    // to the corpus token count
    val scoredTokens = perDoc.agg(sum("n_tokens")).head.getLong(0)
    val corpusTokens = docs.select(
      explode(TextAnalysis.tokens(col("text")))).count()
    assert(scoredTokens == corpusTokens)
  }
}
