package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf001)

  test("hashSample is deterministic and partitioning-independent") {
    val a = Sampling.hashSample(docs, col("doc_id"), 1, 4)
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.hashSample(docs.repartition(13), col("doc_id"), 1, 4)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b) // df.sample would differ across partitionings
    val frac = a.size.toDouble / docs.count()
    assert(frac > 0.15 && frac < 0.35, s"frac=$frac")
  }

  test("systematic sample rate is exact on dense ids") {
    val n = Sampling.systematicSample(docs, col("doc_id"), 3, 4).count()
    assert(n == docs.filter($"doc_id" % 4 < 3).count())
  }

  test("stratified rates apply per stratum; unknown strata dropped") {
    val kept = Sampling.stratifiedSystematic(
      docs, col("lang"), col("doc_id"), Map("en" -> (1, 2)))
    assert(kept.select("lang").distinct().as[String].collect().toSeq == Seq("en"))
  }
}
