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

  test("groupCap keeps at most cap rows per group, deterministically") {
    val keyed = docs.select(col("doc_id"), col("source"),
      Sampling.shuffleKey(col("doc_id")).as("sk"))
    val capped = Sampling.groupCap(keyed, col("source"), 5, col("sk"), col("doc_id"))
    val perGroup = capped.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(perGroup.values.forall(_ <= 5))
    // groups smaller than cap are untouched
    val sizes = keyed.groupBy("source").count().as[(String, Long)].collect().toMap
    sizes.foreach { case (s, n) => assert(perGroup(s) == math.min(n, 5L)) }
    // re-run under a different partitioning keeps the SAME rows
    val again = Sampling.groupCap(keyed.repartition(13), col("source"), 5,
      col("sk"), col("doc_id")).select("doc_id").as[Long].collect().toSet
    assert(again == capped.select("doc_id").as[Long].collect().toSet)
    // kept rows are exactly the first-cap in (sk, doc_id) order per group
    val expected = keyed.as[(Long, String, Long)].collect()
      .groupBy(_._2).values.flatMap(_.sortBy(r => (r._3, r._1)).take(5).map(_._1)).toSet
    assert(again == expected)
  }
}
