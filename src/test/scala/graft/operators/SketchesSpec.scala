package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Count-Min guarantees against exact counts on the real corpus. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("CMS estimates dominate exact counts and respect the eps bound") {
    val docs = Tables.documents(spark, sf001)
    val exact = docs
      .select(explode(TextAnalysis.tokens(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val n = exact.values.sum // total token count
    val probes = exact.keys.toSeq.sorted.take(20)
    val est = Sketches.cmsTermCounts(spark, docs, "text", probes, eps = 0.001)
      .as[(String, Long)].collect().toMap
    probes.foreach { t =>
      assert(est(t) >= exact(t), s"CMS underestimated $t")
      assert(est(t) <= exact(t) + (0.001 * n).toLong + 1,
        s"$t est=${est(t)} exact=${exact(t)} n=$n")
    }
  }

  test("absent terms stay within the eps overcount bound") {
    val docs = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    val est = Sketches.cmsTermCounts(spark, docs, "text",
      Seq("alpha", "zeta"), eps = 0.001)
      .as[(String, Long)].collect().toMap
    assert(est("alpha") >= 1L)
    assert(est("zeta") <= 1L) // eps*N for N=3 is < 1; collisions bounded
  }
}
