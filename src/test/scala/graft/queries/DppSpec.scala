package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Dynamic partition pruning: a partitioned fact table joined against
  * a FILTERED dimension must prune fact partitions at RUNTIME from the
  * dim's surviving join keys. Static pruning cannot see through the
  * join (the qualifying keys only exist after the dim's own filter
  * runs), and at 100 TB the fact scan is the query — reading every
  * partition of a month/tenant/language-partitioned fact because the
  * predicate arrives via a join is exactly the plan a warehouse-scale
  * deployment cannot afford. Complements BucketingSpec (shuffle
  * elimination) and the static-pruning pins in PlanSpec.
  */
class DppSpec extends SparkSpec {

  test("filtered dim join prunes fact partitions at runtime (DPP)") {
    val fact = tmpDir("dpp_fact")
    // keep the text column: DPP's benefit heuristic compares the
    // pruning-side scan bytes against the dim's — a fact that reads
    // no data columns estimates ~zero and the filter is not inserted
    Tables.documents(spark, sf001)
      .select("doc_id", "n_chars", "text", "lang")
      .write.partitionBy("lang").parquet(fact)
    val nLangs = spark.read.parquet(fact).select("lang").distinct().count()
    assert(nLangs > 1, "fixture needs several partitions to prune between")

    // the dim's join keys are only knowable AFTER its non-partition
    // filter runs — the case static partition pruning cannot cover.
    // The filter must be a literal comparison: Spark only inserts the
    // pruning subquery behind a LIKELY-SELECTIVE dim predicate
    // (isLikelySelective — a bare boolean column does not qualify)
    val dim = tmpDir("dpp_dim")
    spark.read.parquet(fact).select("lang").distinct()
      .withColumn("region",
        when(col("lang") === "en", "emea").otherwise("other"))
      .write.parquet(dim)

    val q = spark.read.parquet(fact)
      .join(spark.read.parquet(dim).filter(col("region") === "emea"),
        Seq("lang"))
      .agg(count(lit(1)).as("n"), countDistinct("lang").as("nl"),
        sum(length(col("text"))).as("bytes"))
    val row = q.collect().head
    assert(row.getLong(1) == 1L)
    assert(row.getLong(0) ==
      Tables.documents(spark, sf001).filter(col("lang") === "en").count(),
      "DPP must be a pure scan optimization — same rows out")

    // the fact scan carries a runtime pruning subquery fed by the
    // dim's broadcast (string-level: AQE hides subtrees from collect)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"fact scan must carry a runtime pruning filter:\n$plan")
  }
}
