package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  test("rows attribute to the FIRST rejecting stage; survivors kept") {
    val df = Seq(
      (1, 10, "en"),  // fails minlen (and would fail lang — minlen wins)
      (2, 100, "xx"), // fails lang only
      (3, 100, "en"), // kept
      (4, 5, "xx"))   // fails minlen first
      .toDF("id", "len", "lang")
    val got = Funnel.census(df, Seq(
      "minlen" -> ($"len" >= 50),
      "lang" -> ($"lang" === "en")))
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("1_minlen", 2L), ("2_lang", 1L), ("kept", 1L)))
  }

  test("null predicate values reject at that stage, like filter() would") {
    val df = Seq[(Int, java.lang.Double)]((1, 0.9), (2, null), (3, 0.1))
      .toDF("id", "q")
    val got = Funnel.census(df, Seq("quality" -> ($"q" >= 0.5)))
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("1_quality", 2L), ("kept", 1L)))
  }

  test("census partitions the corpus: stage counts sum to total") {
    val docs = graft.sources.Tables.documents(spark, sf001)
    val fed = TextAnalysis.withFeatures(docs, "text",
      markers = TextAnalysis.langMarkers("en"))
    val census = Funnel.census(fed, Seq(
      "minlen" -> (col("n_chars") >= 80),
      "quality" -> (col("f.quality") >= 0.4),
      "lang" -> (col("f.n_markers") > 0)))
    assert(census.agg(sum("n")).as[Long].head() == docs.count())
    // the kept set equals running the same filters as a chain
    val kept = fed.filter(col("n_chars") >= 80)
      .filter(col("f.quality") >= 0.4)
      .filter(col("f.n_markers") > 0).count()
    assert(census.filter($"stage" === "kept").as[(String, Long)]
      .head()._2 == kept)
  }
}
