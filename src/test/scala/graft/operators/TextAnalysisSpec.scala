package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TextAnalysis._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token and subword counts") {
    val got = Seq("hello world", "  padded   out  ", "one-two, three!")
      .toDF("t")
      .select(tokenCount($"t"), subwordCount($"t"))
      .as[(Int, Int)].collect().toSeq
    // "one-two, three!" → 2 whitespace tokens; subwords: one,-,two,,,three,! → 6
    assert(got == Seq((2, 2), (2, 2), (2, 6)))
  }

  test("punct and stopword ratios bounded and sane") {
    val got = Seq("the cat sat on the mat", "!!!", "")
      .toDF("t")
      .select(round(punctRatio($"t"), 6), round(stopwordRatio($"t"), 6))
      .as[(Double, Double)].collect().toSeq
    assert(got(0)._1 == 0.0)
    assert(got(0)._2 == 0.5) // the, on, the of 6 tokens
    assert(got(1)._1 == 1.0)
  }

  test("quality score lands in [0,1] on real docs") {
    val q = graft.sources.Tables.documents(spark, sf001)
      .select(qualityScore($"text").as("q"))
      .agg(min("q"), max("q")).as[(Double, Double)].head()
    assert(q._1 >= 0.0 && q._2 <= 1.0)
  }

  test("langId picks marker-dominant language with deterministic ties") {
    val got = Seq(
      "the cat and the dog of the house",  // en markers
      "el perro de la casa y los gatos",   // es markers
      "xyzzy plugh qwerty")                // nothing
      .toDF("t").select(langId($"t")).as[String].collect().toSeq
    assert(got == Seq("en", "es", "und"))
  }

  test("fingerprint: deterministic, order-sensitive, engine-portable arithmetic") {
    val got = Seq("a b c", "c b a", "a b c", "")
      .toDF("t").select(fingerprint($"t")).as[Long].collect().toSeq
    assert(got(0) == got(2))
    assert(got(0) != got(1)) // order matters (rolling hash)
    assert(got(3) == 0L)
    // reference value computed by the same polynomial in plain Scala
    val expected = "a b c".foldLeft(0L)((a, c) => (a * 31 + c.toInt) % 1000000007L)
    assert(got(0) == expected)
  }
}
