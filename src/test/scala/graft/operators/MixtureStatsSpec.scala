package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

class MixtureStatsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf001)

  test("ngramDiversity on a hand-checked corpus") {
    val tiny = Seq(
      (1L, "a b a b", "s1"),
      (2L, "a b c d", "s1"),
      (3L, "x x x", "s2")
    ).toDF("doc_id", "text", "source")
    val rows = MixtureStats.ngramDiversity(tiny, "text", "source")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5))).toMap
    // s1: 8 tokens {a,b,c,d}=4 distinct; bigrams: "a b","b a","a b" +
    // "a b","b c","c d" = 6 total, {a b, b a, b c, c d}=4 distinct
    assert(rows("s1") == ((8L, 4L, 6L, 4L)))
    // s2: 3 tokens 1 distinct; 2 bigrams 1 distinct
    assert(rows("s2") == ((3L, 1L, 2L, 1L)))
  }

  test("klFromMixture: zero for a group matching the mixture, positive otherwise") {
    // two groups with IDENTICAL distributions → both p_g == q → KL = 0
    val balanced = Seq(
      (1L, "a a b", "s1"), (2L, "a a b", "s2")
    ).toDF("doc_id", "text", "source")
    val kl0 = MixtureStats.klFromMixture(balanced, "text", "source")
      .select("kl_nats").as[Double].collect()
    assert(kl0.forall(math.abs(_) < 1e-9))

    // skewed group diverges: KL > 0, and Gibbs' inequality holds corpus-wide
    val skewed = Seq(
      (1L, "a a a a", "s1"), (2L, "b b b b", "s2"), (3L, "a b", "s3")
    ).toDF("doc_id", "text", "source")
    val kl = MixtureStats.klFromMixture(skewed, "text", "source")
      .as[(String, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(kl("s1") > 0.0 && kl("s2") > 0.0)
    assert(math.abs(kl("s1") - kl("s2")) < 1e-9) // symmetric construction
    assert(kl("s3") < kl("s1")) // s3 is closer to the 50/50 mixture
  }

  test("diversity and KL run over the real documents table") {
    val div = MixtureStats.ngramDiversity(docs, "text", "source")
    assert(div.count() > 0)
    val r = div.head()
    assert(r.getAs[Long]("distinct_tokens") <= r.getAs[Long]("n_tokens"))
    val kl = MixtureStats.klFromMixture(docs, "text", "source")
      .select("kl_nats").as[Double].collect()
    assert(kl.forall(v => v >= 0.0 && !v.isNaN)) // KL(p‖q) ≥ 0 always
  }
}
