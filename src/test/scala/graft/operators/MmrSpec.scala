package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** MMR diversified re-ranking. */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  private def emb = Tables.embeddings(spark, sf0001)

  test("lambda=1 degenerates to the plain relevance top-m") {
    val panel = emb.filter(col("vec_id") < 5)
    val got = Similarity.mmrRerank(panel, emb, m = 10, poolSize = 30, lambda = 1.0)
      .select(col("query_id"), col("sel_rank").as("rank"), col("neighbor_id"))
    val want = Similarity.bruteForceTopK(panel, emb, k = 10)
      .select("query_id", "rank", "neighbor_id")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("first pick is always the relevance argmax") {
    val panel = emb.filter(col("vec_id") < 10)
    val first = Similarity.mmrRerank(panel, emb, m = 3, poolSize = 30)
      .filter(col("sel_rank") === 1)
      .select("query_id", "neighbor_id")
    val top1 = Similarity.bruteForceTopK(panel, emb, k = 1)
      .select("query_id", "neighbor_id")
    assert(first.exceptAll(top1).isEmpty && top1.exceptAll(first).isEmpty)
  }

  test("selection is less redundant than the plain top-m") {
    val panel = emb.filter(col("vec_id") < 10)
    def avgPairwise(sel: org.apache.spark.sql.DataFrame): Double = {
      val v = sel.join(emb.select(col("vec_id").as("neighbor_id"),
        col("embedding")), Seq("neighbor_id"))
      val pairs = v.select(col("query_id"), col("neighbor_id").as("i"),
          col("embedding").as("vi"))
        .join(v.select(col("query_id"), col("neighbor_id").as("j"),
          col("embedding").as("vj")), Seq("query_id"))
        .filter(col("i") < col("j"))
      pairs.select(avg(Similarity.cosine(col("vi"), col("vj"))))
        .as[Double].head()
    }
    val mmr = Similarity.mmrRerank(panel, emb, m = 10, poolSize = 30)
      .select("query_id", "neighbor_id")
    val plain = Similarity.bruteForceTopK(panel, emb, k = 10)
      .select("query_id", "neighbor_id")
    val (rMmr, rPlain) = (avgPairwise(mmr), avgPairwise(plain))
    assert(rMmr < rPlain,
      s"MMR should reduce redundancy: mmr=$rMmr plain=$rPlain")
    // and it actually changed the selection somewhere
    assert(mmr.exceptAll(plain).count() > 0)
  }

  test("m beyond the pool returns the whole pool, once each") {
    val tiny = emb.filter(col("vec_id") < 8) // pool of 7 per query
    val got = Similarity.mmrRerank(tiny.filter(col("vec_id") === 0), tiny,
      m = 50, poolSize = 30)
    assert(got.count() == 7)
    assert(got.select("neighbor_id").distinct().count() == 7)
  }

  test("integer ids and double vectors normalize into the group encoder") {
    val base = emb.limit(40).select(col("vec_id").cast("int").as("vec_id"),
      col("embedding").cast("array<double>").as("embedding"))
    val got = Similarity.mmrRerank(base.filter(col("vec_id") < 3), base,
      m = 5, poolSize = 20)
    assert(got.count() == 15)
    val want = Similarity.mmrRerank(
      emb.limit(40).filter(col("vec_id") < 3), emb.limit(40),
      m = 5, poolSize = 20)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("selection is deterministic across runs") {
    val panel = emb.filter(col("vec_id") < 5)
    val a = Similarity.mmrRerank(panel, emb, m = 10, poolSize = 30)
    val b = Similarity.mmrRerank(panel, emb, m = 10, poolSize = 30)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("a string id column is rejected loudly, never silently emptied") {
    // before the guard, cast("long") nulled every string id and the
    // non-null-safe pool join returned an EMPTY frame — unsupported
    // must be an error, not a plausible-looking zero-row result
    val strIds = emb.limit(20)
      .select(concat(lit("doc-"), col("vec_id")).as("vec_id"), col("embedding"))
    val e = intercept[IllegalArgumentException] {
      Similarity.mmrRerank(strIds, strIds, m = 3, poolSize = 10)
    }
    assert(e.getMessage.contains("must be integral"))
    // and the mixed case: integral queries, string corpus
    val e2 = intercept[IllegalArgumentException] {
      Similarity.mmrRerank(emb.limit(5), strIds, m = 3, poolSize = 10)
    }
    assert(e2.getMessage.contains("corpus"))
  }
}
