package graft.operators

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  test("counts distinct shared n-grams per (doc, bench) pair") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "quick brown fox jumps high above everything else today"),
      (3L, "completely unrelated words with no overlap at all"),
      (4L, "short text")).toDF("doc_id", "text")
    val bench = Seq((100L, "the quick brown fox jumps over fences"))
      .toDF("bench_id", "btext")
    val got = Decontaminate.overlaps(corpus, "text", "doc_id",
      bench, "btext", "bench_id", n = 4)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    // doc 1 shares "the quick brown fox", "quick brown fox jumps",
    // "brown fox jumps over"; doc 2 shares "quick brown fox jumps"
    assert(got == Seq((1L, 100L, 3L), (2L, 100L, 1L)))
  }

  test("self-pairs are excluded when bench is drawn from the corpus") {
    val docs = Tables.documents(spark, sf001)
    val bench = docs.filter($"doc_id" % 97 === 0)
    val pairs = Decontaminate.overlaps(docs, "text", "doc_id",
      bench, "text", "doc_id", n = 4, excludeSelfPairs = true)
      .select("doc_id", "bench_id").as[(Long, Long)].collect()
    assert(pairs.nonEmpty && pairs.forall { case (d, b) => d != b })
    // default (independent id spaces): equal ids are NOT filtered
    val withSelf = Decontaminate.overlaps(docs, "text", "doc_id",
      bench, "text", "doc_id", n = 4)
      .select("doc_id", "bench_id").as[(Long, Long)].collect()
    assert(withSelf.exists { case (d, b) => d == b })
  }

  test("bench side broadcasts; corpus never shuffles before the join") {
    val docs = Tables.documents(spark, sf001)
    val bench = docs.filter($"doc_id" % 97 === 0)
    val df = Decontaminate.overlaps(docs, "text", "doc_id",
      bench, "text", "doc_id", n = 4)
    // action on THIS Dataset so the adaptive plan below is the final
    // runtime plan, not the initial one (df.count() would execute a
    // different query and leave df's own plan unexecuted)
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    // AQE nests completed stages as QueryStageExec leaves that plain
    // collect() does not enter — flatten them first
    def nodes(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] =
      p.collect { case n => n }.flatMap {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          q +: nodes(q.plan)
        case n => Seq(n)
      }
    val all = nodes(plan)
    val bhj = all.collect { case j: BroadcastHashJoinExec => j }
    assert(bhj.nonEmpty, plan.toString)
    // the only shuffle is the final (doc_id, bench_id) aggregate of
    // matched rows — nothing below the join exchanges
    val shufflesBelowJoin = nodes(bhj.head)
      .collect { case e: ShuffleExchangeExec => e }
    assert(shufflesBelowJoin.isEmpty, plan.toString)
  }

  test("duplicatePassageStats counts corpus-shared n-grams per doc") {
    import spark.implicits._
    // doc1/doc2 share "a b c d"; doc3 is all-unique; doc4 repeats
    // doc1's tail span "c d e f"
    val docs = Seq(
      (1L, "a b c d e f"),   // grams: abcd bcde cdef
      (2L, "x a b c d y"),   // grams: xabc abcd bcdy
      (3L, "p q r s t"),     // grams: pqrs qrst
      (4L, "z c d e f")      // grams: zcde cdef
    ).toDF("doc_id", "text")
    val got = Decontaminate.duplicatePassageStats(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == (3L, 2L)) // abcd (with 2), cdef (with 4)
    assert(got(2L) == (3L, 1L))
    assert(got(3L) == (2L, 0L))
    assert(got(4L) == (2L, 1L))
  }

  test("duplicatePassageStats: repeated gram inside ONE doc is not 'shared'") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d a b c d"), // abcd occurs twice in the same doc only
      (2L, "u v w x y")
    ).toDF("doc_id", "text")
    val got = Decontaminate.duplicatePassageStats(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(1L) == 0L, s"self-repeat must not count as shared: $got")
  }
}
