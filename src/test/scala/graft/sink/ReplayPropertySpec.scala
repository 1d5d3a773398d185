package graft.sink

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.model.Message
import graft.pipeline.{Enrich, GraftConfig}

/** Generative at-least-once property (SURVEY §5.2.3): any interleaving of
  * batch deliveries — including duplicated and reordered batches —
  * converges the detail and summary tables to the same state as a single
  * exactly-once delivery.
  */
class ReplayPropertySpec extends SparkSpec {
  import spark.implicits._

  private val genMsg: Gen[Message] = for {
    id <- Gen.chooseNum(0, 40) // small id space forces key collisions
    user <- Gen.oneOf("u1", "u2", "u3")
    jid <- Gen.oneOf("a@x", "b@x")
    body <- Gen.alphaNumStr.map(_.take(12))
    t <- Gen.chooseNum(1704067200000L, 1709067200000L)
  } yield Message(s"m$id", user, jid, body, t)

  private def deliver(batches: Seq[Seq[Message]], dir: String): Unit = {
    val detail = new ParquetUpsertSink(spark, dir, Some("date_partition"))
    val summary = new ParquetUpsertSink(spark, dir + "_sum")
    batches.filter(_.nonEmpty).foreach { b =>
      val enriched = Enrich(b.toDF(), GraftConfig.dev)
      detail.upsert(enriched, Seq("message_id"), "sent_time")
      summary.upsertDistinct(Enrich.summary(enriched))
    }
  }

  test("replayed + reordered deliveries converge to exactly-once state") {
    val batches = Gen.listOfN(4, Gen.listOfN(12, genMsg))
      .apply(Gen.Parameters.default, Seed(7L)).get
    // exactly-once: each batch once, in order
    val clean = tmpDir("replay_clean")
    deliver(batches, clean)
    // chaotic: duplicates and reordering (same multiset of records,
    // later batches replayed first and twice)
    val chaos = tmpDir("replay_chaos")
    deliver(batches.reverse ++ batches ++ batches.takeRight(2), chaos)

    def canon(path: String) =
      spark.read.parquet(path)
        .orderBy("message_id", "sent_time").collect().toSeq
    // per-key convergence: same keys present, and for each key the
    // surviving row is the max-version row — identical in both worlds
    assert(canon(clean).map(_.getString(0)) == canon(chaos).map(_.getString(0)))
    val cleanMap = canon(clean).map(r => r.getString(0) -> r.toString).toMap
    val chaosMap = canon(chaos).map(r => r.getString(0) -> r.toString).toMap
    assert(cleanMap == chaosMap)
    // summary tables converge to the same distinct set
    assert(spark.read.parquet(clean + "_sum").collect().map(_.toString).sorted.toSeq ==
      spark.read.parquet(chaos + "_sum").collect().map(_.toString).sorted.toSeq)
  }
}
