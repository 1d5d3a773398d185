package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // the classic BPE teaching corpus: merges are hand-derivable
  private def toyHist = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L)
  ).toDF("word", "cnt")

  test("merges on the classic corpus match the hand-derived sequence") {
    // pair counts round 1: (e,s)=9, (s,t)=9, (l,o)=7, (o,w)=7, (w,e)=8,
    // (n,e)=6, (e,w)=6, (w,i)=3, (i,d)=3, (d,e)=3, (e,r)=2
    // tie (e,s) vs (s,t) at 9 → lexicographic picks (e,s); then (es,t)=9.
    // est CONSUMES the e of (w,e) in newest/widest (w,e drops to 2 via
    // lower only), so round 3 is the (l,o)=7 vs (o,w)=7 tie → (l,o),
    // and round 4 merges (lo,w)=7
    val merges = Bpe.learnMerges(toyHist, nMerges = 4)
    assert(merges == Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")),
      merges.toString)
  }

  test("driver-local and distributed learners produce identical merges") {
    val distributed = Bpe.learnMergesDistributed(toyHist, nMerges = 6,
      itersPerCut = 2)
    val local = Bpe.learnMerges(toyHist, nMerges = 6) // under driverMaxTypes
    assert(distributed == local, s"$distributed vs $local")
  }

  test("encode replays training segmentation for every training word") {
    val merges = Bpe.learnMerges(toyHist, nMerges = 8)
    // training applied merges rank by rank over types; encode must land
    // on the same pieces, and pieces must concatenate back to the word
    for (w <- Seq("low", "lower", "newest", "widest")) {
      val pieces = Bpe.encode(w, merges)
      assert(pieces.mkString("") == w, s"$w -> $pieces")
    }
    // "newest" contains the full est-merge chain
    assert(Bpe.encode("newest", merges).length < "newest".length)
  }

  test("encode handles unseen words (falls back toward characters)") {
    val merges = Bpe.learnMerges(toyHist, nMerges = 4)
    val pieces = Bpe.encode("stowest", merges)
    assert(pieces.mkString("") == "stowest")
    // the est merge still fires inside the unseen word
    assert(pieces.contains("est"), pieces.toString)
  }

  test("applyMerge is left-to-right on overlaps") {
    assert(Bpe.applyMerge(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(Bpe.applyMerge(Seq("a", "a", "a", "a"), "a", "a") == Seq("aa", "aa"))
  }

  test("wordHistogram drops empty tokens and counts occurrences") {
    val docs = Seq((1L, "a b a"), (2L, "   "), (3L, "b")).toDF("doc_id", "text")
    val h = Bpe.wordHistogram(docs, "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(h == Map("a" -> 2L, "b" -> 2L))
  }

  test("determinism: merge list is stable across repartitionings") {
    val base = Bpe.wordHistogram(
      graft.sources.Tables.documents(spark, sf0001), "text")
    val a = Bpe.learnMergesDistributed(base.repartition(7), 12, itersPerCut = 5)
    val b = Bpe.learnMergesDistributed(base.repartition(2), 12, itersPerCut = 16)
    val c = Bpe.learnMerges(base, 12)
    assert(a == b && b == c, s"$a\n$b\n$c")
  }
}
