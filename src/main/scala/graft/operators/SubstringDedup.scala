package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

import graft.plans.RollingHashes

/** Exact substring-level duplication (the character-level counterpart
  * of the token-passage census): find the literal strings that repeat
  * across (or within) documents — the signal behind
  * deduplicate-before-training (Lee et al. 2022, "Deduplicating
  * Training Data Makes Language Models Better", which mined exact
  * duplicated substrings with suffix arrays; here the same answers come
  * from rolling-hash window grouping, which Spark distributes
  * naturally).
  *
  * Two operators:
  *  - [[gramCensus]]: all length-L substrings occurring ≥ 2 times
  *    corpus-wide (fixed L ⇒ fully oracle-replayable in SQL by
  *    exploding `substr(text, i, L)`);
  *  - [[longestDup]]: the MAXIMUM length at which any duplicated
  *    substring exists, found by binary search on L over the census's
  *    existence bit — ⌈log₂(maxLen)⌉ corpus passes, never a suffix
  *    array in memory.
  *
  * 100 TB shape: each pass emits one (hash:int64, doc, pos) row per
  * character — a bounded-width shuffle keyed on the hash, with map-side
  * combine collapsing per-partition repeats; document TEXT never enters
  * the wide shuffle (only the few hash-hot positions join back to their
  * source rows to extract and value-verify the gram, eliminating
  * wrap-around collisions). For corpora where even that is too hot,
  * winnowing (Schleimer et al. 2003) — selecting the min-hash window
  * per w-window — cuts emitted positions ~2/(w+1) at the cost of a
  * guaranteed-detection length of L+w−1; the census here is the exact,
  * lossless form.
  */
object SubstringDedup {

  /** All length-L substrings occurring at least twice corpus-wide:
    * (gram, n_docs, n_occ), occurrences counted over every window
    * position (overlapping occurrences included, intra-document repeats
    * included — the suffix-array convention). Hash groups are
    * value-verified: a Long-wrap collision can only create a CANDIDATE,
    * never an output row.
    */
  def gramCensus(df: DataFrame, len: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(len >= 1, "gramCensus: len >= 1")
    // narrow: one row per window, carrying only (doc, pos, hash)
    val hashes = df.select(col(idCol).as("doc"),
      posexplode(RollingHashes(col(textCol), len)).as(Seq("pos", "h")))
    // hash-level pre-filter: counts shuffle as partially-combined longs
    val hot = hashes.groupBy("h").agg(count(lit(1)).as("c"))
      .filter(col("c") > 1)
      .select("h")
    // only hot positions rejoin their source text to extract the gram;
    // grouping on the VALUE removes hash collisions
    hashes.join(hot, Seq("h"), "left_semi")
      .join(df.select(col(idCol).as("doc"), col(textCol).as("t")), Seq("doc"))
      .select(col("doc"), F.substring(col("t"), col("pos") + 1, lit(len)).as("gram"))
      .groupBy("gram")
      .agg(countDistinct("doc").as("n_docs"), count(lit(1)).as("n_occ"))
      .filter(col("n_occ") > 1)
  }

  /** True iff any length-L substring occurs ≥ 2 times (value-verified). */
  def hasDupOfLen(df: DataFrame, len: Int,
      idCol: String = "doc_id", textCol: String = "text"): Boolean =
    gramCensus(df, len, idCol, textCol).limit(1).count() > 0

  /** Winnowing fingerprints (Schleimer et al. 2003): the selected
    * (position, hash) set per document — ~2/(w+1) of all g-gram hashes,
    * with the guarantee that any shared substring of length ≥ g + w − 1
    * yields a shared fingerprint. A narrow one-pass native map
    * ([[graft.plans.WinnowExpr]]); only the selected fingerprints ever
    * leave the scan.
    */
  def winnowedFingerprints(df: DataFrame, gram: Int = 8, window: Int = 4,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    df.select(col(idCol).as("doc"),
        explode(graft.plans.WinnowExpr(col(textCol), gram, window)).as("fp"))
      .select(col("doc"), col("fp.pos").as("pos"), col("fp.h").as("h"))

  /** Document pairs sharing at least `minShared` winnowed fingerprints
    * — the MOSS-style overlap report. The pair search is an equi-join
    * on the fingerprint hash (bucketed like the LSH/MinHash families:
    * candidates only ever meet inside a hash bucket, never all-pairs);
    * fingerprints are pre-deduplicated per doc so a long internal
    * repeat cannot inflate a pair's count.
    *
    * `dfCap`: the hot-bucket guard. A fingerprint present in d
    * documents emits d² candidate rows from the bucket join, so a
    * boilerplate phrase shared corpus-wide turns the join quadratic
    * (measured 80.7× wall-clock for 10× data on a closed-vocabulary
    * corpus). With dfCap set, fingerprints appearing in more than
    * `dfCap` documents are dropped from EVERY document's set before
    * pairing — MOSS's own stop-fingerprint move (Schleimer et al. §5
    * discard overly-common fingerprints as boilerplate), and the same
    * semantics-preserving-cap design as `CosinePairs.dfCap`: overlap
    * over the rare-fingerprint subspace, a well-defined pipeline a SQL
    * oracle replays exactly (HAVING count(*) <= cap), not a lossy
    * heuristic. Per-bucket fan-out is then ≤ dfCap² regardless of
    * corpus size, so total join volume grows with the number of
    * distinct fingerprints — linear in corpus. None = exact
    * full-fingerprint semantics (quadratic in hot buckets by nature).
    */
  def winnowedPairs(df: DataFrame, gram: Int = 8, window: Int = 4,
      minShared: Int = 2, dfCap: Option[Int] = None,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(dfCap.forall(_ >= 2), "winnowedPairs: dfCap >= 2 (df=1 never pairs)")
    val all = winnowedFingerprints(df, gram, window, idCol, textCol)
      .select("doc", "h").distinct()
    // document frequency per fingerprint: counts shuffle as combined
    // longs (map-side partials), never doc lists
    val fps = dfCap.fold(all) { c =>
      val rare = all.groupBy("h").agg(count(lit(1)).as("dfc"))
        .filter(col("dfc") <= c)
        .select("h")
      all.join(rare, Seq("h"), "left_semi")
    }
    val a = fps.select(col("doc").as("doc_a"), col("h"))
    val b = fps.select(col("doc").as("doc_b"), col("h"))
    a.join(b, Seq("h"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /** The longest duplicated substring length L* in [minLen, maxLen] and
    * its census: binary search on the monotone existence predicate (a
    * duplicate of length L contains duplicates of every shorter
    * length), then one final [[gramCensus]] at L*. Returns the L*
    * census with a `len` column; EMPTY when no duplicate of even
    * `minLen` exists. Driver state: two ints and one boolean per probe.
    */
  def longestDup(df: DataFrame, minLen: Int = 8, maxLen: Int = 4096,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(1 <= minLen && minLen <= maxLen, "1 <= minLen <= maxLen")
    val spark = df.sparkSession
    if (!hasDupOfLen(df, minLen, idCol, textCol)) {
      import spark.implicits._
      return Seq.empty[(Int, String, Long, Long)]
        .toDF("len", "gram", "n_docs", "n_occ")
    }
    // invariant: dup exists at lo, none at hi
    var lo = minLen
    var hi = maxLen + 1
    while (hi - lo > 1) {
      val mid = lo + (hi - lo) / 2
      if (hasDupOfLen(df, mid, idCol, textCol)) lo = mid else hi = mid
    }
    gramCensus(df, lo, idCol, textCol)
      .select(lit(lo).as("len"), col("gram"), col("n_docs"), col("n_occ"))
  }
}
