package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH
  * near-dup, SimHash, and exact n-gram Jaccard (the verification oracle
  * for the approximate paths).
  *
  * Scale design (100 TB): exact dedup shuffles 32-byte digests, not
  * document bodies; MinHash/LSH shuffles k×8-byte signatures and joins on
  * (band, bucket) so candidate generation is O(collisions), never O(n²);
  * the exact-Jaccard verifier runs only on candidate pairs. The O(n²)
  * blocked variant exists for oracle verification at small SF only.
  */
object Dedup {

  // --- shingling ---------------------------------------------------------

  /** Distinct word n-gram shingles of a text column (empty when the text
    * has fewer than n tokens — `sequence` would otherwise run backwards).
    */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = split(trim(text), "\\s+")
    when(size(toks) >= n,
      array_distinct(
        transform(sequence(lit(0), size(toks) - lit(n)),
          i => concat_ws(" ", slice(toks, i + lit(1), lit(n))))))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact Jaccard similarity of two shingle-set columns. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_distinct(concat(a, b))).cast("double")

  // --- exact dedup -------------------------------------------------------

  /** Exact duplicate groups, shuffling only a content digest: returns
    * (keep_id, n_copies) per distinct content; keep_id = min id.
    */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(sha2(col(textCol), 256).as("content_sha"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** One surviving row per distinct content (drop exact duplicates,
    * keeping the lowest id deterministically).
    */
  def dropExact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val keep = exactGroups(df, textCol, idCol).select(col("keep_id").as(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  // --- MinHash + LSH -----------------------------------------------------

  private val MersennePrime31 = 2147483647L // 2^31 - 1

  /** k MinHash values over the shingle set: h_i(S) = min_{s∈S}
    * ((a_i · h(s) + b_i) mod p) with h = xxhash64 folded into [0, 2^31):
    * the 31-bit domain keeps a·h+b inside a long under ANSI arithmetic
    * (Spark 4 errors on silent overflow). Seeds are deterministic so
    * signatures are reproducible across runs/executors.
    */
  def minhashSignature(sh: Column, k: Int = 64): Column = {
    val rnd = new scala.util.Random(42)
    val params = Seq.fill(k)((math.abs(rnd.nextLong()) % (MersennePrime31 - 1) + 1,
      math.abs(rnd.nextLong()) % MersennePrime31))
    array(params.map { case (a, b) =>
      array_min(transform(sh,
        s => pmod(pmod(xxhash64(s), lit(MersennePrime31)) * lit(a) + lit(b),
          lit(MersennePrime31))))
    }: _*)
  }

  /** LSH banding: explode the signature into (band_id, band_hash) keys.
    * Two docs sharing any band bucket become a candidate pair.
    */
  def lshBands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band_id"),
        xxhash64(slice(sig, b * lit(rowsPerBand) + lit(1), lit(rowsPerBand)), b).as("band_hash")))

  /** Near-duplicate pairs by MinHash+LSH with exact-Jaccard verification
    * of candidates. Output: (id_a, id_b, jaccard) with id_a < id_b,
    * jaccard >= threshold.
    *
    * bands × rowsPerBand must equal the signature length; with 16×4 the
    * candidate-recall at j=0.8 is ≈ 1-(1-0.8^4)^16 ≈ 0.9997.
    */
  def minhashNearDups(
      df: DataFrame, textCol: String, idCol: String,
      threshold: Double = 0.5, numHashes: Int = 64,
      bands: Int = 16, shingleN: Int = 3): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val withSig = df.select(
      col(idCol).as("id"),
      shingles(col(textCol), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
    val buckets = withSig
      .select(col("id"), col("sh"),
        explode(lshBands(col("sig"), bands, rowsPerBand)).as("band"))
    val cands = buckets.as("l")
      .join(buckets.as("r"),
        col("l.band") === col("r.band") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        col("l.sh").as("sh_a"), col("r.sh").as("sh_b"))
      .dropDuplicates("id_a", "id_b")
    cands
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Exact O(block²) n-gram Jaccard pairs within blocking keys — the
    * ground truth the LSH path is tested against; only viable when blocks
    * are small (its purpose is verification, not the 100 TB path).
    */
  def ngramJaccardBlocked(
      df: DataFrame, textCol: String, idCol: String,
      blockCols: Seq[String], threshold: Double, shingleN: Int = 3): DataFrame = {
    val t = df.select(col(idCol).as("id"),
      shingles(col(textCol), shingleN).as("sh"), col("*"))
    val l = t.select(Seq(col("id").as("id_a"), col("sh").as("sh_a")) ++
      blockCols.map(col): _*)
    val r = t.select(Seq(col("id").as("id_b"), col("sh").as("sh_b")) ++
      blockCols.map(col): _*)
    l.join(r, blockCols).filter(col("id_a") < col("id_b"))
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  // --- SimHash -----------------------------------------------------------

  /** 64-bit SimHash over whitespace tokens: bit b is set when the sum of
    * ±1 votes (sign of token-hash bit b) is positive.
    */
  def simhash(text: Column): Column = {
    val toks = split(trim(text), "\\s+")
    val hashes = transform(toks, t => xxhash64(t))
    // static 64-way unroll: shift amounts must be literals for codegen
    (0 until 64).map { b =>
      val vote = aggregate(hashes, lit(0L),
        (s, h) => s + when(shiftright(h, b).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(vote > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs within blocking keys: hamming(sig) <= maxDist. */
  def simhashNearDups(
      df: DataFrame, textCol: String, idCol: String,
      blockCols: Seq[String], maxDist: Int = 12): DataFrame = {
    val t = df.withColumn("sig", simhash(col(textCol)))
    val l = t.select(Seq(col(idCol).as("id_a"), col("sig").as("sig_a")) ++
      blockCols.map(col): _*)
    val r = t.select(Seq(col(idCol).as("id_b"), col("sig").as("sig_b")) ++
      blockCols.map(col): _*)
    l.join(r, blockCols).filter(col("id_a") < col("id_b"))
      .withColumn("hamming", hamming(col("sig_a"), col("sig_b")))
      .filter(col("hamming") <= maxDist)
      .select("id_a", "id_b", "hamming")
  }
}
