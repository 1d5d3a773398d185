package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Continuous training-corpus ingestion: a document file stream runs
  * through a quality gate and (near-)dedup, and appends only genuinely
  * new documents to the corpus table.
  *
  *   readStream(parquet) → token-count quality gate → sha-256 digest
  *   → foreachBatch { within-batch resolve → screens vs landed state
  *     → bloom update → index append → docs append }
  *
  * The dedup STATE lives under the sink directory — each micro-batch
  * screens against what has already landed, not against an in-memory
  * map. That buys the two properties a long-running ingest needs:
  * state survives restarts for free (it IS the table), and a
  * micro-batch REPLAYED after a crash between sink-append and
  * checkpoint-commit converges (see the write-order analysis on
  * [[ingestBatch]]) — effectively-once output from an at-least-once
  * replay, the same contract the keyed upserts in [[MessagePipeline]]
  * provide, realized for an append-only table.
  *
  * ## Landed layout (all under one corpus dir)
  *
  * {{{
  *   corpusDir/
  *     dbucket=<k>/part-*.parquet   docs, partitioned by digest bucket
  *     _graft_index/bbucket=<k>/    (band, digest, sig) rows,
  *                                  partitioned by band bucket
  *     _graft_bloom/bloom.bin       merged Bloom over digest-hash +
  *                                  band keys of everything landed
  *     _graft_bloom/meta            "capacity inserted"
  *     _graft_meta                  layout constants (bucket count)
  * }}}
  *
  * Underscore-prefixed children are invisible to Spark's file listing,
  * so `spark.read.parquet(corpusDir)` still yields exactly the docs
  * table (plus its `dbucket` partition column).
  *
  * ## Why this probe shape survives 100 TB
  *
  * The naive screen re-reads the whole landed table every micro-batch
  * — per-batch cost grows with everything ever ingested, unbounded
  * over the stream's lifetime. Here the probe cost tracks the BATCH:
  *
  *  1. BLOOM PREFILTER (first pass, cheapest): a broadcast Bloom over
  *     every landed digest-hash and band key. A doc none of whose keys
  *     might be present is DEFINITELY novel and skips the landed read
  *     entirely; a batch with no possible hits reads ZERO landed
  *     files. In the steady state of corpus growth (mostly-novel
  *     batches) this is the common path. False positives only fall
  *     through to the verified probe — never a correctness risk.
  *  2. PARTITION PRUNING (the probe itself): docs are partitioned by
  *     `dbucket = pmod(xxhash64(digest), buckets)` and index rows by
  *     `bbucket = pmod(band, buckets)`; the probe filters each read
  *     with a LITERAL `isin` over the batch's own buckets, so the scan
  *     lists and reads only the touched partition directories.
  *  3. VERIFIED REJECTION: a band hit is only a CANDIDATE — the probe
  *     joins the candidate's stored MinHash signature and rejects only
  *     when signature agreement (the unbiased Jaccard estimate) is at
  *     least `threshold`. An unverified band hit is ~J^(1/rowsPerBand)
  *     evidence, and its false-reject rate would otherwise GROW with
  *     corpus size (union bound over ever-more landed docs).
  *
  * The Bloom is maintained incrementally (one merge + rewrite per
  * batch, written BEFORE the appends — the safe direction: a crash
  * leaves spurious positives, which the verified probe resolves, never
  * false negatives). When inserts outgrow capacity it is rebuilt from
  * the landed table at doubled capacity — O(corpus) work amortized
  * O(1) per doc, the classic doubling move.
  */
object CorpusIngest {

  /** documents-table schema (file streams must declare it up front). */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Quality gate + digest, the per-row (narrow) stage. */
  def prepared(docs: DataFrame, minTokens: Int): DataFrame =
    docs.withColumn("n_tokens",
        size(split(trim(col("text")), "\\s+")).cast("long"))
      .filter(col("n_tokens") >= minTokens)
      .withColumn("digest", sha2(col("text"), 256))

  /** Within-batch dedup: one survivor per digest, deterministically the
    * smallest doc_id (min over structs — no window, partial-agg
    * friendly, and replay-stable under any partitioning).
    */
  def resolveBatch(batch: DataFrame): DataFrame =
    batch.groupBy("digest")
      .agg(min(struct(col("doc_id"), col("text"), col("lang"),
        col("source"), col("n_chars"), col("n_tokens"))).as("r"))
      .select(col("digest"), col("r.*"))

  /** Per-batch probe/append telemetry — the observable the
    * flat-probe property is asserted on (CorpusIngestSpec): for
    * all-novel batches `landedFilesRead`/`indexFilesRead` are 0 no
    * matter how large the landed corpus has grown; for batches with
    * possible hits they count only the files in the batch's own
    * partition buckets.
    */
  final case class IngestStats(
      batchRows: Long,
      acceptedRows: Long,
      bloomNegative: Long,
      probed: Long,
      landedFilesRead: Long,
      indexFilesRead: Long)

  /** Default partition-bucket count for both digest and band buckets.
    * Sized to the shuffle parallelism here; a petabyte corpus wants
    * more (buckets bound probe read amplification to ~corpus/buckets
    * per touched bucket, and the batch touches at most `buckets`).
    * Fixed per corpus at first write (persisted in `_graft_meta`).
    */
  val DefaultBuckets = 32

  /** Bloom false-positive rate. Each doc probes ~(1 + bands) keys, so
    * the per-DOC false-flag rate is ~17× this; 1e-4 keeps mostly-novel
    * batches genuinely zero-probe (~0.2% of docs flagged) at ~19
    * bits/key — ~4 GB for a 10⁸-doc corpus's 1.7×10⁹ keys, still a
    * broadcastable sketch. A fleet that outgrows that trades fpp up:
    * probes stay batch-proportional either way, only the zero-read
    * fraction shrinks.
    */
  private val BloomFpp = 1e-4
  private val Bands = 16
  private val RowsPerBand = 4

  // --- landed-state plumbing (hadoop FS so HDFS-style dirs work) --------

  private def fsOf(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def readSmall(spark: SparkSession, p: Path): Option[Array[Byte]] = {
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](64 * 1024)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        Some(out.toByteArray)
      } finally in.close()
    }
  }

  /** Write-then-rename (delete + rename on filesystems without
    * overwriting rename). A crash in the tiny delete/rename window
    * leaves the file ABSENT, which every reader treats conservatively
    * (no bloom → probe everything; no meta → adopt caller's buckets).
    */
  private def writeSmall(spark: SparkSession, p: Path, bytes: Array[Byte]): Unit = {
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(p.getParent, p.getName + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(bytes) finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    fs.rename(tmp, p)
    ()
  }

  /** Bucket count the corpus was laid out with: adopted from
    * `_graft_meta` when present (a probe computed with a different
    * modulus would prune the WRONG partitions and silently re-admit
    * duplicates), else pinned to `requested` on first write.
    */
  private def layoutBuckets(spark: SparkSession, corpusDir: String,
      requested: Int): Int = {
    val p = new Path(corpusDir, "_graft_meta")
    readSmall(spark, p) match {
      case Some(b) => new String(b, "UTF-8").trim.toInt
      case None =>
        writeSmall(spark, p, s"$requested".getBytes("UTF-8"))
        requested
    }
  }

  private def loadBloom(spark: SparkSession,
      corpusDir: String): Option[(BloomFilter, Long, Long)] = {
    val dir = new Path(corpusDir, "_graft_bloom")
    for {
      meta <- readSmall(spark, new Path(dir, "meta"))
      bin <- readSmall(spark, new Path(dir, "bloom.bin"))
    } yield {
      val Array(cap, ins) = new String(meta, "UTF-8").trim.split(" ").map(_.toLong)
      (BloomFilter.readFrom(new java.io.ByteArrayInputStream(bin)), cap, ins)
    }
  }

  private def writeBloom(spark: SparkSession, corpusDir: String,
      bf: BloomFilter, capacity: Long, inserted: Long): Unit = {
    val dir = new Path(corpusDir, "_graft_bloom")
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    // bloom first, meta second: a crash between leaves a readable
    // bloom with stale (smaller) counts — only delays the next rebuild
    writeSmall(spark, new Path(dir, "bloom.bin"), out.toByteArray)
    writeSmall(spark, new Path(dir, "meta"),
      s"$capacity $inserted".getBytes("UTF-8"))
  }

  /** Distributed Bloom build over long keys: per-partition filters of
    * identical size (same capacity/fpp ⇒ mergeable) OR-merged on the
    * driver — no key ever collects.
    */
  private def bloomOf(keys: DataFrame, capacity: Long): BloomFilter = {
    import keys.sparkSession.implicits._
    keys.select(col("k")).as[Long].rdd.treeAggregate(
      BloomFilter.create(capacity, BloomFpp))(
      (bf, k) => { bf.putLong(k); bf },
      (a, b) => { a.mergeInPlace(b); a })
  }

  /** All bloom keys of a landed-or-accepted frame: the digest hash
    * plus every band key (absent/empty bands contribute nothing).
    */
  private def bloomKeys(df: DataFrame, withBands: Boolean): DataFrame = {
    val keyArr =
      if (withBands)
        concat(array(xxhash64(col("digest"))),
          coalesce(col("bands"), array().cast("array<bigint>")))
      else array(xxhash64(col("digest")))
    df.select(explode(keyArr).as("k"))
  }

  /** Files currently in the given partition-bucket directories of
    * `root` — what a pruned probe over those buckets reads.
    */
  private def filesInBuckets(spark: SparkSession, root: String,
      partCol: String, buckets: Seq[Int]): Long = {
    val fs = fsOf(spark, root)
    buckets.map { b =>
      val p = new Path(root, s"$partCol=$b")
      if (fs.exists(p))
        fs.listStatus(p).count(s => s.isFile &&
          !s.getPath.getName.startsWith("_") &&
          !s.getPath.getName.startsWith("."))
      else 0
    }.sum.toLong
  }

  private def existingParquet(spark: SparkSession, dir: String): Option[DataFrame] =
    try Some(spark.read.parquet(dir))
    catch { case _: org.apache.spark.sql.AnalysisException => None }

  // --- the per-batch stage ----------------------------------------------

  /** Resolve, screen, and append one micro-batch against the landed
    * corpus at `corpusDir`; returns probe/append telemetry. Shared by
    * the exact ([[start]]) and near-dup ([[startNearDup]]) streams —
    * `threshold = None` disables the band machinery.
    *
    * WRITE ORDER and crash-replay convergence (batch resolution is a
    * pure function of the batch, so a replay resolves identically):
    *
    *  1. bloom (spurious positives only — resolved by the probe);
    *  2. index rows (a replay that finds its OWN phantom index rows
    *     excludes digest-equal candidates, and phantom rows of a
    *     same-batch NEIGHBOR can never verify ≥ threshold — in-batch
    *     pairing already clustered any pair that could, using the SAME
    *     agreement measure; the only residue of a crash here is a
    *     duplicate index row per re-appended doc, bounded by crash
    *     count, semantically idempotent through the distinct());
    *  3. docs last — the exact screen keys on the DOCS table, so only
    *     a fully-landed batch screens its own replay out, and a replay
    *     of any partial crash still lands the documents.
    */
  def ingestBatch(batch: DataFrame, corpusDir: String,
      threshold: Option[Double] = Some(0.5),
      buckets: Int = DefaultBuckets): IngestStats = {
    import graft.operators.Dedup
    val spark = batch.sparkSession
    val nb = layoutBuckets(spark, corpusDir, buckets)
    val resolved0 = resolveBatch(batch)

    // within-batch near-dup resolution + per-doc band/sig state, from
    // ONE signature pass (the narrow shingle+minhash stage dominates
    // per-batch CPU)
    val (withState0, sigRelease) = threshold match {
      case Some(t) =>
        val sigs = Dedup.docSignatures(resolved0, "text", "doc_id").persist()
        val pairs = Dedup.pairsByAgreement(sigs, t, Bands, RowsPerBand)
        val resolved = Dedup.resolveClusters(resolved0, "doc_id", pairs)
        val bandsOf = sigs.select(col("id").as("doc_id"), col("sig"),
          Dedup.lshBands(col("sig"), Bands, RowsPerBand).as("bands"))
        val ws = resolved.join(bandsOf, Seq("doc_id"), "left")
          .withColumn("bands",
            coalesce(col("bands"), array().cast("array<bigint>")))
        (ws, () => { sigs.unpersist(); () })
      case None => (resolved0, () => ())
    }
    // bucket columns are INT end to end: partition-directory values
    // re-infer as int on read, and a long batch side would wrap the
    // landed attribute in a cast that can defeat partition pruning
    val withState = withState0
      .withColumn("dbucket",
        pmod(xxhash64(col("digest")), lit(nb.toLong)).cast("int"))
      .persist()
    var candidatesP: Option[DataFrame] = None
    try {
      val batchRows = withState.count()

      // ---- bloom gate: definitely-novel docs skip the probes ----
      val bloomState = loadBloom(spark, corpusDir)
      val hasBands = threshold.isDefined
      val flagged = bloomState match {
        case Some((bf, _, _)) =>
          val bfB = spark.sparkContext.broadcast(bf)
          val maybe = udf((ks: Seq[Long]) =>
            ks.exists(k => bfB.value.mightContainLong(k)))
          val keyArr: Column =
            if (hasBands) concat(array(xxhash64(col("digest"))), col("bands"))
            else array(xxhash64(col("digest")))
          withState.withColumn("__maybe", maybe(keyArr))
        case None =>
          // no bloom (first batch, or mid-crash absence): conservative
          // — everything probes; correctness never rests on the bloom
          withState.withColumn("__maybe", lit(true))
      }
      val candidates = flagged.filter(col("__maybe")).drop("__maybe").persist()
      candidatesP = Some(candidates)
      val probed = candidates.count()
      val bloomNegative = batchRows - probed
      val definiteFresh = flagged.filter(!col("__maybe")).drop("__maybe")

      var landedFiles = 0L
      var indexFiles = 0L
      val screened: DataFrame =
        if (probed == 0) candidates
        else existingParquet(spark, corpusDir) match {
          case None => candidates
          case Some(landedAll) =>
            // exact screen: pruned digest anti-join — only the batch's
            // own digest buckets are listed and read
            val dbuckets = candidates.select("dbucket").distinct()
              .collect().map(_.getInt(0)).toSeq // bounded by `nb`
            landedFiles = filesInBuckets(spark, corpusDir, "dbucket", dbuckets)
            val landed = landedAll
              .filter(col("dbucket").isin(dbuckets: _*)).select("digest")
            val freshExact = candidates.join(landed, Seq("digest"), "left_anti")
            threshold match {
              case Some(t) =>
                val idxDir = s"$corpusDir/_graft_index"
                existingParquet(spark, idxDir) match {
                  case None => freshExact
                  case Some(idxAll) =>
                    val bb = freshExact
                      .select(explode(col("bands")).as("band"))
                      .select(pmod(col("band"), lit(nb.toLong)).cast("int")
                        .as("bbucket"))
                      .distinct().collect().map(_.getInt(0)).toSeq
                    indexFiles = filesInBuckets(spark, idxDir, "bbucket", bb)
                    val idx = idxAll.filter(col("bbucket").isin(bb: _*))
                      .select(col("band"), col("digest").as("h_digest"),
                        col("sig").as("h_sig"))
                    // band hit = candidate; reject only on verified
                    // agreement; digest-equal rows are a replay's own
                    // phantom index entries, never a reject reason
                    val colliding = freshExact
                      .select(col("doc_id"), col("digest"), col("sig"),
                        explode(col("bands")).as("band"))
                      .join(idx, Seq("band"))
                      .filter(col("h_digest") =!= col("digest"))
                      .filter(Dedup.sigAgreement(col("sig"), col("h_sig")) >= t)
                      .select("doc_id").distinct()
                    freshExact.join(colliding, Seq("doc_id"), "left_anti")
                }
              case None => freshExact
            }
        }

      val accepted = definiteFresh.unionByName(screened).persist()
      try {
        val acceptedRows = accepted.count()
        if (acceptedRows > 0) {
          // ---- 1. bloom (before any append — see write order) ----
          val keys = bloomKeys(accepted, hasBands).persist()
          val nKeys = keys.count()
          val (mergedBloom, cap, ins) = bloomState match {
            case Some((bf, cap0, ins0)) if ins0 + nKeys <= cap0 =>
              val delta = bloomOf(keys, cap0)
              delta.mergeInPlace(bf)
              (delta, cap0, ins0 + nKeys)
            case other =>
              // absent (first batch / legacy corpus) or over capacity:
              // rebuild from the landed table + this batch at doubled
              // size — O(corpus) amortized O(1)/doc
              val landedKeys = existingParquet(spark, corpusDir)
                .map(l => bloomKeys(
                  if (hasBands) l.select(col("digest"), col("bands"))
                  else l.select(col("digest")), hasBands))
              val nLanded = landedKeys.map(_.count()).getOrElse(0L)
              val prevCap = other.map(_._2).getOrElse(0L)
              val cap1 = math.max(math.max(2 * prevCap, 1L << 17),
                2 * (nLanded + nKeys))
              val all = landedKeys.fold(keys)(lk => keys.unionByName(lk))
              (bloomOf(all, cap1), cap1, nLanded + nKeys)
          }
          writeBloom(spark, corpusDir, mergedBloom, cap, ins)
          keys.unpersist()

          // ---- 2. index rows (near-dup state), pruned-layout append ----
          if (hasBands) {
            accepted.filter(size(col("bands")) > 0)
              .select(explode(col("bands")).as("band"), col("digest"),
                col("sig"))
              .withColumn("bbucket",
                pmod(col("band"), lit(nb.toLong)).cast("int"))
              .write.partitionBy("bbucket").mode("append")
              .parquet(s"$corpusDir/_graft_index")
          }

          // ---- 3. docs last ----
          accepted.drop("sig")
            .write.partitionBy("dbucket").mode("append").parquet(corpusDir)
        }
        IngestStats(batchRows, acceptedRows, bloomNegative, probed,
          landedFiles, indexFiles)
      } finally { accepted.unpersist(); () }
    } finally {
      candidatesP.foreach(_.unpersist())
      withState.unpersist()
      sigRelease()
    }
  }

  /** Start the checkpointed NEAR-DUP ingest over `sourceDir`: the
    * shared stream scaffolding with [[ingestBatch]] (verified band
    * screen) as the per-batch stage. The landed `bands` column plus
    * the `_graft_index`/`_graft_bloom` state under the corpus dir is
    * the whole near-dup state; restarts and replays follow
    * [[ingestBatch]]'s write-order convergence argument.
    */
  def startNearDup(
      spark: SparkSession,
      sourceDir: String,
      corpusDir: String,
      checkpointDir: String,
      minTokens: Int = 5,
      threshold: Double = 0.5,
      maxFilesPerTrigger: Option[Int] = None,
      trigger: Trigger = Trigger.AvailableNow(),
      buckets: Int = DefaultBuckets): StreamingQuery =
    startStream(spark, sourceDir, checkpointDir, minTokens,
      maxFilesPerTrigger, trigger) { batch =>
      ingestBatch(batch, corpusDir, Some(threshold), buckets)
      ()
    }

  /** Start the checkpointed EXACT-dedup ingest over `sourceDir`. */
  def start(
      spark: SparkSession,
      sourceDir: String,
      corpusDir: String,
      checkpointDir: String,
      minTokens: Int = 5,
      maxFilesPerTrigger: Option[Int] = None,
      trigger: Trigger = Trigger.AvailableNow(),
      buckets: Int = DefaultBuckets): StreamingQuery =
    startStream(spark, sourceDir, checkpointDir, minTokens,
      maxFilesPerTrigger, trigger) { batch =>
      ingestBatch(batch, corpusDir, None, buckets)
      ()
    }

  /** Shared reader/writer scaffolding of both starters: schema-declared
    * file stream → quality gate → checkpointed foreachBatch running
    * `perBatch`. One copy, so stream-setup fixes cannot silently miss
    * a variant.
    */
  private def startStream(
      spark: SparkSession,
      sourceDir: String,
      checkpointDir: String,
      minTokens: Int,
      maxFilesPerTrigger: Option[Int],
      trigger: Trigger)(perBatch: DataFrame => Unit): StreamingQuery = {
    val reader = spark.readStream.schema(schema)
    val stream = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .parquet(sourceDir)
    prepared(stream, minTokens).writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) => perBatch(batch); () }
      .start()
  }
}
