package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Continuous training-corpus ingestion: a document file stream runs
  * through a quality gate and exact dedup, and appends only genuinely
  * new documents to the corpus table.
  *
  *   readStream(parquet) → token-count quality gate → sha-256 digest
  *   → foreachBatch { within-batch resolve → anti-join vs landed
  *     corpus → append }
  *
  * The dedup STATE is the sink itself — each micro-batch anti-joins its
  * digests against what has already landed, not against an in-memory
  * map. That buys the two properties a long-running ingest needs:
  * state survives restarts for free (it IS the table), and a micro-batch
  * REPLAYED after a crash between sink-append and checkpoint-commit is
  * a no-op (its rows are landed, so the anti-join drops them) —
  * effectively-once output from an at-least-once replay, the same
  * contract the keyed upserts in [[MessagePipeline]] provide, realized
  * for an append-only table.
  *
  * Design note: this is the state-in-SINK variant; the sibling
  * state-in-INDEX design (a separate persisted digest table extended
  * after each landing, [[graft.operators.Dedup.incrementalIngestDigests]]
  * driven from foreachBatch, StreamingIngestSpec) trades an extra table
  * for a probe side that stays digest-only even when the corpus schema
  * is wide. Both converge under replay; this one has no second table to
  * keep transactionally ordered with the sink.
  *
  * Scale shape: the anti-join carries 32-byte digests, never document
  * bodies (the probe side projects `digest` only), and the within-batch
  * resolve is a `min(struct)` partial aggregate keyed by digest —
  * deterministic (smallest doc_id wins), map-side combined. At corpus
  * scale the landed-digest probe is the same Bloom-prefilter candidate
  * as [[graft.operators.Dedup.ingestIncremental]]; the file source's
  * `maxFilesPerTrigger` caps per-batch work so one huge drop cannot
  * OOM an executor fleet.
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

  /** New-to-the-corpus filter: anti-join on digest against the landed
    * table (digest column only crosses the join). Missing corpus dir =
    * first batch ever = everything is new.
    */
  def freshOnly(batch: DataFrame, corpusDir: String): DataFrame = {
    val spark = batch.sparkSession
    val landed =
      try Some(spark.read.parquet(corpusDir).select("digest"))
      catch { case _: org.apache.spark.sql.AnalysisException => None }
    landed match {
      case Some(seen) => batch.join(seen, Seq("digest"), "left_anti")
      case None => batch
    }
  }

  /** NEAR-DUP-aware variant of the per-batch resolve/screen/append:
    * the landed corpus table carries each document's LSH band-key
    * array ([[graft.operators.Dedup.bandKeysCol]]) beside its digest,
    * so ONE transactional append maintains both the exact and the
    * near-dup state — there is no separate index table whose ordering
    * with the sink a crash could split. The batch first resolves
    * internally (exact digest min-id, then verified near-dup clusters
    * at `threshold`), and only the resolved survivors are screened
    * against the landed state: digest anti-join (exact replays) and
    * band semi-join (near-dups of the corpus). Because resolution is a
    * pure function of the batch alone, a crash-replayed micro-batch
    * resolves identically and every survivor is then dropped against
    * its own landed output — effectively-once even for transitive
    * in-batch clusters (A-B-C chains), which a screen-before-resolve
    * order would re-admit piecemeal on replay. Probe sides project
    * only `digest` / exploded `band` — bodies never shuffle against
    * history.
    */
  def resolveNearDup(batch: DataFrame, corpusDir: String,
      threshold: Double = 0.5): DataFrame = {
    import graft.operators.Dedup
    val spark = batch.sparkSession
    // within-batch resolution FIRST (exact digest min-id via
    // resolveBatch, then verified near-dup clusters): acceptance of a
    // doc must never depend on a batch member the landed-state screen
    // rejects, or a crash-replayed batch could admit a doc the
    // original run rejected through a cluster chain (A-B-C where only
    // A landed: on replay B is band-screened away and C would sail
    // through if pairing ran after the screen). Resolving first makes
    // the screen a pure function of (resolved batch, landed state),
    // and a replayed batch resolves identically — so every survivor is
    // then digest- or band-dropped against its own landed output.
    val resolved0 = resolveBatch(batch)
    // ONE signature pass feeds pairing AND the stored band keys (the
    // narrow shingle+minhash stage dominates per-batch CPU; computing
    // it twice — once in the pair search, once for bandKeysCol — would
    // double it). The pair plan is consumed eagerly by the components
    // loop under the persist; the band projection re-derives from the
    // cached sigs, with at most one post-release recomputation of a
    // narrow map at write time.
    val sigs = Dedup.docSignatures(resolved0, "text", "doc_id")
    val (pairs, release) = Dedup.minhashPairsFromSigs(sigs, threshold,
      bands = 16, rowsPerBand = 4)
    val resolved = Dedup.resolveClusters(resolved0, "doc_id", pairs)
    // ONE read of the landed corpus serves both screens (digest
    // anti-join + band semi-join project different columns from the
    // same relation; the parquet footer/file listing is paid once)
    val landed =
      try Some(spark.read.parquet(corpusDir))
      catch { case _: org.apache.spark.sql.AnalysisException => None }
    val bandsOf = sigs.select(col("id").as("doc_id"),
      Dedup.lshBands(col("sig"), bands = 16, rowsPerBand = 4).as("bands"))
    val withBands = resolved.join(bandsOf, Seq("doc_id"), "left")
      .withColumn("bands",
        coalesce(col("bands"), array().cast("array<bigint>")))
    release()
    landed match {
      case Some(corp) =>
        val freshByDigest = withBands.join(
          corp.select("digest"), Seq("digest"), "left_anti")
        val colliding = freshByDigest
          .select(col("doc_id"), explode(col("bands")).as("band"))
          .join(corp.select(explode(col("bands")).as("band")),
            Seq("band"), "left_semi")
          .select("doc_id").distinct()
        freshByDigest.join(colliding, Seq("doc_id"), "left_anti")
      case None => withBands
    }
  }

  /** Start the checkpointed NEAR-DUP ingest over `sourceDir`: the
    * [[start]] pipeline with [[resolveNearDup]] as the per-batch
    * stage. The landed table's extra `bands` column is the whole
    * near-dup state; restarts and replays inherit [[start]]'s
    * effectively-once story unchanged.
    */
  def startNearDup(
      spark: SparkSession,
      sourceDir: String,
      corpusDir: String,
      checkpointDir: String,
      minTokens: Int = 5,
      threshold: Double = 0.5,
      maxFilesPerTrigger: Option[Int] = None,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    startStream(spark, sourceDir, checkpointDir, minTokens,
      maxFilesPerTrigger, trigger) { batch =>
      resolveNearDup(batch, corpusDir, threshold)
        .write.mode("append").parquet(corpusDir)
    }

  /** Start the checkpointed ingest over `sourceDir`. */
  def start(
      spark: SparkSession,
      sourceDir: String,
      corpusDir: String,
      checkpointDir: String,
      minTokens: Int = 5,
      maxFilesPerTrigger: Option[Int] = None,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    startStream(spark, sourceDir, checkpointDir, minTokens,
      maxFilesPerTrigger, trigger) { batch =>
      freshOnly(resolveBatch(batch), corpusDir)
        .write.mode("append").parquet(corpusDir)
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
