package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Context-window chunking: split each document into overlapping
  * fixed-size token windows (size `chunkSize`, step `stride`) — the
  * standard pre-tokenization step for training-corpus preparation and
  * retrieval indexing (chunk, then embed/pack each chunk).
  *
  * Scale design (100 TB): a pure narrow map — tokenize once, generate
  * the start offsets with `sequence` (no join against a numbers table),
  * explode, slice. No shuffle at all; output order is inherited from
  * input splits, so downstream repartitioning is the caller's choice.
  * Overlap multiplies output bytes by ~chunkSize/stride — callers pick
  * stride accordingly (stride == chunkSize for disjoint windows).
  */
object Chunking {

  /** One row per (document, window): (idCol, chunk_id, n_tok,
    * chunk_text). Windows start at 0, stride, 2·stride, … while the
    * start lies inside the token array; the final window may be short
    * (it is kept, not dropped — training pipelines pad or pack it).
    */
  def chunkTokens(docs: DataFrame, textCol: String, idCol: String,
                  chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0, "chunkTokens: size and stride must be positive")
    docs
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("toks"))
      .select(col(idCol), col("toks"),
        explode(sequence(lit(0), greatest(size(col("toks")) - 1, lit(0)),
          lit(stride))).as("start"))
      .select(
        col(idCol),
        (col("start") / stride).cast("long").as("chunk_id"),
        size(slice(col("toks"), col("start") + 1, lit(chunkSize)))
          .cast("long").as("n_tok"),
        array_join(slice(col("toks"), col("start") + 1, lit(chunkSize)), " ")
          .as("chunk_text"))
  }
}
