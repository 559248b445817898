package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming deduplication — the streaming twin of the batch dedup
  * family (`graft.ops.Dedup`): keep the first arrival per key, with
  * state bounded by the watermark.
  *
  * Scale contract: unbounded `dropDuplicates` state grows with
  * distinct-keys-ever-seen — at 100 TB/day that is a state-store OOM
  * by design. `dropDuplicatesWithinWatermark` drops a key's state once
  * the watermark passes its event time + delay, so state is bounded by
  * (arrival rate x watermark horizon) regardless of total corpus size.
  * The trade: a duplicate arriving AFTER the horizon is re-emitted —
  * the standard at-least-once-window dedup contract (downstream
  * idempotent sinks absorb it, see ModerationStream's foreachBatch).
  */
object StreamDedup {

  /** First arrival per `keys`, state bounded by `delay` past the
    * watermark on `eventTimeCol`.
    */
  def firstPerKey(
      df: DataFrame,
      eventTimeCol: String,
      delay: String,
      keys: Seq[String]): DataFrame =
    df.withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark(keys)

  /** One micro-batch of INCREMENTAL sub-document (CDC chunk) dedup —
    * the cdc_dedup twin of the signature-store loop: arriving
    * documents chunk content-defined ([[graft.ops.TextAnalysis
    * .cdcChunks]]), and a chunk OCCURRENCE is a duplicate iff an
    * occurrence with smaller (doc_id, chunk_idx) exists in the
    * persisted chunk store or earlier in this batch. Returns
    * (chunks-to-append, per-doc stats): the append frame holds ONLY
    * the batch's first occurrences — duplicates are already
    * represented, so the store stays bounded by DISTINCT chunk count
    * however duplicate-heavy the stream — and stats is
    * (doc_id, n_chunks, n_dup_chunks, dup_token_mass).
    *
    * Feeding id-ascending batches reproduces the batch
    * first-occurrence rule (the oracled cdc_novelty query) exactly —
    * pinned in StreamingSpec. At scale the store is partitioned by a
    * chunk_md5 prefix, so the probe is a hash join on 16-byte keys —
    * chunk bodies never shuffle, exactly as in the batch census.
    */
  def cdcBatch(
      batch: org.apache.spark.sql.DataFrame,
      store: org.apache.spark.sql.DataFrame)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val chunks = graft.ops.TextAnalysis.cdcChunks(batch)
    val w = Window.partitionBy("chunk_md5").orderBy("doc_id", "chunk_idx")
    val marked = chunks
      .join(store.select(col("chunk_md5")).distinct()
        .withColumn("in_store", lit(true)), Seq("chunk_md5"), "left")
      .withColumn("rn", row_number().over(w))
      .withColumn("dup", coalesce(col("in_store"), lit(false)) || col("rn") > 1)
    val stats = graft.ops.TextAnalysis.chunkDupStats(marked)
      .select("doc_id", "n_chunks", "n_dup_chunks", "dup_token_mass")
    val toAppend = marked.filter(!col("dup"))
      .select("doc_id", "chunk_idx", "n_tokens", "chunk_md5")
    (toAppend, stats)
  }
}
