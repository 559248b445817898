package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PortableHash.h32

/** Streaming data selection — the streaming twin of `dsir_select`
  * (DSIR importance resampling, Xie et al. NeurIPS 2023).
  *
  * The production deployment splits DSIR in two:
  *  1. TRAIN (batch, rare): derive the per-bucket log-likelihood-ratio
  *    vector λ from corpus-level target/raw counts — B integer
  *    micro-unit values, a pure function of the corpus
  *    (`graft.queries.SelectionQueries` "dsir_select" builds it).
  *  2. SCORE (streaming, forever): every arriving document gets
  *    score = Σ_tokens λ[h32(token) % B] — a pure per-row fold
  *    against the λ table, no state, no shuffle, no aggregation.
  *
  * This module is step 2. λ rides into the stream as a map literal
  * (B entries — the same broadcast-a-dimension contract as the
  * moderation word list): scoring is STATELESS row-local math, so the
  * streaming query needs no watermark, no state store, and keeps
  * exactly the batch scores (integer micro-units — parity is
  * bit-exact, pinned in StreamingSpec). Keep/drop at a threshold then
  * composes with any downstream sink.
  *
  * The per-row fold uses the interpreted higher-order `aggregate`
  * (map lookups per token). That is the right trade HERE: scoring is
  * one pass over each document ever, λ never changes mid-stream, and
  * the alternative (explode + join + re-aggregate per micro-batch)
  * pays a shuffle per batch for the same answer.
  */
object StreamSelect {

  /** λ lookup as a map column literal: bucket -> micro-unit log-ratio. */
  def lamMap(lam: Map[Long, Long]): Column =
    map(lam.toSeq.sortBy(_._1)
      .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)

  /** score_u = Σ_tokens λ[h32(tok) % buckets], 0 for unseen buckets —
    * identical micro-unit integers to the batch dsir_select scorer.
    */
  def scoreU(text: Column, lam: Map[Long, Long], buckets: Int): Column = {
    val m = lamMap(lam) // one literal map node, constant-folded once
    aggregate(
      split(text, " "),
      lit(0L),
      (acc, tok) => acc +
        coalesce(element_at(m, h32(tok) % buckets), lit(0L)))
  }

  /** (doc_id, lang, score_u) for every arriving document — works
    * identically on a batch or streaming frame (same plan, no state).
    */
  def scored(docs: DataFrame, lam: Map[Long, Long], buckets: Int): DataFrame =
    docs.select(col("doc_id"), col("lang"),
      scoreU(col("text"), lam, buckets).as("score_u"))

  /** One micro-batch of INCREMENTAL SemDeDup — the foreachBatch body
    * of a streaming keep-list (the semdedup_keep twin, same shape as
    * the incremental-dedup signature-store loop):
    *
    *  - `store` holds every vector SEEN so far (kept or dropped —
    *    the batch query's greedy rule drops v when ANY lower-id
    *    clustermate is near, so parity requires probing dropped
    *    vectors too; the keep flag is the OUTPUT, not the store
    *    membership),
    *  - a new vector survives iff no near-dup (cosine >= tau) exists
    *    in its coarse cluster among stored vectors or lower-vec_id
    *    batchmates,
    *  - the caller appends the WHOLE batch (with cluster ids) to the
    *    store and emits only the survivors.
    *
    * Feeding id-ascending batches reproduces the batch
    * semdedup_keep keep-list exactly (pinned in StreamingSpec). At
    * scale the store is PARTITIONED BY cl, so the probe join is
    * partition-pruned to the batch's clusters.
    *
    * Returns (assigned, kept): the cluster-assigned batch to append,
    * and its surviving rows.
    */
  def semdedupBatch(
      batch: DataFrame,
      store: DataFrame,
      centroids: Array[Array[Double]],
      tau: Double): (DataFrame, DataFrame) = {
    import graft.ops.Similarity
    val b = batch.select(col("vec_id"), col("embedding"),
      graft.functions.CentroidAssign(col("embedding"), centroids).as("cl"))
    val prior = store.select(col("cl"), col("embedding").as("se"))
    val nearStore = b.join(prior, Seq("cl"))
      .filter(Similarity.cosine(col("embedding"), col("se")) >= tau)
      .select("vec_id").distinct()
    val lower = b.select(col("cl"), col("vec_id").as("va"),
      col("embedding").as("ea"))
    val nearBatch = b.join(lower, Seq("cl"))
      .filter(col("va") < col("vec_id"))
      .filter(Similarity.cosine(col("ea"), col("embedding")) >= tau)
      .select("vec_id").distinct()
    val kept = b.join(nearStore.union(nearBatch).distinct(),
      Seq("vec_id"), "left_anti")
    (b, kept)
  }
}
