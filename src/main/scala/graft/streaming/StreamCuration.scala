package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types._

import graft.queries.SelectionQueries

/** Streaming curation funnel — the streaming twin of the batch
  * `curation_funnel` composite: documents arrive in micro-batches and
  * the 5-stage census (dedup → quality → language → domain gate →
  * pack) stays LIVE, bit-exactly equal after any prefix of batches to
  * the batch query run over the documents seen so far — under ANY
  * arrival order (pinned in StreamingSpec).
  *
  * Split exactly like the other stream twins split their batch
  * queries (StreamSelect: train batch / score stream; StreamAnalyze:
  * register census / merge):
  *
  *  1. PROFILE (per arriving document, once): the heavy text work —
  *     tokenization, Gopher stats, bag-of-words fingerprint, URL →
  *     host → registrable-domain parse — runs through the BATCH
  *     projection verbatim ([[SelectionQueries.curationProfiles]]);
  *     a document's text is parsed exactly once and never re-read.
  *  2. RECOUNT (per micro-batch): the 5-row census recomputes from
  *     the compact profile ledger via the BATCH census verbatim
  *     ([[SelectionQueries.funnelCensus]]).
  *
  * The recount is the honest contract for this composite: the dedup
  * keep (lowest doc_id per fingerprint), the per-domain cap, and the
  * greedy packing are all RETROACTIVE under out-of-order arrival — a
  * late-arriving lower doc_id evicts a previously kept duplicate,
  * which can free a domain-cap slot, which shifts the packing cumsum
  * — so any "incremental" flag update would be a re-derivation in
  * disguise. What the twin makes incremental is the expensive part:
  * text parsing (once per doc) vs the census over fixed-width
  * integer/flag rows (the ledger holds ~40 bytes/doc, no text).
  *
  * Idempotency is STRUCTURAL (StreamMedia's ledger contract):
  * profiles are a pure function of the text and the ledger
  * overwrite-merges by doc_id, so a redelivered batch rewrites
  * identical rows and the census cannot drift — no batchId guard
  * needed.
  *
  * Scale shape: the ledger is a doc_id-keyed table (production: a
  * parquet/Delta table partitioned by hash(doc_id), appended via the
  * same anti-join-then-union merge); the recount's exchanges are the
  * batch funnel's own — fingerprint hash shuffle, (domain, salt) +
  * domain ranks, 8-shard packing — all parallel, nothing
  * single-partition but the 5-row funnel itself.
  */
object StreamCuration {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("lang", StringType),
    StructField("source", StringType), StructField("text", StringType)))

  /** Empty profile ledger with the exact curationProfiles schema. */
  def emptyLedger(spark: SparkSession): DataFrame =
    SelectionQueries.curationProfiles(
      spark.createDataFrame(spark.sparkContext
        .emptyRDD[Row], docSchema))

  /** One micro-batch step: profile the arriving documents through the
    * batch projection, overwrite-merge into the ledger by doc_id, and
    * recount. Returns (new ledger — lineage-truncated, so batch
    * chains do not accumulate plans — and the 5-row census).
    */
  def funnelBatch(batch: DataFrame, ledger: DataFrame): (DataFrame, DataFrame) = {
    val profiled = SelectionQueries.curationProfiles(
      batch.select(col("doc_id"), col("lang"), col("source"), col("text")))
    // overwrite merge: drop any ledger row the batch re-delivers, then
    // append the batch's (identical, by purity) fresh profiles
    val merged = ledger
      .join(profiled.select("doc_id"), Seq("doc_id"), "left_anti")
      .unionByName(profiled)
      .localCheckpoint(true)
    (merged, SelectionQueries.funnelCensus(merged))
  }

  /** Streaming wiring: checkpointed foreachBatch profiling each batch,
    * maintaining the ledger, and emitting (batchId, census rows) per
    * micro-batch. The census is 5 fixed rows — collecting it is the
    * same scale class as StreamMedia's rollup tuple.
    */
  def monitor(docs: DataFrame, checkpointDir: String)(
      sink: (Long, Array[Row]) => Unit): DataStreamWriter[Row] = {
    var ledger: DataFrame = null
    docs.writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        val base = if (ledger == null) emptyLedger(b.sparkSession) else ledger
        val (merged, census) = funnelBatch(b, base)
        ledger = merged
        sink(id, census.collect())
      }
      .option("checkpointLocation", checkpointDir)
  }

  /** The DURABLE wiring [[monitor]]'s doc promises: the profile ledger
    * is a VERSIONED parquet table, so a crash loses nothing and a
    * checkpoint-replayed batch cannot corrupt it. Batch `id` reads the
    * newest `v<k>` with k < id (after a crash that is the last version
    * the SURVIVING run committed — a half-written v<id> from the dying
    * run is simply overwritten) and writes `v<id>`; because profiles
    * are pure functions of the text and the merge is
    * anti-join-then-union, the replayed batch rewrites a bit-identical
    * version — idempotence by versioning, the parquet analogue of
    * KafkaEos' ledger markers. Production vacuums versions older than
    * the checkpoint horizon; at scale the table is hash-partitioned by
    * doc_id and the rewrite is an incremental MERGE, same shape.
    */
  def monitorDurable(docs: DataFrame, checkpointDir: String,
                     ledgerDir: String)(
      sink: (Long, Array[Row]) => Unit): DataStreamWriter[Row] =
    docs.writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        val spark = b.sparkSession
        // version listing through the Hadoop FileSystem API, so the
        // ledger lives wherever the cluster's storage does (HDFS, s3a,
        // local) — not only on the driver's local disk
        val dir = new org.apache.hadoop.fs.Path(ledgerDir)
        val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
        val prior =
          if (!fs.exists(dir)) Array.empty[Long]
          else fs.listStatus(dir).map(_.getPath.getName)
            .collect { case s if s.startsWith("v") => s.drop(1).toLong }
            .filter(_ < id)
        val base =
          if (prior.isEmpty) emptyLedger(spark)
          else spark.read.parquet(s"$ledgerDir/v${prior.max}")
        val (merged, census) = funnelBatch(b, base)
        merged.write.mode("overwrite").parquet(s"$ledgerDir/v$id")
        sink(id, census.collect())
      }
      .option("checkpointLocation", checkpointDir)
}
