package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types._

import graft.queries.SelectionQueries

/** Streaming curation funnel — the streaming twin of the batch
  * `curation_funnel` composite: documents arrive in micro-batches and
  * the 6-stage census (dedup → quality → language → decontamination
  * gate → domain gate → pack) stays LIVE, bit-exactly equal after any
  * prefix of batches to the batch funnel evaluated over the documents
  * seen so far WITH THE SAME FIXED evidence dimension this twin was
  * given — under ANY arrival order (pinned in StreamingSpec). The
  * qualifier matters since the batch `curation_funnel` derives its
  * decontamination evidence from its own input: rerunning it on a
  * prefix would also shrink the evidence, so prefix equality holds
  * under the fixed-external-benchmark reading (the production shape —
  * an eval suite does not grow with the corpus), and the final state
  * (all docs delivered) matches `curation_funnel` exactly.
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
  *  2. RECOUNT (per micro-batch): the 6-row census recomputes from
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
  * single-partition but the 6-row funnel itself.
  */
object StreamCuration {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("lang", StringType),
    StructField("source", StringType), StructField("text", StringType)))

  /** Empty profile ledger with the exact funnelProfiles schema. */
  def emptyLedger(spark: SparkSession): DataFrame =
    SelectionQueries.funnelProfiles(
      spark.createDataFrame(spark.sparkContext
        .emptyRDD[Row], docSchema),
      emptyEvidence(spark))

  /** Empty decontamination-evidence dimension (schema: eh long). */
  private def emptyEvidence(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
      StructType(Seq(StructField("eh", LongType))))

  /** One micro-batch step: profile the arriving documents through the
    * batch projection (including the decontamination columns against
    * the FIXED benchmark-evidence dimension `evidence` — a doc's
    * contamination flag is decided entirely within the batch that
    * delivers it, so the gate adds NO new streaming state),
    * overwrite-merge into the ledger by doc_id, and recount. Returns
    * (new ledger — lineage-truncated, so batch chains do not
    * accumulate plans — and the 6-row census).
    */
  def funnelBatch(batch: DataFrame, ledger: DataFrame,
                  evidence: DataFrame): (DataFrame, DataFrame) = {
    val profiled = SelectionQueries.funnelProfiles(
      batch.select(col("doc_id"), col("lang"), col("source"), col("text")),
      evidence)
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
    * micro-batch. The census is 6 fixed rows — collecting it is the
    * same scale class as StreamMedia's rollup tuple.
    */
  def monitor(docs: DataFrame, checkpointDir: String, evidence: DataFrame)(
      sink: (Long, Array[Row]) => Unit): DataStreamWriter[Row] = {
    var ledger: DataFrame = null
    docs.writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        val base = if (ledger == null) emptyLedger(b.sparkSession) else ledger
        val (merged, census) = funnelBatch(b, base, evidence)
        ledger = merged
        sink(id, census.collect())
      }
      .option("checkpointLocation", checkpointDir)
  }

  /** Ledger bucket of a profile row — doc_id-hash-partitioning, so a
    * batch's writes touch only the buckets its doc_ids land in. ONE
    * definition for the writer, the reader, and the touched-bucket
    * census (a partitioning change must move all three together).
    */
  private def bktCol(nBuckets: Int) =
    pmod(hash(col("doc_id")), lit(nBuckets))

  /** The durable ledger VIEW as of batch `beforeBatch`: per bucket,
    * the newest version directory strictly below it that contains the
    * bucket. Layout is `<ledgerDir>/v<batchId>/bkt=<p>/` — each batch
    * writes one version dir holding ONLY the buckets it touched, so
    * the view is a per-bucket newest-version union and a half-written
    * v<id> from a dying run is invisible to its own replay (which
    * reads `< id`, then overwrites v<id> bit-identically). Returns
    * None when no committed version exists yet. Listing goes through
    * the Hadoop FileSystem API so the ledger lives wherever the
    * cluster's storage does (HDFS, s3a, local).
    *
    * Only COMMITTED versions participate: a version dir counts once
    * its job-level `_SUCCESS` marker exists (task commits create part
    * files before the job commits), so an EXTERNAL reader of the view
    * with the default `beforeBatch` can never union torn bucket data
    * from a run that died mid-write — the replay's own `< id` read
    * was already safe, this extends the guarantee to everyone else.
    */
  private def committedVersions(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, beforeBatch: Long): Array[Long] =
    fs.listStatus(root).map(_.getPath.getName)
      .collect { case s if s.startsWith("v") => s.drop(1).toLong }
      .filter(_ < beforeBatch)
      .filter(v => fs.exists(
        new org.apache.hadoop.fs.Path(root, s"v$v/_SUCCESS")))
      .sorted.reverse

  def readLedger(spark: SparkSession, ledgerDir: String,
                 beforeBatch: Long = Long.MaxValue): Option[DataFrame] = {
    val root = new org.apache.hadoop.fs.Path(ledgerDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return None
    val versions = committedVersions(fs, root, beforeBatch)
    // newest version per bucket: walk versions newest-first, keep the
    // first directory seen for each bucket — O(|versions| · |buckets|)
    // driver-side listings, no data read
    val chosen = scala.collection.mutable.Map.empty[String, String]
    versions.foreach { v =>
      fs.listStatus(new org.apache.hadoop.fs.Path(root, s"v$v"))
        .map(_.getPath.getName).filter(_.startsWith("bkt="))
        .foreach { b =>
          if (!chosen.contains(b)) chosen(b) = s"$ledgerDir/v$v/$b"
        }
    }
    if (chosen.isEmpty) None
    // reading the bkt= dirs directly keeps the ledger schema exactly
    // the profile schema (the partition column stays in the path)
    else Some(chosen.values.toSeq.sorted
      .map(spark.read.parquet(_)).reduce(_.unionByName(_)))
  }

  /** The DURABLE wiring [[monitor]]'s doc promises, as an INCREMENTAL
    * partition-pruned MERGE: the ledger is hash-partitioned by
    * `pmod(hash(doc_id), nBuckets)` and batch `id` writes a version
    * dir `v<id>` containing ONLY the buckets the batch touches — the
    * merged (anti-join-then-union) content of those buckets — so
    * per-batch bytes written scale with the batch's bucket footprint,
    * never with the full corpus-sized ledger (the O(corpus) write
    * amplification the previous full-rewrite design paid per batch).
    * Untouched buckets are never rewritten: the reader
    * ([[readLedger]]) assembles the view from each bucket's newest
    * version.
    *
    * Crash safety is unchanged from the versioned contract: nothing
    * existing is ever mutated (append-only version dirs; only a
    * replayed v<id> overwrites — and profiles are pure functions of
    * the text, so the replay rewrites it bit-identically; a
    * half-written v<id> from the dying run was invisible to readers,
    * which read `< id`). [[vacuumLedger]] removes superseded bucket
    * copies strictly below the checkpoint horizon, re-bounding disk
    * to O(live buckets).
    */
  /** Vacuum superseded ledger versions: a bucket directory
    * `v<k>/bkt=<p>` is DEAD once a newer version `< beforeBatch` also
    * contains bucket p (readers always take the newest per bucket);
    * a version dir whose buckets are all dead is deleted whole.
    * `beforeBatch` is the checkpoint horizon — versions at or above
    * it may still be read by a replaying batch and are never touched,
    * which preserves the crash/replay idempotence argument verbatim.
    * Torn (uncommitted) version dirs strictly below the horizon are
    * also deleted: they are invisible to every reader and can never
    * become live (replay only rewrites the newest batch id), so
    * without this they would accrete forever.
    * Returns the number of bucket directories removed. Bounds the
    * ledger's disk footprint to O(live buckets) however many batches
    * have run.
    */
  def vacuumLedger(spark: SparkSession, ledgerDir: String,
                   beforeBatch: Long): Int = {
    val root = new org.apache.hadoop.fs.Path(ledgerDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return 0
    // same committed-only view as readLedger: a torn (no-_SUCCESS)
    // version must not claim buckets as "live" — readers skip it, so
    // counting it here would delete the committed copies they rely on
    val versions = committedVersions(fs, root, beforeBatch)
    val seen = scala.collection.mutable.Set.empty[String]
    var removed = 0
    versions.foreach { v =>
      val vDir = new org.apache.hadoop.fs.Path(root, s"v$v")
      val buckets = fs.listStatus(vDir).map(_.getPath.getName)
        .filter(_.startsWith("bkt="))
      // newest-first walk: a bucket already seen means THIS copy is
      // superseded; a first sighting is the live copy and stays
      val (dead, live) = buckets.partition(seen.contains)
      live.foreach(seen.add)
      if (live.isEmpty && buckets.nonEmpty) {
        fs.delete(vDir, true); removed += dead.length
      } else dead.foreach { b =>
        fs.delete(new org.apache.hadoop.fs.Path(vDir, b), true)
        removed += 1
      }
    }
    // torn (no-_SUCCESS) versions strictly below the horizon are
    // invisible to every reader AND can never become live — a crashed
    // batch's replay happens at the newest batch id (>= beforeBatch),
    // never below it — so an abandoned torn dir would otherwise
    // accrete on disk forever. Delete them whole.
    val committed = versions.toSet
    fs.listStatus(root).map(_.getPath.getName)
      .collect { case s if s.startsWith("v") => s.drop(1).toLong }
      .filter(v => v < beforeBatch && !committed.contains(v))
      .foreach { v =>
        val vDir = new org.apache.hadoop.fs.Path(root, s"v$v")
        removed += fs.listStatus(vDir).map(_.getPath.getName)
          .count(_.startsWith("bkt="))
        fs.delete(vDir, true)
      }
    removed
  }

  /** One durable micro-batch step (the body of [[monitorDurable]],
    * callable directly — ScaleSmoke's write-amplification probe drives
    * it without a streaming query): profile the batch, overwrite-merge
    * ONLY its touched buckets into version dir v<id>, and return the
    * 6-row census over the full ledger view. Production sizes
    * `nBuckets` so a bucket is a rewrite-friendly unit (~1 GB at
    * 100 TB), keeping per-batch writes <= touched-buckets × bucket
    * size however large the ledger grows.
    */
  private[graft] def durableBatch(b: DataFrame, id: Long,
      ledgerDir: String, nBuckets: Int, evidence: DataFrame): DataFrame = {
    val spark = b.sparkSession
    val bkt = bktCol(nBuckets)
    // profile once (the one text parse + the one evidence probe),
    // pin the batch's rows
    val profiled = SelectionQueries.funnelProfiles(
        b.select(col("doc_id"), col("lang"), col("source"), col("text")),
        evidence)
      .localCheckpoint(true)
    // the batch's bucket footprint — <= nBuckets driver-side ints
    val touched = profiled.select(bkt.as("p")).distinct()
      .collect().map(_.getInt(0)).sorted
    val base = readLedger(spark, ledgerDir, beforeBatch = id)
    // overwrite-merge ONLY the touched buckets; localCheckpoint
    // materializes the merge BEFORE the write so the write never
    // races the (lazy) read of the same ledger
    val baseTouched = base match {
      case Some(l) => l.filter(bkt.isin(touched.map(Int.box): _*))
      case None    => emptyLedger(spark)
    }
    val mergedTouched = baseTouched
      .join(profiled.select("doc_id"), Seq("doc_id"), "left_anti")
      .unionByName(profiled)
      .localCheckpoint(true)
    mergedTouched.withColumn("bkt", bkt)
      .write.mode("overwrite").partitionBy("bkt")
      .parquet(s"$ledgerDir/v$id")
    // recount over the full ledger view: untouched buckets from
    // disk + the in-memory merge (reads stay O(ledger) — the
    // documented honest-recount contract; only WRITES are pruned)
    val untouched = base match {
      case Some(l) => l.filter(!bkt.isin(touched.map(Int.box): _*))
      case None    => emptyLedger(spark)
    }
    SelectionQueries.funnelCensus(untouched.unionByName(mergedTouched))
  }

  /** Durable wiring with SCHEDULED VACUUM: every `vacuumEvery`
    * batches (after the batch's own write) superseded bucket copies
    * strictly below the just-written batch id are removed, so an
    * unattended long-running stream keeps disk at O(live buckets)
    * instead of accreting dead copies until an operator intervenes.
    * The horizon `beforeBatch = id` is safe by the replay contract:
    * the only batch Structured Streaming can replay after a crash is
    * the newest one (this very `id`), and its replay reads versions
    * `< id` — which vacuum reduces to exactly the view it preserves
    * (newest committed copy per bucket). `vacuumEvery = 0` disables.
    */
  def monitorDurable(docs: DataFrame, checkpointDir: String,
                     ledgerDir: String, evidence: DataFrame,
                     nBuckets: Int = 16, vacuumEvery: Int = 8)(
      sink: (Long, Array[Row]) => Unit): DataStreamWriter[Row] =
    docs.writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        sink(id, durableBatch(b, id, ledgerDir, nBuckets, evidence).collect())
        if (vacuumEvery > 0 && id % vacuumEvery == vacuumEvery - 1) {
          vacuumLedger(b.sparkSession, ledgerDir, beforeBatch = id)
          ()
        }
      }
      .option("checkpointLocation", checkpointDir)
}
