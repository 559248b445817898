package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.sources.AnnIndex
import graft.sources.AnnIndex.Codebooks

/** Streaming ANN index maintenance — the streaming twin of the stored
  * `ann_ivf_pq` index ([[graft.sources.AnnIndex]]): a live ingest
  * pipeline can SEARCH vectors that arrived since the last batch
  * build, and a periodic codebook refresh keeps quantization quality
  * tracking the corpus — without ever presenting a half-built index
  * to a prober.
  *
  * Per micro-batch:
  *  1. the batch's RAW vectors land durably under `<root>/vecs/d<id>`
  *     (overwrite — a replayed batch rewrites the same rows
  *     bit-identically, the StreamCuration purity contract), O(batch)
  *     bytes per batch;
  *  2. on a REFRESH batch (`id % refreshEvery == 0`): codebooks
  *     retrain over ALL committed vectors via the same decimal-exact
  *     batched-Lloyd [[graft.ops.Similarity.pqStep]] the batch build
  *     runs (order-independent sums, so the retrained codebooks are
  *     bit-identical to a batch build over the same vectors), the
  *     full corpus re-encodes into `<root>/v<id>/base/cl=*`, the
  *     codebooks persist beside it, and the version publishes with
  *     [[AnnIndex.publish]]'s atomic CURRENT flip — in-flight probes
  *     keep their immutable snapshot, the rebuild is the documented
  *     O(corpus) rebuild-by-version;
  *  3. otherwise (a DELTA batch): the batch PQ-encodes with the
  *     CURRENT version's frozen codebooks into its own
  *     `<version>/d<id>/cl=*` hive directory — O(batch) work, and
  *     because each delta is a whole per-batch directory written with
  *     overwrite, a crash/replay rewrites it bit-identically instead
  *     of double-appending rows into a shared file set.
  *
  * A probe ([[probeCurrent]]) resolves the CURRENT pointer once,
  * loads that version's persisted codebooks, assembles the index as
  * base + committed deltas, and runs the batch probe kernel
  * ([[AnnIndex.probeFrame]]) — the `cl IN (probed)` filter pushes
  * into every member scan, so the directory-pruning contract (only
  * the Nprobe lists are ever listed or read) survives the union.
  * Torn directories are invisible everywhere: vecs/deltas/base are
  * `_SUCCESS`-gated exactly like the curation ledger's versions.
  *
  * Restart needs no external state: the CURRENT pointer and the
  * persisted codebooks ARE the recovery record (re-read lazily on the
  * first post-restart delta batch). Bootstrap is wedge-free: an empty
  * batch before any publish reports the "none" sentinel, and a
  * non-empty delta-cadence batch on an unbootstrapped root performs
  * the first refresh instead of trying to read a CURRENT pointer that
  * does not exist (a thrown foreachBatch would replay forever).
  */
object StreamAnnIndex {

  import graft.queries.SimilarityQueries.{PqM, PqSub}
  import graft.functions.CentroidAssign

  /** Persist codebooks inside a version dir: one row per centroid,
    * (kind, m, c, vals) — k·dim scalars, the probe-time state.
    */
  private[graft] def writeCodebooks(spark: SparkSession, verDir: String,
                                    cb: Codebooks): Unit = {
    import spark.implicits._
    val rows =
      cb.coarse.zipWithIndex.map { case (v, c) => ("coarse", -1, c, v.toSeq) } ++
      cb.pq.zipWithIndex.flatMap { case (book, m) =>
        book.zipWithIndex.map { case (v, c) => ("pq", m, c, v.toSeq) }
      }
    rows.toSeq.toDF("kind", "m", "c", "vals")
      .coalesce(1).write.mode("overwrite").parquet(s"$verDir/codebooks")
  }

  private[graft] def readCodebooks(spark: SparkSession,
                                   verDir: String): Codebooks = {
    val rows = spark.read.parquet(s"$verDir/codebooks").collect()
    val coarse = rows.filter(_.getString(0) == "coarse")
      .sortBy(_.getInt(2))
      .map(_.getSeq[Double](3).toArray)
    val pq = rows.filter(_.getString(0) == "pq")
      .groupBy(_.getInt(1)).toIndexedSeq.sortBy(_._1)
      .map { case (_, rs) =>
        rs.sortBy(_.getInt(2)).map(_.getSeq[Double](3).toArray)
      }
    Codebooks(coarse, pq)
  }

  /** Committed (`_SUCCESS`-marked) subdirectories of `dir` whose name
    * matches `prefix` — the torn-write gate, shared by the vector
    * store, the delta list, and the probe assembly.
    */
  private def committedDirs(spark: SparkSession, dir: String,
                            prefix: String): Seq[String] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return Nil
    fs.listStatus(root).map(_.getPath.getName)
      .filter(_.startsWith(prefix))
      .filter(n => fs.exists(new Path(root, s"$n/_SUCCESS")))
      .sorted.map(n => s"$dir/$n").toSeq
  }

  /** Every committed raw vector seen so far (vec_id, embedding). */
  private[graft] def readVectors(spark: SparkSession, root: String): DataFrame =
    committedDirs(spark, s"$root/vecs", "d")
      .map(spark.read.parquet(_)).reduce(_.unionByName(_))

  /** PQ-encode vectors with frozen codebooks — the batch build's exact
    * projection (one row of small ints per vector). `private[graft]`
    * so the scale probe can measure the delta-batch regime directly.
    */
  private[graft] def encode(vecs: DataFrame, cb: Codebooks): DataFrame =
    vecs.select(Seq(col("vec_id"),
      CentroidAssign(col("embedding"), cb.coarse).as("cl")) ++
      (0 until PqM).map(m =>
        CentroidAssign(slice(col("embedding"), m * PqSub + 1, PqSub), cb.pq(m))
          .as(s"code_$m")): _*)

  /** REFRESH: retrain codebooks over all committed vectors, re-encode
    * the corpus into `v<id>/base`, persist the codebooks, publish.
    * Deterministic in the vector SET (decimal-exact training sums), so
    * a crash/replay republishes the identical version.
    */
  private[graft] def refresh(spark: SparkSession, root: String,
                             id: Long): Codebooks = {
    val ver = s"v$id"
    val cb = AnnIndex.build(readVectors(spark, root), s"$root/$ver/base")
    writeCodebooks(spark, s"$root/$ver", cb)
    AnnIndex.publish(spark, root, ver)
    cb
  }

  /** The CURRENT version's index frame: base + committed deltas. */
  private[graft] def indexFrame(spark: SparkSession, root: String,
                                version: String): DataFrame = {
    val verDir = s"$root/$version"
    (committedDirs(spark, verDir, "base") ++ committedDirs(spark, verDir, "d"))
      .map(spark.read.parquet(_)).reduce(_.unionByName(_))
  }

  /** Probe the live index: resolve CURRENT once, load its codebooks,
    * assemble base + deltas, run the batch probe kernel. Output shape
    * and semantics identical to [[AnnIndex.probe]] / `ann_ivf_pq`.
    */
  def probeCurrent(spark: SparkSession, root: String, emb: DataFrame,
                   maxQueryId: Long = 20, topK: Int = 5): DataFrame = {
    val ver = AnnIndex.currentVersion(spark, root)
    val cb = readCodebooks(spark, s"$root/$ver")
    AnnIndex.probeFrame(spark, indexFrame(spark, root, ver), emb, cb,
      maxQueryId, topK)
  }

  /** Streaming wiring: checkpointed foreachBatch landing each batch's
    * vectors, refreshing or delta-encoding per the cadence, and
    * emitting (batchId, active version) per micro-batch. State across
    * batches is only the (version, codebooks) pair, re-derivable from
    * the published pointer after a restart.
    */
  def monitor(vectors: DataFrame, root: String, checkpointDir: String,
              refreshEvery: Int = 4)(
      sink: (Long, String) => Unit): DataStreamWriter[Row] = {
    var cur: Option[(String, Codebooks)] = None
    vectors.writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        val spark = b.sparkSession
        // an empty micro-batch writes nothing (a zero-row hive write
        // leaves an unreadable partitionless directory) — but still
        // reports, so the sink cadence is uninterrupted. Before any
        // version has published (a real source's first trigger is
        // commonly empty), report the "none" sentinel instead of
        // failing the batch — a thrown bootstrap batch would replay
        // forever and wedge the stream.
        if (b.isEmpty) {
          sink(id, cur.map(_._1)
            .orElse(AnnIndex.currentVersionOpt(spark, root))
            .getOrElse("none"))
        } else {
          b.select(col("vec_id"), col("embedding"))
            .write.mode("overwrite").parquet(s"$root/vecs/d$id")
          // recover (or discover) the active version WITHOUT throwing:
          // post-restart the published pointer + persisted codebooks
          // are the recovery record; on a truly unbootstrapped root
          // (delta cadence but nothing published yet — e.g. batch 0
          // was empty so the id%refreshEvery refresh never ran) fall
          // through to a refresh, which publishes the first version.
          val recovered: Option[(String, Codebooks)] = cur.orElse(
            AnnIndex.currentVersionOpt(spark, root).map { v =>
              (v, readCodebooks(spark, s"$root/$v"))
            })
          val isRefresh = refreshEvery > 0 && id % refreshEvery == 0
          if (isRefresh || recovered.isEmpty) {
            cur = Some((s"v$id", refresh(spark, root, id)))
          } else {
            val (ver, cb) = recovered.get
            encode(b.select("vec_id", "embedding"), cb)
              .write.mode("overwrite").partitionBy("cl")
              .parquet(s"$root/$ver/d$id")
            cur = Some((ver, cb))
          }
          sink(id, cur.get._1)
        }
      }
      .option("checkpointLocation", checkpointDir)
  }
}
