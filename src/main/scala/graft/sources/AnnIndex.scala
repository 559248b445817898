package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.CentroidAssign
import graft.ops.Similarity

/** The stored form of `ann_ivf_pq` — train once, probe forever. The
  * inline query retrains codebooks and re-encodes the corpus on every
  * run (the right shape for a correctness gate, the wrong one for
  * production: SCALE.md records that at sf0.1 training dominates the
  * probe). Here the index is BUILT once — one row of 9 small ints per
  * vector, hive-partitioned by the coarse list id — and a probe:
  *
  *  1. ranks coarse lists per query and collects the DISTINCT probed
  *     list ids (bounded by the centroid count — the same k-scalars
  *     driver contract as kmeansTrain);
  *  2. reads the index with `cl IN (probed)` — directory-level
  *     partition pruning, so unprobed lists are never listed, opened,
  *     or scanned (BucketingSpec asserts the PartitionFilters in the
  *     scan node);
  *  3. runs the ADC scan + shortlist + exact re-rank of the inline
  *     query, bit-identically (BucketingSpec pins probe == query).
  *
  * At 100 TB with K=65k lists this is the difference between touching
  * ~0.1% of the index files and scanning all of them.
  */
object AnnIndex {

  import graft.queries.SimilarityQueries.{Centroids, Dim, Nprobe, PqK, PqM, PqShortlist, PqSub}

  case class Codebooks(coarse: Array[Array[Double]],
                       pq: IndexedSeq[Array[Array[Double]]])

  /** True iff `path` carries a FileStreamSink commit log. A directory
    * either is batch-built (no log; readers list files) or
    * streaming-built (log; commit-log-aware readers trust ONLY logged
    * files) — MIXING the two silently drops the batch-written files
    * from every probe, so both ends guard against it below.
    */
  private def hasSinkLog(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path, "_spark_metadata")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** All data files under `path` (recursive; sink log, checkpoints and
    * _SUCCESS markers excluded), as bare path components.
    */
  private def dataFiles(spark: SparkSession, path: String): Seq[String] = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Nil
    val it = fs.listFiles(root, true)
    val buf = Seq.newBuilder[String]
    while (it.hasNext) {
      val f = it.next().getPath
      val uri = f.toUri.getPath
      if (!uri.contains("/_spark_metadata/") && !f.getName.startsWith("_")
          && !f.getName.startsWith("."))
        buf += uri
    }
    buf.result()
  }

  /** Fail loudly if `path` is a commit-logged index with data files the
    * log does not cover (a batch write snuck in): `spark.read.parquet`
    * over such a directory would silently ignore the unlogged files
    * and the probe would return confidently-wrong neighbors. The log's
    * v1 entries are one JSON object per line with a "path" field; the
    * union over all log files (compacts included) is exactly the set a
    * commit-log-aware reader can ever see.
    */
  private def assertLogCoversDir(spark: SparkSession, path: String): Unit = {
    if (!hasSinkLog(spark, path)) return
    val logDir = new Path(path, "_spark_metadata")
    val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val pathRe = """"path"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
    val logged = fs.listStatus(logDir).filter(_.isFile).flatMap { st =>
      val in = fs.open(st.getPath)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      pathRe.findAllMatchIn(text).map(m =>
        new Path(m.group(1).replace("\\/", "/")).toUri.getPath)
    }.toSet
    val orphans = dataFiles(spark, path).filterNot(logged.contains)
    if (orphans.nonEmpty)
      throw new IllegalStateException(
        s"ANN index at $path mixes a streaming commit log with " +
          s"${orphans.size} file(s) the log does not cover (e.g. " +
          s"${orphans.head}) — a commit-log-aware read would silently " +
          "drop them. Rebuild the index by version instead of mixing " +
          "batch and streaming writes in one directory.")
  }

  /** Train the PQ codebooks (2 batched Lloyd jobs) and persist the
    * encoded corpus partitioned by coarse list. Returns the codebooks
    * — k*dim scalars, the probe-time broadcast state.
    */
  def build(emb: DataFrame, path: String): Codebooks = {
    var cbs: IndexedSeq[Array[Array[Double]]] =
      (0 until PqM).map(m => Similarity.pqInitCoefs(m, PqK, PqSub))
    cbs = Similarity.pqStep(emb, "embedding", cbs, PqSub)
    cbs = Similarity.pqStep(emb, "embedding", cbs, PqSub)
    val coarse = Similarity.centroidCoefs(Centroids, Dim)
    val codeCols = (0 until PqM).map(m =>
      CentroidAssign(slice(col("embedding"), m * PqSub + 1, PqSub), cbs(m))
        .as(s"code_$m"))
    Layout.writePartitioned(
      emb.select(Seq(col("vec_id"),
        CentroidAssign(col("embedding"), coarse).as("cl")) ++ codeCols: _*),
      path, Seq("cl"))
    Codebooks(coarse, cbs)
  }

  /** Streaming maintenance of a stored index: encode arriving vectors
    * with the FROZEN codebooks (at production scale codebooks retrain
    * offline on a sample and the index rebuilds by version — an
    * in-place re-encode would corrupt in-flight probes) and append
    * them to the same hive layout via the exactly-once parquet file
    * sink (checkpoint + _spark_metadata commit log: a restarted batch
    * never double-appends, and readers see only committed files).
    *
    * `path` MUST be a fresh or streaming-only directory: the sink's
    * commit log claims the whole directory, so starting it over a
    * batch-built index ([[build]]) would hide every pre-existing file
    * from commit-log-aware readers. That mix is REFUSED here (and a
    * mix created behind our back fails in [[probe]]); to fold batch
    * and streamed vectors together, rebuild the index by version.
    * StreamingSpec pins that a probe over a streamed-in index equals
    * the probe over the batch-built one, and that the mix guards fire.
    */
  def appendStream(vectors: DataFrame, path: String, checkpoint: String,
                   cb: Codebooks): org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = vectors.sparkSession
    if (!hasSinkLog(spark, path) && dataFiles(spark, path).nonEmpty)
      throw new IllegalStateException(
        s"refusing to start a FileStreamSink over batch-built index $path: " +
          "its commit log would hide every existing file from readers. " +
          "Stream into a fresh directory (index rebuild by version).")
    val codeCols = (0 until PqM).map(m =>
      CentroidAssign(slice(col("embedding"), m * PqSub + 1, PqSub), cb.pq(m))
        .as(s"code_$m"))
    vectors.select(Seq(col("vec_id"),
        CentroidAssign(col("embedding"), cb.coarse).as("cl")) ++ codeCols: _*)
      .writeStream.format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .partitionBy("cl")
      .outputMode("append")
      .start()
  }

  // ---- rebuild by version ----------------------------------------
  //
  // The batch/streaming mix guards above REFUSE a corrupt layout; this
  // is the documented recovery they point at. Layout:
  //
  //   <root>/CURRENT      one line: the active version's dir name
  //   <root>/v1/, v2/ ... immutable once published
  //
  // A rebuild writes a NEW version directory (batch build or a fresh
  // FileStreamSink — never touching the live one), then [[publish]]
  // flips the pointer with an atomic rename. Probes resolve the
  // pointer once at plan time, so an in-flight probe keeps reading its
  // immutable snapshot while new probes see the new version — no
  // moment at which a reader can observe half-swapped state, and no
  // path by which batch and streaming files can land in one directory.

  private val Pointer = "CURRENT"

  /** The published version name, e.g. "v2". Throws (rather than
    * guessing a directory) when nothing has been published.
    */
  def currentVersion(spark: SparkSession, root: String): String =
    currentVersionOpt(spark, root).getOrElse(
      throw new IllegalStateException(
        s"no $Pointer pointer under $root — publish a version first"))

  /** The published version name, or None before any publish — the
    * non-throwing form for callers that must make progress on an
    * unbootstrapped root (a stream's first trigger is commonly empty,
    * and a delta batch can arrive before any refresh has published).
    */
  def currentVersionOpt(spark: SparkSession, root: String): Option[String] = {
    val p = new Path(root, Pointer)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val v = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
    finally in.close()
    require(v.nonEmpty && !v.contains("/"), s"malformed $Pointer content: '$v'")
    Some(v)
  }

  def versionPath(root: String, version: String): String = s"$root/$version"

  /** Atomically point `root` at `version`. Validates the target FIRST
    * (non-empty, and its commit log — if any — covers every data
    * file), so a bad directory can never become current; then writes
    * the pointer to a temp file and renames with OVERWRITE — atomic on
    * HDFS and on the local fs, so readers see either the old pointer
    * or the new one, never a partial write.
    */
  def publish(spark: SparkSession, root: String, version: String): Unit = {
    val dir = versionPath(root, version)
    if (dataFiles(spark, dir).isEmpty)
      throw new IllegalStateException(
        s"refusing to publish empty index version $dir")
    assertLogCoversDir(spark, dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(conf)
    val tmp = new Path(root, s".$Pointer.tmp")
    val out = fs.create(tmp, true)
    try out.write((version + "\n").getBytes("UTF-8")) finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      rootPath.toUri, conf)
    fc.rename(tmp, new Path(root, Pointer),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Build a new index version under `root` and publish it. */
  def buildVersion(emb: DataFrame, root: String, version: String): Codebooks = {
    val cb = build(emb, versionPath(root, version))
    publish(emb.sparkSession, root, version)
    cb
  }

  /** Probe whatever version `root` currently points at. The pointer is
    * resolved HERE (plan time); the returned frame keeps reading that
    * immutable version even if a newer one is published mid-flight.
    */
  def probeCurrent(spark: SparkSession, root: String, emb: DataFrame,
                   cb: Codebooks, maxQueryId: Long = 20, topK: Int = 5): DataFrame =
    probe(spark, versionPath(root, currentVersion(spark, root)), emb,
      cb, maxQueryId, topK)

  /** Probe the stored index for the queries `vec_id < maxQueryId` of
    * `emb` (the inline query's convention), returning its exact
    * output shape: (q_id, rnk, n_id, cos_sim), top-`topK` per query.
    */
  def probe(spark: SparkSession, path: String, emb: DataFrame,
            cb: Codebooks, maxQueryId: Long = 20, topK: Int = 5): DataFrame = {
    assertLogCoversDir(spark, path) // loud, not silently-partial, on a batch/streaming mix
    probeFrame(spark, spark.read.parquet(path), emb, cb, maxQueryId, topK)
  }

  /** [[probe]] over an already-assembled index FRAME — the seam the
    * streamed versioned index ([[graft.streaming.StreamAnnIndex]])
    * reuses: its index is a union of per-batch `cl=`-partitioned
    * delta directories, and the `cl IN (probed)` filter below pushes
    * through the union into EVERY member scan, so the directory-
    * pruning contract is identical to the single-directory read.
    */
  private[graft] def probeFrame(spark: SparkSession, index0: DataFrame,
      emb: DataFrame, cb: Codebooks, maxQueryId: Long, topK: Int): DataFrame = {
    val sims = cb.coarse.toIndexedSeq.map(cen =>
      round(Similarity.dotLit(col("embedding"), cen), 6))
    def subDot(m: Int, cen: Array[Double]) =
      cen.zipWithIndex.map { case (cv, i) =>
        element_at(col("embedding"), m * PqSub + i + 1).cast("double") * lit(cv)
      }.reduceLeft(_ + _)
    val lutCols = for { m <- 0 until PqM; c <- 0 until PqK }
      yield round(subDot(m, cb.pq(m)(c)), 6)
    val probes = emb.filter(col("vec_id") < maxQueryId)
      .select(col("vec_id").as("q_id"), array(lutCols: _*).as("luts"),
        explode(array((0 until Centroids).map(c =>
          struct(lit(c).as("c"), sims(c).as("s"))): _*)).as("cs"))
      .withColumn("crn", row_number().over(Window.partitionBy("q_id")
        .orderBy(col("cs.s").desc, col("cs.c"))))
      .filter(col("crn") <= Nprobe)
      .select(col("q_id"), col("luts"), col("cs.c").as("cl"))
      .localCheckpoint(true)
    // the union of probed lists: bounded by the centroid count BY
    // CONTRACT (nprobe * |queries| keys over <= Centroids values) —
    // this literal list is what turns the read below into directory
    // pruning instead of a full index scan
    val probedLists = probes.select("cl").distinct()
      .collect().map(_.getInt(0)).sorted
    val index = index0
      .filter(col("cl").isin(probedLists.map(Integer.valueOf).toSeq: _*))
    val score = (0 until PqM).map(m =>
        element_at(col("luts"), lit(m * PqK + 1) + col(s"code_$m"))
          .cast(DecimalType(18, 6)))
      .reduceLeft(_ + _).cast("double")
    val ws = Window.partitionBy(col("q_id"))
      .orderBy(col("approx_dot").desc, col("n_id"))
    val short = index.select(Seq(col("vec_id").as("n_id"), col("cl")) ++
        (0 until PqM).map(m => col(s"code_$m")): _*)
      .join(broadcast(probes), Seq("cl"))
      .filter(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"), score.as("approx_dot"))
      .withColumn("srn", row_number().over(ws))
      .filter(col("srn") <= PqShortlist)
      .select("q_id", "n_id")
    val qv = emb.select(col("vec_id").as("q_id"), col("embedding").as("qe"))
    val nv = emb.select(col("vec_id").as("n_id"), col("embedding").as("ne"))
    val wr = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("n_id"))
    short.join(qv, "q_id").join(nv, "n_id")
      .select(col("q_id"), col("n_id"),
        Similarity.cosine(col("qe"), col("ne")).as("cos_sim"))
      .withColumn("rnk", row_number().over(wr))
      .filter(col("rnk") <= topK)
      .select("q_id", "rnk", "n_id", "cos_sim")
      .orderBy("q_id", "rnk")
  }
}
