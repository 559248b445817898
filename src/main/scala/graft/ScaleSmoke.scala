package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Similarity}

/** Manual scale probe (not part of the driver gate): replicates the
  * sf0.1 fixtures `mult`x with remapped ids and runs the heaviest
  * pipeline shapes, printing rows and seconds per stage. The point is
  * LINEARITY, not absolute speed — a stage whose time grows much
  * faster than `mult` is a quadratic term the small-SF gate can't see
  * (replicated docs are worst-case for banding: every copy set
  * collides in every band, so the pair expansion runs at its
  * structural maximum). Run:
  *
  *   sbt "runMain graft.ScaleSmoke 10"
  *
  * Measured 2026-08-13 (local[32], sf0.1 x10 = 50k docs / 100k
  * vectors): see SCALE.md "10x local scale probe".
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"

    def replicate(df: DataFrame, idCol: String): DataFrame =
      df.crossJoin(spark.range(mult).select(col("id").as("__copy")))
        .withColumn(idCol, col(idCol) + col("__copy") * 10000000L)
        .drop("__copy")

    val docs = replicate(Tables.load(spark, dir, "documents"), "doc_id")
      .localCheckpoint(true)
    val emb = replicate(Tables.load(spark, dir, "embeddings"), "vec_id")
      .localCheckpoint(true)
    println(s"[smoke] mult=$mult docs=${docs.count()} vectors=${emb.count()}")
    // the two replicated inputs stay cached across stages; only blocks
    // a stage itself checkpointed (connectedComponents rounds) are
    // released between stages
    val keep = spark.sparkContext.getPersistentRDDs.keySet

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => keep(id) }
        .values.foreach(_.unpersist(false))
      println(f"[smoke] $name%-28s $dt%7.2f s   $rows%12d rows")
    }

    time("minhash_signatures") {
      val sig = Dedup.minhashFromText(docs, "doc_id", "text", 12)
      sig.write.format("noop").mode("overwrite").save(); sig.count()
    }
    time("band_candidate_pairs") {
      val sig = Dedup.minhashFromText(docs, "doc_id", "text", 12)
      Dedup.candidatePairs(Dedup.bandKeys(sig, "doc_id", 6, 2), "doc_id").count()
    }
    time("connected_components") {
      val sig = Dedup.minhashFromText(docs, "doc_id", "text", 12)
      val pairs = Dedup.candidatePairs(Dedup.bandKeys(sig, "doc_id", 6, 2), "doc_id")
      Dedup.connectedComponents(pairs, "id_a", "id_b").count()
    }
    time("simhash_fingerprints") {
      Dedup.simhash(docs, "doc_id", "text", 32).count()
    }
    time("exact_dedup_md5") {
      docs.groupBy(md5(col("text"))).agg(count(lit(1))).count()
    }
    time("kmeans_step_k8") {
      val (_, counts) = Similarity.kmeansStep(emb, "embedding",
        Similarity.centroidCoefs(8, 64))
      counts.sum
    }
    time("pq_train_2steps") {
      var cbs: IndexedSeq[Array[Array[Double]]] =
        (0 until 8).map(m => Similarity.pqInitCoefs(m, 16, 8))
      cbs = Similarity.pqStep(emb, "embedding", cbs, 8)
      cbs = Similarity.pqStep(emb, "embedding", cbs, 8)
      cbs.length.toLong
    }
    spark.stop()
  }
}
