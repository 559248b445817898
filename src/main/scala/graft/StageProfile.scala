package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level profiling harness for optimization work (guide §1:
  * measure first) — times labeled sub-pipelines through the noop sink
  * under the exact Bench session config, so intra-query stage splits
  * are attributable. The probe set is whatever the current round is
  * investigating; OPTIMIZATION_r14.md quotes its readings.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=... \
  *          sbt "runMain graft.StageProfile"
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.PortableHash
    import graft.functions.PortableHash.h32
    import graft.ops.Dedup

    def time(label: String)(f: => DataFrame): Unit = {
      // warm + 2 timed (min), mirroring Bench
      def once(): Double = {
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        dt
      }
      once()
      val d = math.min(once(), once())
      println(f"[scratch] $label%-40s $d%8.3f s")
    }

    val docs = Tables.load(spark, sfDir, "documents")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType

    val K = 12; val B6 = 6; val R2 = 2
    time("minhash_sig") {
      Dedup.minhashFromText(docs, "doc_id", "text", K)
    }
    time("minhash_bands_pairs") {
      Dedup.candidatePairs(
        Dedup.bandKeys(Dedup.minhashFromText(docs, "doc_id", "text", K),
          "doc_id", B6, R2), "doc_id")
    }
    time("minhash_pairs_cc") {
      Dedup.connectedComponents(
        Dedup.candidatePairs(
          Dedup.bandKeys(Dedup.minhashFromText(docs, "doc_id", "text", K),
            "doc_id", B6, R2), "doc_id"), "id_a", "id_b")
    }
  }
}
