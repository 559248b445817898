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

    val events = Tables.load(spark, sfDir, "events")
    time("ts_census") {
      events.groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg((sum(col("value").cast(DecimalType(12, 2))).cast(DecimalType(18, 2))
          * 100).cast("long").as("c"))
    }
    time("ts_census_ckpt_join") {
      val i = events.groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg((sum(col("value").cast(DecimalType(12, 2))).cast(DecimalType(18, 2))
          * 100).cast("long").as("c"))
        .select(col("event_type"), expr("unix_micros(hour) div 3600000000L").as("t"), col("c"))
        .localCheckpoint(true)
      val a = i.select(col("event_type"), col("t").as("t1"), col("c").as("c1"))
      val b = i.select(col("event_type").as("et2"), col("t").as("t2"), col("c").as("c2"))
      a.join(b, col("event_type") === col("et2") && col("t1") < col("t2"))
        .select(col("event_type"),
          round((col("c2") - col("c1")).cast("double")
            / ((col("t2") - col("t1")) * 100.0), 6).as("slope"),
          col("t1"), col("t2"))
    }
    time("ts_distinct_slopes") {
      val i = events.groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg((sum(col("value").cast(DecimalType(12, 2))).cast(DecimalType(18, 2))
          * 100).cast("long").as("c"))
        .select(col("event_type"), expr("unix_micros(hour) div 3600000000L").as("t"), col("c"))
        .localCheckpoint(true)
      val a = i.select(col("event_type"), col("t").as("t1"), col("c").as("c1"))
      val b = i.select(col("event_type").as("et2"), col("t").as("t2"), col("c").as("c2"))
      val p = a.join(b, col("event_type") === col("et2") && col("t1") < col("t2"))
        .select(col("event_type"),
          round((col("c2") - col("c1")).cast("double")
            / ((col("t2") - col("t1")) * 100.0), 6).as("slope"))
      val g = p.groupBy("event_type", "slope").agg(count(lit(1)).as("cnt"))
      println("[scratch]   distinct (type, slope) rows = " + g.count())
      g
    }
    time("ts_full") {
      graft.SparkEntry.queries("theil_sen")(spark, sfDir)
    }
    // r14 session-2 splits: where does the selection rewrite spend?
    def census() = events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg((sum(col("value").cast(DecimalType(12, 2))).cast(DecimalType(18, 2))
        * 100).cast("long").as("c"))
      .select(col("event_type"), expr("unix_micros(hour) div 3600000000L").as("t"),
        col("c"))
    def pairsOf(i: org.apache.spark.sql.DataFrame) = {
      val a = i.select(col("event_type"), col("t").as("t1"), col("c").as("c1"))
      val b = i.select(col("event_type").as("et2"), col("t").as("t2"), col("c").as("c2"))
      a.join(b, col("event_type") === col("et2") && col("t1") < col("t2"))
        .select(col("event_type"),
          round((col("c2") - col("c1")).cast("double")
            / ((col("t2") - col("t1")) * 100.0), 6).as("slope"),
          col("t1"), col("t2"))
    }
    time("ts2_pairs_only") { pairsOf(census().localCheckpoint(true)) }
    time("ts2_pairs_ckpt_only") {
      pairsOf(census().localCheckpoint(true)).localCheckpoint(true)
        .groupBy("event_type").agg(count(lit(1)))
    }
    time("ts2_rangesort_noop") {
      pairsOf(census().localCheckpoint(true)).localCheckpoint(true)
        .repartitionByRange(spark.sparkContext.defaultParallelism,
          col("event_type"), col("slope"), col("t1"), col("t2"))
        .sortWithinPartitions("event_type", "slope", "t1", "t2")
    }
    time("ts2_rangesort_mid_ckpt") {
      pairsOf(census().localCheckpoint(true)).localCheckpoint(true)
        .repartitionByRange(spark.sparkContext.defaultParallelism,
          col("event_type"), col("slope"), col("t1"), col("t2"))
        .sortWithinPartitions("event_type", "slope", "t1", "t2")
        .withColumn("mid", monotonically_increasing_id())
        .localCheckpoint(true)
        .groupBy(expr("shiftright(mid, 33)").as("pid"), col("event_type"))
        .agg(count(lit(1)).as("n"), min(col("mid")).as("lo"))
    }
    time("ts2_window_old") {
      import org.apache.spark.sql.expressions.Window
      val i = census().localCheckpoint(true)
      val p = pairsOf(i)
      val np = i.groupBy("event_type").agg(count(lit(1)).as("nbh"))
        .select(col("event_type"), expr("nbh * (nbh - 1) div 2").as("np"))
      p.withColumn("rn", row_number().over(
          Window.partitionBy("event_type").orderBy("slope", "t1", "t2")))
        .join(broadcast(np), "event_type")
        .filter(col("rn") === expr("(np + 1) div 2"))
        .select(col("event_type"), col("np").as("n_pairs"),
          col("slope").as("median_slope"))
        .orderBy("event_type")
    }
  }
}
