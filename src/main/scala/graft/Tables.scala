package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet testdata (TESTDATA.md).
  * All `SparkEntry.queries` read through here so the DuckDB oracle sees
  * the exact same files.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts has shipped in two parquet encodings across driver
      // rounds, so branch on what actually landed on disk:
      //  - TIMESTAMP(NANOS): Spark's vectorized reader rejects nanos,
      //    so read the raw int64 via nanosAsLong and floor-divide to
      //    micros — bit-identical to DuckDB's own ns->us truncation.
      //  - TIMESTAMP(MICROS): reads natively as TIMESTAMP_NTZ; cast to
      //    the session-UTC TimestampType so every query (and the
      //    written Verify output the driver compares) sees the exact
      //    same column type and micros values as the nanos path.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000L")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          // The NTZ->TimestampType cast reads the wall-clock fields in
          // the SESSION time zone; the stored micros only survive
          // unchanged under UTC. Every entry point pins UTC already —
          // enforce it here too so a future entry point that forgets
          // the conf cannot silently shift every events timestamp.
          spark.conf.set("spark.sql.session.timeZone", "UTC")
          raw.withColumn("ts", col("ts").cast(
            org.apache.spark.sql.types.TimestampType))
        case _ => raw
      }
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }

  /** Parallelize the map-side of a plan whose expensive per-row work
    * (decimal arithmetic, JSON parsing, md5 hashing) would otherwise run
    * inside the scan stage. The driver fixtures are single-row-group
    * parquet files, and a row group is Spark's minimum split unit — so
    * every scan is ONE task until the first exchange. Use this ONLY
    * when heavy work precedes the first exchange: where a window/sort/
    * groupBy shuffle comes first anyway, the exchange itself provides
    * the parallelism and an extra round-robin pass is pure cost
    * (measured both ways at sf0.1). At production scale input arrives
    * as many splits and the same plans parallelize at the scan, so
    * callers guard on actual scan parallelism, not a constant.
    *
    * Call only on scan-stage frames (scan + narrow projections/filters,
    * no upstream exchange): the partition-count probe compiles the
    * frame's physical plan, and under AQE a frame with upstream
    * exchanges would materialize them eagerly.
    */
  def parallelize(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }

  /** [[parallelize]] variant for pipelines that aggregate by `key` and
    * END in a global ORDER BY the same key (the MinHash/SimHash shape):
    * spreads with RANGE partitioning on the key instead of round-robin.
    * Aggregates preserve their child's partitioning over the grouping
    * key, and `RangePartitioning(key)` satisfies both the aggregate's
    * clustering AND the final sort's `OrderedDistribution` — so the
    * whole pipeline runs with ONE exchange and a local sort. The
    * alternative (hash spread + trailing `orderBy`) pays a second,
    * range exchange whose sampling pass re-executes the expensive
    * upstream (measured 2.3 s vs 1.3 s on the minhash signature at
    * sf0.1): range-sampling the cheap SCAN is fine, range-sampling a
    * shingle pipeline is not.
    *
    * Same guard and same caveats as [[parallelize]]: call only on
    * scan-stage frames, and skip entirely when the scan already has
    * enough splits — at 100 TB the input arrives as many splits and an
    * unconditional repartition would shuffle the full corpus text for
    * nothing (the post-aggregate exchanges carry only a few integers
    * per document).
    */
  def parallelizeByRange(df: DataFrame, key: org.apache.spark.sql.Column): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartitionByRange(target, key)
  }

  /** Register every table as a temp view named after itself. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
