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
      // events.ts is TIMESTAMP(NANOS) parquet, which Spark's vectorized
      // reader rejects. Read the raw int64 nanos and floor-divide to
      // microseconds — bit-identical to DuckDB's own ns->us conversion
      // (verified: DuckDB truncates toward zero / floors).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000L")))
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

  /** Register every table as a temp view named after itself. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
