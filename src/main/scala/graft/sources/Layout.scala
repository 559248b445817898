package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Storage-layout operators — the two physical-design levers that
  * matter most at 100 TB:
  *
  *  - '''Bucketing''' pre-shuffles a table ONCE at write time into a
  *    fixed number of hash buckets on the join/agg key. Every later
  *    join or aggregation on that key between same-bucketed tables
  *    runs exchange-free: the map tasks read aligned buckets directly.
  *    For a fact table joined daily on the same key, this converts an
  *    every-query O(data) shuffle into a one-time write cost.
  *    (`BucketingSpec` proves the exchange disappears from the plan.)
  *
  *  - '''Partitioning''' (hive-style directory layout) turns equality/
  *    range predicates on the partition column into directory pruning:
  *    a query for one `lang` of a 100 TB corpus opens that language's
  *    directories only — the other files are never listed, opened, or
  *    scanned. Choose low-cardinality, always-filtered columns
  *    (lang, date, source); high-cardinality partition columns create
  *    a small-files catastrophe instead.
  *
  * Both compose: partition by date, bucket by join key within each
  * partition — the standard fact-table layout.
  */
object Layout {

  /** Write `df` as a bucketed (+ optionally sorted) managed table.
    * `buckets` should be sized so one bucket of the table at target
    * scale fits an executor's memory for shuffle-free joins (and is a
    * multiple of the cluster's parallelism for full utilization).
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    buckets: Int, key: String, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, key)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Write `df` hive-partitioned by `cols` (directory per value). */
  def writePartitioned(df: DataFrame, path: String, cols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(cols: _*)
      .parquet(path)
}
