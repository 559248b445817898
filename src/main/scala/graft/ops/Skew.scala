package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter keys (SCALE.md): two-stage salted
  * aggregation. Stage 1 aggregates on (key, salt) — spreading a hot
  * key over `saltBuckets` reducers — stage 2 merges the partials on
  * the key alone. Correct for any associative aggregate; exposed here
  * for sum/count (decimal-exact, so salting never changes results).
  *
  * AQE's skew-join handling covers joins; this covers aggregations,
  * where a single hot group otherwise serializes one reducer at
  * 100 TB scale. The salt derives from ROW POSITION
  * (`monotonically_increasing_id`'s per-partition counter), not row
  * content: a content hash silently collapses to ONE bucket whenever
  * the hot key carries a constant or low-cardinality value (the norm
  * for heavy-hitter counters, e.g. value = 1), defeating the
  * mitigation exactly when it matters. Position salting spreads any
  * value distribution round-robin across buckets; which row lands in
  * which bucket is not stable across repartitions, but for the
  * associative aggregates exposed here the merged result is identical
  * regardless.
  */
object Skew {

  /** Salted exact sum+count of `valueCol` (cast to the given decimal
    * scale) grouped by `keyCols`.
    */
  def saltedSumCount(df: DataFrame, keyCols: Seq[String], valueCol: Column,
                     saltBuckets: Int = 16): DataFrame =
    saltedPartials(df, keyCols, valueCol, saltBuckets)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__psum")).as("sum_value"), sum(col("__pcnt")).as("n"))

  /** Salted equi-join for hot-key joins where BOTH sides are too big
    * to broadcast: the skewed (big) side gets a position-derived salt
    * in [0, buckets); the other side is replicated once per salt value
    * via a literal-array explode; the join runs on (key, salt), so a
    * hot key's rows spread over `buckets` reducers instead of
    * serializing one. Output is identical to the unsalted join (every
    * big-side row still meets every matching small-side row exactly
    * once — its one salt copy).
    *
    * This is the EXPLICIT form of what AQE's OptimizeSkewedJoin does
    * adaptively by splitting oversized partitions at runtime. Keep AQE
    * as the default; reach for this when the skew is known ahead of
    * time and deterministic partition sizing matters (e.g. the join
    * feeds a same-key aggregate whose exchange reuse would be broken
    * by AQE's split), or on engines/paths where AQE is disabled.
    * Replication multiplies the small side ×buckets — size it so
    * |small| × buckets stays shuffle-friendly.
    *
    * Only inner and left_outer are sound here (the replicated side's
    * unmatched rows appear `buckets` times under right/full outer).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 buckets: Int = 8, joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left_outer",
      s"saltedJoin supports inner/left_outer, got $joinType")
    val salted = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(buckets.toLong)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(array((0 until buckets).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Stage 1 alone (one row per key × occupied salt bucket) — exposed
    * for tests that assert a hot key actually OCCUPIES multiple
    * buckets, the property the value-hash salt silently lost.
    */
  private[graft] def saltedPartials(df: DataFrame, keyCols: Seq[String],
                                    valueCol: Column, saltBuckets: Int): DataFrame = {
    // monotonically_increasing_id = (partitionId << 33) | rowInPartition;
    // mod saltBuckets (a power of two well below 2^33) this cycles
    // 0..saltBuckets-1 within every partition — even occupancy no
    // matter what the values are
    val salt = pmod(monotonically_increasing_id(), lit(saltBuckets.toLong))
      .as("__salt")
    df.groupBy(keyCols.map(col) :+ salt: _*)
      .agg(sum(valueCol).as("__psum"), count(lit(1)).as("__pcnt"))
  }
}
