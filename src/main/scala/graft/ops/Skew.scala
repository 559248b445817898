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
  * 100 TB scale. The salt is a deterministic hash of intra-row
  * content (not rand()), keeping runs reproducible.
  */
object Skew {

  /** Salted exact sum+count of `valueCol` (cast to the given decimal
    * scale) grouped by `keyCols`.
    */
  def saltedSumCount(df: DataFrame, keyCols: Seq[String], valueCol: Column,
                     saltBuckets: Int = 16): DataFrame = {
    val salt = pmod(hash(valueCol), lit(saltBuckets)).as("__salt")
    val partial = df
      .groupBy(keyCols.map(col) :+ salt: _*)
      .agg(sum(valueCol).as("__psum"), count(lit(1)).as("__pcnt"))
    partial
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__psum")).as("sum_value"), sum(col("__pcnt")).as("n"))
  }
}
