package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join — an operator Spark lacks natively.
  *
  * Spark-first composition (preference (a) of the extension ladder —
  * no custom SparkPlan needed): union the two sides tagged
  * left/right, sort within each partition key by (ts, side-tag), and
  * carry the latest right row forward with
  * `last(..., ignoreNulls).over(rowsBetween(-inf, 0))`. One shuffle on
  * the partition key, one sort — the same cost shape as a sort-merge
  * join, and unlike a range join it never materializes candidate
  * pairs, so it scales to arbitrarily long histories.
  *
  * Tie semantics: a right row AT the left row's timestamp matches
  * ("at or before", right-before-left on equal ts) — the same contract
  * as DuckDB's `ASOF JOIN ... ON l.ts >= r.ts`, which serves as the
  * oracle.
  *
  * Duplicate right rows on the same (key, ts): the operator's rule is
  * total and deterministic — [[join]] (backward) keeps the GREATEST
  * value struct among the tied right rows (field-order struct
  * comparison), [[joinForward]] keeps the SMALLEST. This is a
  * graft-defined contract: SQL engines' ASOF joins make no tie
  * guarantee at all, so ORACLE-checked inputs must keep (key, ts)
  * unique on the right side (the fixture does — asserted in
  * AsOfSpec), while library callers get a pinned, reproducible answer
  * either way (also asserted in AsOfSpec with duplicated right rows).
  */
object AsOf {

  /** For each `left` row: all left columns + the chosen right-side
    * value columns (as `right_<name>`) from the most recent `right`
    * row with the same `keyCol` and `right.tsCol <= left.tsCol`; null
    * when no such row exists.
    */
  def join(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
           rightValueCols: Seq[String]): DataFrame = {
    val rightStruct = struct(rightValueCols.map(col): _*)
    val leftCols = left.columns.toSeq

    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__rv", lit(null).cast(
        right.select(rightStruct).schema.head.dataType))
    val r = right.select(
      Seq(col(keyCol), col(tsCol)) :+ rightStruct.as("__rv"): _*)
      .withColumn("__side", lit(0))
    // align schemas: right side carries nulls for non-key left columns
    val rAligned = r.select(
      leftCols.map(c =>
        if (c == keyCol || c == tsCol) col(c) else lit(null).as(c))
        ++ Seq(col("__side"), col("__rv")): _*)

    // __rv as the final sort key makes equal-ts right-row ties
    // deterministic (last() then picks the greatest value struct);
    // engines differ on which tie THEY pick, so oracled inputs should
    // keep (key, ts) unique on the right side
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__side"), col("__rv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.select(leftCols.map(col) ++ Seq(col("__side"), col("__rv")): _*)
      .unionByName(rAligned)
      .withColumn("__matched", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++ rightValueCols.map(c =>
        col(s"__matched.$c").as(s"right_$c")): _*)
  }

  /** Forward as-of: for each `left` row, the EARLIEST `right` row with
    * the same key and `right.tsCol >= left.tsCol` (null when none).
    * Same single-shuffle shape as [[join]], mirrored: left rows sort
    * BEFORE right rows on equal ts ("at or after" — a right row at the
    * left row's exact timestamp matches), and the earliest following
    * right value comes from `first(..., ignoreNulls)` over
    * `[currentRow, +inf)`. Oracle twin: DuckDB
    * `ASOF JOIN ... ON l.ts <= r.ts`.
    */
  def joinForward(left: DataFrame, right: DataFrame, keyCol: String,
                  tsCol: String, rightValueCols: Seq[String]): DataFrame = {
    val rightStruct = struct(rightValueCols.map(col): _*)
    val leftCols = left.columns.toSeq

    val l = left
      .withColumn("__side", lit(0))
      .withColumn("__rv", lit(null).cast(
        right.select(rightStruct).schema.head.dataType))
    val r = right.select(
      Seq(col(keyCol), col(tsCol)) :+ rightStruct.as("__rv"): _*)
      .withColumn("__side", lit(1))
    val rAligned = r.select(
      leftCols.map(c =>
        if (c == keyCol || c == tsCol) col(c) else lit(null).as(c))
        ++ Seq(col("__side"), col("__rv")): _*)

    // deterministic equal-ts ties as in [[join]]: first() picks the
    // smallest value struct among same-ts right rows
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__side"), col("__rv"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    l.select(leftCols.map(col) ++ Seq(col("__side"), col("__rv")): _*)
      .unionByName(rAligned)
      .withColumn("__matched", first(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      .select(leftCols.map(col) ++ rightValueCols.map(c =>
        col(s"__matched.$c").as(s"right_$c")): _*)
  }
}
