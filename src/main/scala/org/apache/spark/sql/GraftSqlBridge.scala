package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 made the `Column` <-> catalyst `Expression` bridge
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`).
  * Extension libraries that define native Catalyst expressions need it,
  * so expose the two conversions from inside the package — the standard
  * technique for Spark-native extension libraries.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** `org.apache.spark.sql.types.AbstractDataType` is `private[sql]`
    * in Spark 4, yet `ExpectsInputTypes.inputTypes` (the analysis-time
    * input contract every well-behaved expression should declare)
    * requires it in its signature. Re-export it so graft expressions
    * can override `inputTypes` from outside the sql package.
    */
  type AbstractDataType = org.apache.spark.sql.types.AbstractDataType

  /** `NormalizeFloatingNumbers.normalize` is `private[sql]`; foreign
    * plan nodes must normalize float/double grouping keys themselves
    * (the optimizer rule only rewrites known operators), so re-export
    * it. No-op for types that don't need normalization.
    */
  def normalizeFloat(e: Expression): Expression =
    org.apache.spark.sql.catalyst.optimizer.NormalizeFloatingNumbers.normalize(e)

  /** `Dataset.ofRows` is `private[sql]`; custom logical operators
    * (graft.plans.TopKPerGroup) need it to wrap their plan node in a
    * DataFrame.
    */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
