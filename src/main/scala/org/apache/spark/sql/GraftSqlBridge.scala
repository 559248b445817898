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
}
