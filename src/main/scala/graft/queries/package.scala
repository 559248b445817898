package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{concat, lit, raise_error, when}
import org.apache.spark.sql.types.DataType

package object queries {

  /** Overflow-LOUD narrowing cast. Spark's non-ANSI CAST yields NULL
    * on numeric overflow, and a downstream SUM silently drops those
    * rows — a silently wrong statistic, diverging from the DuckDB
    * oracle (which throws). This guard makes both engines fail loudly
    * at the cause: a non-null input whose narrowed value is null means
    * the cast overflowed → raise_error naming the offending value.
    * (The sessions deliberately do NOT enable spark.sql.ansi.enabled
    * suite-wide — other queries rely on non-ANSI null semantics — so
    * loudness is opted into per load-bearing cast.)
    */
  def loudCast(c: Column, dt: DataType, what: String): Column = {
    val narrowed = c.cast(dt)
    when(c.isNotNull && narrowed.isNull,
      raise_error(concat(
        lit(s"$what out of ${dt.simpleString} range: "), c.cast("string"))))
      .otherwise(narrowed)
  }

  /** One named, oracle-checkable query: the Spark implementation plus
    * (where SQL-expressible) the equivalent DuckDB SQL over the same
    * parquet tables. Column names/aliases MUST match between the two —
    * the driver sorts columns by name and hash-compares values.
    */
  final case class Q(
      name: String,
      run: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  object Q {
    def apply(name: String, oracle: String)(
        run: (SparkSession, String) => DataFrame): Q =
      Q(name, run, Some(oracle))

    /** Non-SQL-expressible op: driver records a weaker rows-only check. */
    def noOracle(name: String)(run: (SparkSession, String) => DataFrame): Q =
      Q(name, run, None)
  }
}
