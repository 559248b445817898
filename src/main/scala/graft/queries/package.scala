package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object queries {

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
