package graft

/** One-query physical-plan dump for plan-shape work — the single-row
  * complement to [[PlanAudit]]'s suite-wide counts.
  *
  * Usage: runMain graft.DebugPlan <queryName> <sfDir>
  */
object DebugPlan {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").appName("graft-debug-plan")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(SparkEntry.queries(args(0))(spark, args(1))
      .queryExecution.executedPlan.toString)
    spark.stop()
  }
}
