package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit utility: print the formatted physical plan of one or
  * more registered queries without executing them.
  *
  * Usage: runMain graft.Explain <sfDir> [queryName ...]
  * (no names = all queries). Same session config as Verify so the
  * audited plan is the shipped plan.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    // first arg is the sf dir ONLY if it actually is a directory — so
    // `runMain graft.Explain some_query` does what it reads as, and a
    // bare relative dir like `testdata` is still recognized
    val (sfDir, rest) = args.headOption match {
      case Some(d) if new java.io.File(d).isDirectory => (d, args.drop(1).toSeq)
      case _ => ("/root/testdata/sf0.001", args.toSeq)
    }
    val names = if (rest.nonEmpty) rest
                else SparkEntry.allQueries.map(_.name)
    val spark = SparkSession.builder()
      .appName("graft-explain").master("local[4]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val byName = SparkEntry.allQueries.map(q => q.name -> q).toMap
    names.foreach { n =>
      println(s"\n===== $n =====")
      byName.get(n) match {
        case Some(q) => println(q.run(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        case None => println(s"unknown query: $n")
      }
    }
    spark.stop()
  }
}
