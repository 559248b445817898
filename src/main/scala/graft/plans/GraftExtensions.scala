package graft.plans

import org.apache.spark.sql.SparkSessionExtensions

/** Session extension entry point — enable with
  * `spark.sql.extensions=graft.plans.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)` on the builder):
  *
  *  - injects [[RewriteNullProbeAsAntiJoin]] into the optimizer;
  *  - registering the `censor_text` SQL function is done per-session
  *    via [[graft.functions.CensorText.register]] (its word-list
  *    arguments are plan-time literals, not a fixed signature).
  *
  * For an already-running session, the rule can equivalently be added
  * with `spark.experimental.extraOptimizations`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => RewriteNullProbeAsAntiJoin)
    // whole-operator extension: bounded-heap top-k-per-group
    // (TopKPerGroupNode -> TopKPerGroupExec)
    e.injectPlannerStrategy(_ => TopKPerGroupStrategy)
  }
}
