package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.TopKPerGroup

/** The custom LogicalPlan + Strategy + SparkPlan operator: bounded-heap
  * top-k-per-group. Verified against the window row_number form and by
  * plan shape (no sort, no WindowExec; the strategy's exec node plans).
  */
class TopKPerGroupPlanSpec extends SparkSpec {

  private def li = Tables.load(spark, sf0001, "lineitem")
    .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")

  test("equals row_number() OVER w <= k exactly (values AND ranks)") {
    val native = TopKPerGroup(li, Seq("l_returnflag"),
      Seq(("l_extendedprice", true), ("l_orderkey", false), ("l_linenumber", false)),
      3)
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    val windowed = li.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
    assert(native.exceptAll(windowed).isEmpty
      && windowed.exceptAll(native).isEmpty,
      "native top-k diverged from window form")
    assert(native.count() === windowed.count())
  }

  test("plans as two-phase TopKPerGroupExec; only SURVIVORS are sorted; no WindowExec") {
    val native = TopKPerGroup(li, Seq("l_returnflag"),
      Seq(("l_extendedprice", true), ("l_orderkey", false), ("l_linenumber", false)), 3)
    val plan = native.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), s"strategy did not fire:\n$plan")
    assert(!plan.contains("WindowExec"), s"fell back to window plan:\n$plan")
    // memory-bound shape: raw input feeds the HEAP (partial) pass
    // un-sorted; the spillable SortExec sits ABOVE the partial pass, so
    // it only ever sees pruned survivors. Plan prints top-down:
    // final exec < Sort < partial exec.
    val idxFinal = plan.indexOf("TopKPerGroup")
    val idxSort = plan.indexOf("Sort ")
    val idxPartial = plan.lastIndexOf("TopKPerGroup")
    assert(idxSort > idxFinal && idxSort < idxPartial,
      s"sort is not between final and partial (only survivors may sort):\n$plan")
    assert(!plan.substring(idxPartial).toLowerCase.contains("sort"),
      s"raw input below the partial pass is sorted:\n$plan")
  }

  test("flush path: tiny maxRetained on high-cardinality groups still exact") {
    // group by l_orderkey → thousands of groups; cap the partial heap
    // map at 8 retained rows so it flushes hundreds of times per task.
    val order = Seq(("l_extendedprice", true), ("l_linenumber", false))
    val native = TopKPerGroup(li.repartition(5), Seq("l_orderkey"), order, 2,
      maxRetained = 8)
    val w = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_extendedprice").desc, col("l_linenumber"))
    val windowed = li.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
    assert(native.exceptAll(windowed).isEmpty
      && windowed.exceptAll(native).isEmpty,
      "flush-bounded top-k diverged from window form")
    assert(native.count() === windowed.count())
  }

  test("correct under any input partitioning (exchange inserted on demand)") {
    val parts = TopKPerGroup(li.repartition(7), Seq("l_returnflag"),
      Seq(("l_extendedprice", true), ("l_orderkey", false), ("l_linenumber", false)), 2)
    val one = TopKPerGroup(li.coalesce(1), Seq("l_returnflag"),
      Seq(("l_extendedprice", true), ("l_orderkey", false), ("l_linenumber", false)), 2)
    assert(parts.exceptAll(one).isEmpty && one.exceptAll(parts).isEmpty)
  }

  test("float group keys: -0.0 and 0.0 are ONE group (sort-equality, not byte-equality)") {
    import spark.implicits._
    val df = Seq((0.0, 1L), (-0.0, 2L), (0.0, 3L), (1.5, 4L))
      .toDF("g", "id")
    val native = TopKPerGroup(df, Seq("g"), Seq(("id", false)), 2)
    val w = Window.partitionBy(col("g")).orderBy(col("id"))
    val windowed = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
    // Spark's groupBy/window normalize -0.0 into 0.0: one group of ids
    // {1,2,3} (top-2 = 1,2) plus {4} — the native operator must agree
    assert(native.count() === windowed.count(),
      "byte-equality split the -0.0/0.0 run into extra ranked rows")
    assert(native.select("id", "rn").exceptAll(windowed.select("id", "rn")).isEmpty)
  }

  test("k larger than group size returns whole groups, ranks dense from 1") {
    val native = TopKPerGroup(
      li.filter(col("l_orderkey") < 100), Seq("l_returnflag"),
      Seq(("l_extendedprice", true), ("l_orderkey", false), ("l_linenumber", false)),
      1000000)
    import spark.implicits._
    val byGroup = native.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), max(col("rn")).as("maxrn"), min(col("rn")).as("minrn"))
      .as[(String, Long, Int, Int)].collect()
    byGroup.foreach { case (g, n, maxrn, minrn) =>
      assert(minrn === 1 && maxrn.toLong === n, s"group $g ranks not dense 1..$n")
    }
    assert(native.count() === li.filter(col("l_orderkey") < 100).count())
  }
}
