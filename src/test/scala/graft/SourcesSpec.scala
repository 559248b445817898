package graft

import org.apache.spark.sql.functions._

import graft.ops.Moderation

/** Custom DataSource V2 connector behavior. */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private val fmt = "graft.sources.MessagesSource"

  test("golden mode serves the reference fixture and feeds the pipeline") {
    val msgs = spark.read.format(fmt).load()
    assert(msgs.columns.toSeq === Seq("sender", "text", "receiver"))
    assert(msgs.count() === 4)
    val blocked = Seq("login1:login2", "login1:login3", "login2:login4").toDF("bk")
    val out = Moderation.pipeline(msgs, blocked, Seq("Политика", "1C", "Алкоголь"))
      .select("sender", "text", "receiver")
      .as[(String, String, String)].collect().sortBy(_._1)
    assert(out === Array(
      ("login4", "Java", "login1"),
      ("login5", "******** React", "login1")))
  }

  test("synthetic mode: row count, partitioning, determinism") {
    val df = spark.read.format(fmt)
      .option("rows", 1000).option("partitions", 8).load()
    assert(df.count() === 1000)
    assert(df.rdd.getNumPartitions === 8)
    assert(df.select(countDistinct(col("sender"))).as[Long].head() === 7)
    // deterministic: two independent reads produce identical data
    val a = df.collect().map(_.toSeq).sortBy(_.toString)
    val b = spark.read.format(fmt).option("rows", 1000).option("partitions", 3)
      .load().collect().map(_.toSeq).sortBy(_.toString)
    assert(a === b) // partition count does not change content
  }

  test("filter pushdown: sender equality is absorbed by the scan (no residual Filter)") {
    val df = spark.read.format(fmt)
      .option("rows", 700).option("partitions", 4).load()
      .filter(col("sender") === "login3")
    // correctness: sender cycles mod 7 over 700 rows -> exactly 100
    assert(df.count() === 100)
    assert(df.select(countDistinct(col("sender"))).as[Long].head() === 1)
    // the EqualTo was fully handled by the source: Spark drops the
    // post-scan Filter node entirely
    val p = df.queryExecution.executedPlan.toString
    // no Filter NODE (the scan description legitimately mentions
    // "PushedFilters: [...]", which is not a node)
    assert(!p.contains(") Filter ") && !p.contains("+- Filter "),
      s"residual filter survived pushdown:\n$p")
    assert(p.contains("EqualTo(sender,login3)"), p)
    // content identical to the unpushed predicate applied manually
    val manual = spark.read.format(fmt)
      .option("rows", 700).option("partitions", 4).load()
      .collect().filter(_.getString(0) == "login3").map(_.toSeq).sortBy(_.toString)
    assert(df.collect().map(_.toSeq).sortBy(_.toString) === manual)
  }

  test("column pruning: the reader emits only projected fields") {
    val df = spark.read.format(fmt)
      .option("rows", 100).load()
      .select("text")
    assert(df.columns.toSeq === Seq("text"))
    assert(df.count() === 100)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReadSchema: struct<text:string>"),
      s"scan did not prune to the projected column:\n$p")
    // pruning + pushdown compose: filter column needn't be projected
    val both = spark.read.format(fmt).option("rows", 700).load()
      .filter(col("sender") === "login2").select("receiver")
    assert(both.count() === 100)
    assert(both.distinct().count() === 5)
  }
}
