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
}
