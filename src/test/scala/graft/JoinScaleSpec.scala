package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-stream interval joins and bucketed (pre-shuffled) joins —
  * the remaining join modalities of the scale story.
  */
class JoinScaleSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  case class Click(c_user: Long, c_ts: Timestamp, c_id: Long)
  case class Err(e_user: Long, e_ts: Timestamp, e_id: Long)

  test("stream-stream interval join with watermarks") {
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[Click]
    val errors = MemoryStream[Err]
    val joined = clicks.toDF().withWatermark("c_ts", "1 hour")
      .join(errors.toDF().withWatermark("e_ts", "1 hour"),
        expr("""c_user = e_user AND
                e_ts >= c_ts AND e_ts <= c_ts + INTERVAL 10 MINUTES"""))
    val q = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    try {
      clicks.addData(
        Click(1, ts("2024-01-01 10:00:00"), 100),
        Click(2, ts("2024-01-01 10:00:00"), 200))
      errors.addData(
        Err(1, ts("2024-01-01 10:05:00"), 900), // within 10 min of click 100
        Err(1, ts("2024-01-01 10:30:00"), 901), // outside the interval
        Err(3, ts("2024-01-01 10:05:00"), 902)) // no matching user
      q.processAllAvailable()
      val pairs = spark.table("ss_join").select("c_id", "e_id")
        .as[(Long, Long)].collect().toSet
      assert(pairs === Set((100L, 900L)))
    } finally q.stop()
  }

  test("bucketed tables join without a shuffle") {
    val wh = Files.createTempDirectory("graft_wh").toString
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    val li = Tables.load(s, sf0001, "lineitem").select("l_orderkey", "l_quantity")
    val o = Tables.load(s, sf0001, "orders").select("o_orderkey", "o_totalprice")
    li.write.mode("overwrite").option("path", s"$wh/li_b")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_b")
    o.write.mode("overwrite").option("path", s"$wh/o_b")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("o_b")
    try {
      val joined = s.table("li_b")
        .join(s.table("o_b"), col("l_orderkey") === col("o_orderkey"))
      val shuffles = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty,
        s"bucketed join still shuffles:\n${joined.queryExecution.executedPlan}")
      // and it is still correct
      assert(joined.count() === li.count())
    } finally {
      s.sql("DROP TABLE IF EXISTS li_b")
      s.sql("DROP TABLE IF EXISTS o_b")
    }
  }
}
