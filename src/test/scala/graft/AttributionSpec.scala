package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** Semantic pins for the wave-7 queries (JSD drift, stratified ATE,
  * Markov removal-effect attribution): identical distributions score
  * JSD 0 and disjoint ones score 1, a constant within-stratum uplift
  * is recovered exactly by the standardized estimator, and a
  * hand-built two-path funnel attributes all credit to the only
  * channel on the converting path.
  */
class AttributionSpec extends SparkSpec {

  private def run(name: String, dir: String) =
    SparkEntry.queries(name)(spark, dir)

  test("jsd_sources: 0 for identical token distributions, 1 for disjoint") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_jsd").toString
    Seq(
      (1L, "apple banana cherry apple", "en", "same_a", 25L),
      (2L, "apple banana cherry apple", "en", "same_b", 25L),
      (3L, "dog elephant fox gorilla", "en", "other", 24L),
      (4L, "dog elephant fox gorilla", "en", "other", 24L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val rows = run("jsd_sources", dir).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    // same_a vs rest: rest = same_b (identical dist) + other (disjoint)
    // -> strictly between 0 and 1; 'other' vs rest is fully disjoint -> 1
    assert(rows("other") === 1.0, s"disjoint vocab must hit the JSD ceiling: $rows")
    assert(rows("same_a") > 0.0 && rows("same_a") < 1.0)
    // a clean 0: corpus of ONLY the two identical sources
    val dir2 = java.nio.file.Files.createTempDirectory("graft_jsd2").toString
    Seq(
      (1L, "apple banana cherry apple", "en", "same_a", 25L),
      (2L, "apple banana cherry apple", "en", "same_b", 25L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir2/documents.parquet")
    val rows2 = run("jsd_sources", dir2).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(rows2 === Map("same_a" -> 0.0, "same_b" -> 0.0),
      s"identical distributions must score JSD 0: $rows2")
  }

  test("propensity_strata recovers a constant within-stratum uplift exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_psm").toString
    var id = 0L
    val buf = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Timestamp, Long, String, Double, String)]
    val t0 = Timestamp.valueOf("2024-01-01 08:00:00").getTime
    // user u gets `n` events; converts iff `conv` (first event purchase)
    def user(u: Long, n: Int, conv: Boolean): Unit =
      (0 until n).foreach { i =>
        id += 1
        buf += ((id, new Timestamp(t0 + i * 60000L), u,
          if (conv && i == 0) "purchase" else "view", 1.0,
          null.asInstanceOf[String]))
      }
    // stratum 1 (<=20 events): exposed (even) 6/10 convert, control 4/10
    (1 to 10).foreach(i => user(2L * i, 5, i <= 6))
    (1 to 10).foreach(i => user(2L * i + 1, 5, i <= 4))
    // stratum 4 (>60): exposed 9/10 convert, control 7/10
    (1 to 10).foreach(i => user(100L + 2L * i, 70, i <= 9))
    (1 to 10).foreach(i => user(100L + 2L * i + 1, 70, i <= 7))
    buf.toSeq.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val rows = run("propensity_strata", dir).orderBy("stratum").collect()
    assert(rows.map(_.getInt(0)).toSeq === Seq(1, 4))
    rows.foreach { r =>
      assert(r.getLong(1) === 20L && r.getLong(2) === 10L && r.getLong(3) === 10L)
      assert(r.getDouble(6) === 0.2, "within-stratum uplift is 0.2 in both strata")
      assert(r.getDouble(7) === 0.2, "standardized ATE recovers the constant uplift")
    }
    assert(rows(0).getDouble(4) === 0.6 && rows(0).getDouble(5) === 0.4)
    assert(rows(1).getDouble(4) === 0.9 && rows(1).getDouble(5) === 0.7)
  }

  test("qini_curve: uplift concentrated in the high-activity cohort") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_qini").toString
    val t0 = Timestamp.valueOf("2024-01-01 08:00:00").getTime
    var id = 0L
    val buf = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Timestamp, Long, String, Double, String)]
    def user(u: Long, n: Int, conv: Boolean): Unit =
      (0 until n).foreach { i =>
        id += 1
        buf += ((id, new Timestamp(t0 + i * 60000L), u,
          if (conv && i == 0) "purchase" else "view", 1.0,
          null.asInstanceOf[String]))
      }
    // high activity (10 events): exposed (even) all convert, control none
    (1 to 5).foreach(i => user(2L * i, 10, conv = true))
    (1 to 5).foreach(i => user(2L * i + 1, 10, conv = false))
    // low activity (2 events): nobody converts
    (1 to 5).foreach(i => user(100L + 2L * i, 2, conv = false))
    (1 to 5).foreach(i => user(100L + 2L * i + 1, 2, conv = false))
    buf.toSeq.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val rows = run("qini_curve", dir).orderBy(col("score").desc).collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(10L, 2L))
    val hi = rows(0)
    assert(hi.getLong(2) === 5L && hi.getLong(3) === 5L)
    assert(hi.getDouble(6) === 5.0,
      "targeting the high-activity half captures all 5 incremental conversions")
    val all = rows(1)
    assert(all.getLong(1) === 20L && all.getDouble(6) === 5.0,
      "the full-population endpoint equals total incremental conversions")
  }

  test("auc_by_source: single-class slices are NULL, mixed slices score in [0,1]") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sauc").toString
    // 'mix': alternate docs built to pass / fail the label rule;
    // 'lowq': 5-token docs can never be label 1 (needs 20..90 tokens)
    val goodWords = (1 to 38).map(i => f"word$i%02dxx").mkString(" ")
    val good = s"the a $goodWords"
    val docs =
      (1 to 4).map(i => (i.toLong, good, "en", "mix", good.length.toLong)) ++
      (5 to 8).map(i => (i.toLong, "tiny short words here now", "en", "mix", 25L)) ++
      (9 to 12).map(i => (i.toLong, "tiny short words here now", "en", "lowq", 25L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val rows = run("auc_by_source", dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(rows("lowq")._1 === 0L && rows("lowq")._3 === None,
      "a slice with no positives must report NULL AUC, not crash")
    assert(rows("mix")._1 === 4L && rows("mix")._2 === 4L)
    val auc = rows("mix")._3.get
    assert(auc >= 0.0 && auc <= 1.0)
  }

  test("markov_attribution credits the only channel on the converting path") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_mattr").toString
    val t0 = Timestamp.valueOf("2024-01-01 08:00:00").getTime
    var id = 0L
    val buf = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Timestamp, Long, String, Double, String)]
    def ev(u: Long, i: Int, t: String): Unit = {
      id += 1
      buf += ((id, new Timestamp(t0 + i * 60000L), u, t, 1.0,
        null.asInstanceOf[String]))
    }
    // 5 users: click -> purchase; 5 users: view only (no conversion)
    (1 to 5).foreach { u => ev(u, 0, "click"); ev(u, 1, "purchase") }
    (6 to 10).foreach { u => ev(u, 0, "view") }
    buf.toSeq.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val rows = run("markov_attribution", dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet === Set("click", "error", "signup", "view"))
    rows.values.foreach(r => assert(r.getDouble(1) === 0.5,
      "P(conv) = P(START->click) = 0.5"))
    val click = rows("click")
    assert(click.getDouble(2) === 0.0 && click.getDouble(3) === 1.0
      && click.getDouble(4) === 1.0,
      "removing click kills every conversion: full removal effect and credit")
    Seq("error", "signup", "view").foreach { c =>
      val r = rows(c)
      assert(r.getDouble(2) === 0.5 && r.getDouble(3) === 0.0
        && r.getDouble(4) === 0.0,
        s"$c is never on a converting path: zero effect, zero credit")
    }
  }

  test("shapley_attribution: symmetry and efficiency on a planted coalition game") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_shap").toString
    var id = 0L
    val buf = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Timestamp, Long, String, Double, String)]
    val t0 = Timestamp.valueOf("2024-01-01 08:00:00").getTime
    def user(u: Long, chans: Seq[String], conv: Boolean): Unit = {
      (chans ++ (if (conv) Seq("purchase") else Nil)).zipWithIndex.foreach {
        case (c, i) =>
          id += 1
          buf += ((id, new Timestamp(t0 + i * 60000L), u, c, 1.0,
            null.asInstanceOf[String]))
      }
    }
    // click and view are exchangeable by construction:
    // v({c}) = v({v}) = 0.5, v({c,v}) = 1.0, everything else unobserved
    (1 to 10).foreach(i => user(i.toLong, Seq("click"), i <= 5))
    (1 to 10).foreach(i => user(100L + i, Seq("view"), i <= 5))
    (1 to 10).foreach(i => user(200L + i, Seq("click", "view"), conv = true))
    buf.toSeq.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val rows = run("shapley_attribution", dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows("click").getLong(1) === 20L && rows("view").getLong(1) === 20L)
    assert(rows("error").getLong(1) === 0L && rows("signup").getLong(1) === 0L)
    // SYMMETRY: exchangeable players get identical Shapley values
    assert(rows("click").getDouble(2) === rows("view").getDouble(2))
    assert(rows("error").getDouble(2) === rows("signup").getDouble(2))
    // EFFICIENCY: sum of phis = v(full set) - v(empty) = 0 - 0 here
    // (the full 4-channel coalition is unobserved -> v = 0 by the
    // documented convention); exact up to the 9-dp term quantization
    val tot = rows.values.map(_.getDouble(2)).sum
    assert(math.abs(tot) < 1e-6, s"efficiency violated: sum phi = $tot")
    // the observed-cohort channels carry positive credit, paid for by
    // the never-touched channels' negative marginals onto v=0 cohorts
    assert(rows("click").getDouble(2) > 0.0)
    assert(rows("error").getDouble(2) < 0.0)
  }
}
