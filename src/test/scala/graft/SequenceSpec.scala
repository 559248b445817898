package graft

import org.apache.spark.sql.functions._

/** Event-sequence analytics (SequenceQueries): Markov-matrix row
  * normalization and transition accounting, path assembly over the
  * bounded-heap top-k operator, gap-statistic identities, and the
  * map-side JSON extraction's plan shape.
  */
class SequenceSpec extends SparkSpec {

  private def run(name: String, dir: String) =
    SparkEntry.allQueries.find(_.name == name).get.run(spark, dir)

  test("markov transition rows normalize to 1 per prev_type; counts account for every adjacency") {
    val rows = run("markov_transitions", sf001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    rows.groupBy(_._1).foreach { case (prev, ts) =>
      val p = ts.map(_._4).sum
      // each term is rounded to 6 dp, so the row sum is 1 ± |row|*5e-7
      assert(math.abs(p - 1.0) < 1e-5, s"P(*|$prev) sums to $p")
    }
    val ev = Tables.load(spark, sf001, "events")
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(rows.map(_._3).sum == expected,
      s"adjacency count ${rows.map(_._3).sum} != events - users = $expected")
  }

  test("markov_transitions spends one user_id exchange on the lag window") {
    val p = run("markov_transitions", sf0001)
      .queryExecution.executedPlan.toString
    assert(p.linesIterator.count(_.contains("hashpartitioning(user_id")) == 1,
      s"expected exactly one user_id exchange:\n$p")
  }

  test("event_paths partitions the user universe; paths are 3 hops from the fixture alphabet") {
    val rows = run("event_paths", sf001).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val users = Tables.load(spark, sf001, "events")
      .select("user_id").distinct().count()
    assert(rows.map(_._2).sum == users,
      s"path users ${rows.map(_._2).sum} != $users")
    val types = Tables.load(spark, sf001, "events")
      .select("event_type").distinct().collect().map(_.getString(0)).toSet
    rows.foreach { case (path, _) =>
      val hops = path.split(">")
      // every sf0.01 user has >= 3 events, so no short paths here
      assert(hops.length == 3, s"path $path is not 3 hops")
      hops.foreach(h => assert(types(h), s"unknown event type $h in $path"))
    }
  }

  test("event_paths runs on TopKPerGroupExec, not a window sort") {
    val p = run("event_paths", sf0001).queryExecution.executedPlan.toString
    assert(p.contains("TopKPerGroup"), s"expected TopKPerGroupExec:\n$p")
    assert(!p.contains("RunningWindowFunction") && !p.contains("WindowExec"),
      s"path extraction must not fall back to a window sort:\n$p")
  }

  test("gap_stats identities: gap count = events - users, avg within [min, max]") {
    val rows = run("gap_stats", sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    val ev = Tables.load(spark, sf001, "events")
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(rows.map(_._2).sum == expected)
    rows.foreach { case (t, n, total, lo, hi, avg) =>
      assert(lo >= 0, s"$t: negative gap $lo — ordering broken")
      assert(lo <= hi && total >= n * lo && total <= n * hi, s"$t: bounds")
      assert(avg >= lo / 1e6 - 1e-6 && avg <= hi / 1e6 + 1e-6,
        s"$t: avg $avg outside [${lo / 1e6}, ${hi / 1e6}]")
    }
  }

  test("props_extract is exchange-minimal: one aggregate shuffle, no window, no join") {
    val df = run("props_extract", sf001)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"unexpected join:\n$p")
    assert(!p.contains("Window"), s"unexpected window:\n$p")
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.map(_._2).sum == Tables.load(spark, sf001, "events").count())
    assert(rows.forall { case (b, _) => b >= 0 && b <= 9 })
  }

  test("range_join_pairs window-rewrite precondition holds on every fixture SF") {
    // The window form of range_join_pairs counts forward neighbors as
    // (RANGE-frame count) - (tie rank), which equals the self-join's
    // e1.event_id < e2.event_id pair count ONLY when, per user, a
    // strictly earlier ts implies a strictly smaller event_id (true of
    // any log whose ids are assigned at append time). A fixture — or a
    // production feed — violating that would silently miscount, so the
    // invariant is pinned HERE for every SF the driver gates at:
    // max(event_id) over strictly-earlier-ts rows must never exceed
    // the current event_id.
    import org.apache.spark.sql.expressions.Window
    for (dir <- Seq(sf0001, sf001, "/root/testdata/sf0.1")) {
      val earlier = Window.partitionBy("user_id")
        .orderBy(unix_micros(col("ts")))
        .rangeBetween(Window.unboundedPreceding, -1)
      val violations = Tables.load(spark, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("max_earlier", max(col("event_id")).over(earlier))
        .filter(col("max_earlier") > col("event_id"))
        .count()
      assert(violations === 0L,
        s"$dir: $violations events break ts/event_id monotonicity — " +
          "the range_join_pairs window rewrite is unsound on this data")
    }
  }
}
