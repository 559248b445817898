package graft

import org.apache.spark.sql.functions._

import graft.queries.BehaviorQueries

/** Behavioral-analytics operators (BehaviorQueries): funnel plan shape
  * and monotonicity, skyline correctness against an in-test brute
  * force plus partitioning invariance, cohort accounting identities,
  * and the Z-order key's bijectivity / locality-rectangle guarantees.
  */
class BehaviorSpec extends SparkSpec {

  private def run(name: String, dir: String) =
    SparkEntry.allQueries.find(_.name == name).get.run(spark, dir)

  test("funnel_steps plans ONE user sort feeding all four stages") {
    val p = run("funnel_steps", sf0001)
      .queryExecution.executedPlan.toString
    val sorts = p.linesIterator.count(_.trim.startsWith("+- Sort"))
    assert(sorts == 1, s"expected one Sort for four funnel windows:\n$p")
    val userExchanges = p.linesIterator
      .count(l => l.contains("hashpartitioning(user_id"))
    assert(userExchanges == 1,
      s"expected one user_id exchange, got $userExchanges:\n$p")
  }

  test("funnel counts are monotone and bounded by the user universe") {
    val r = run("funnel_steps", sf001).collect()(0)
    val Seq(s1, s2, s3, s4) = (0 to 3).map(r.getLong)
    assert(s1 >= s2 && s2 >= s3 && s3 >= s4,
      s"funnel not monotone: $s1 >= $s2 >= $s3 >= $s4")
    val users = Tables.load(spark, sf001, "events")
      .select("user_id").distinct().count()
    assert(s1 <= users && s4 > 0)
  }

  test("skyline matches the in-test brute force at sf0.001") {
    val got = run("skyline_events", sf0001)
      .select("event_type", "event_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val rows = Tables.load(spark, sf0001, "events")
      .select("event_type", "event_id", "value", "ts").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getTimestamp(3).getTime))
    val expect = rows.filter { case (t, id, v, ts) =>
      !rows.exists { case (t2, id2, v2, ts2) =>
        t2 == t && ((v2 >= v && ts2 >= ts && (v2 > v || ts2 > ts)) ||
          (v2 == v && ts2 == ts && id2 < id))
      }
    }.map(r => (r._1, r._2)).toSet
    assert(got == expect)
  }

  test("skyline is invariant to the physical partitioning of its input") {
    val ev = Tables.load(spark, sf0001, "events")
      .select("event_type", "event_id", "value", "ts")
    def skyline(df: org.apache.spark.sql.DataFrame): Set[Long] = {
      val local = BehaviorQueries.localSkyline(df)
      BehaviorQueries.skylinePass(local, Seq("event_type"))
        .select("event_id").collect().map(_.getLong(0)).toSet
    }
    val base = skyline(ev)
    for (n <- Seq(1, 7, 32))
      assert(skyline(ev.repartition(n)) == base,
        s"skyline changed under repartition($n)")
  }

  test("skyline's only full-table exchange is the survivors' event_type shuffle") {
    val p = run("skyline_events", sf0001)
      .queryExecution.executedPlan.toString
    val exchanges = p.linesIterator.filter(_.contains("Exchange ")).toList
    assert(exchanges.count(_.contains("hashpartitioning(event_type")) == 1,
      s"expected one event_type exchange:\n$p")
    assert(exchanges.count(_.contains("rangepartitioning")) == 1,
      s"expected one presentation-sort exchange:\n$p")
    assert(exchanges.size == 2,
      s"local pass must be exchange-free; found:\n${exchanges.mkString("\n")}")
  }

  test("scd2_intervals plans one user_id exchange for both windows") {
    val p = run("scd2_intervals", sf0001)
      .queryExecution.executedPlan.toString
    val userExchanges = p.linesIterator
      .count(_.contains("hashpartitioning(user_id"))
    assert(userExchanges == 1,
      s"lag and lead must share one user_id exchange, got $userExchanges:\n$p")
  }

  test("scd2 intervals chain per user: valid_to = next valid_from, types alternate") {
    val rows = run("scd2_intervals", sf001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
        Option(r.getTimestamp(3))))
    rows.groupBy(_._1).foreach { case (u, ivs) =>
      val sorted = ivs.sortBy(_._3.getTime)
      sorted.sliding(2).foreach {
        case Array((_, t1, _, Some(end)), (_, t2, from, _)) =>
          assert(end == from, s"user $u: interval gap at $from")
          assert(t1 != t2, s"user $u: non-change row for $t2")
        case _ =>
      }
      assert(sorted.last._4.isEmpty, s"user $u: last interval not open")
    }
  }

  test("cohort day-0 actives equal the user universe; offsets stay in range") {
    val rows = run("cohort_retention", sf001).collect()
    val offsets = rows.map(_.getLong(1))
    assert(offsets.forall(o => o >= 0 && o <= 7))
    val day0 = rows.filter(_.getLong(1) == 0L).map(_.getLong(2)).sum
    val users = Tables.load(spark, sf001, "events")
      .select("user_id").distinct().count()
    // every user is active on their own first day, exactly once
    assert(day0 == users, s"day-0 actives $day0 != $users users")
  }

  test("zInterleave is a bijection on the 8-bit x 8-bit grid") {
    val grid = spark.range(256 * 256).select(
      (col("id") % 256).as("ux"), (col("id") / 256).cast("long").as("vb"))
    val keys = grid.select(
      BehaviorQueries.zInterleave(col("ux"), col("vb")).as("z"))
    val stats = keys.agg(
      countDistinct("z").as("d"), min("z").as("lo"), max("z").as("hi"))
      .collect()(0)
    assert(stats.getLong(0) == 65536L)
    assert(stats.getLong(1) == 0L && stats.getLong(2) == 65535L)
  }

  test("hilbert key: full-grid bijection and an independent Scala walk agree") {
    import spark.implicits._
    // independent recompute: the textbook xy2d loop in plain Scala
    def xy2d(x0: Long, y0: Long): Long = {
      var (x, y, d) = (x0, y0, 0L)
      var s = 128L
      while (s > 0) {
        val rx = if ((x & s) > 0) 1L else 0L
        val ry = if ((y & s) > 0) 1L else 0L
        d += s * s * ((3 * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = 255 - x; y = 255 - y }
          val t = x; x = y; y = t
        }
        s >>= 1
      }
      d
    }
    val grid = (0 until 256).flatMap(x => (0 until 256).map(y =>
      (x.toLong, y.toLong))).toDF("ux", "vb")
    val keyed = BehaviorQueries.withHilbertKey(grid)
      .select("ux", "vb", "d").as[(Long, Long, Long)].collect()
    assert(keyed.length === 65536)
    keyed.foreach { case (x, y, d) =>
      assert(d === xy2d(x, y), s"hilbert key mismatch at ($x, $y)")
    }
    val ds = keyed.map(_._3).toSet
    assert(ds.size === 65536 && ds.min === 0L && ds.max === 65535L,
      "xy2d must biject the 256x256 grid onto 0..65535")
    // adjacency: consecutive d values are grid neighbors — the
    // locality property that makes the layout worth having
    val byD = keyed.map(t => t._3 -> (t._1, t._2)).toMap
    (0L until 65535L).foreach { d =>
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1,
        s"curve jumps between d=$d and ${d + 1}")
    }
  }

  test("zorder buckets are compact (user, value) rectangles covering all rows") {
    val rows = run("zorder_layout", sf001).collect()
    val total = rows.map(_.getLong(1)).sum
    assert(total == Tables.load(spark, sf001, "events").count())
    rows.foreach { r =>
      // zbucket pins the top 3 bits of both 8-bit codes, so each
      // bucket's extent is at most a 32 x 32 rectangle
      assert(r.getLong(3) - r.getLong(2) <= 31,
        s"ux extent too wide in bucket ${r.getLong(0)}")
      assert(r.getLong(5) - r.getLong(4) <= 31,
        s"vb extent too wide in bucket ${r.getLong(0)}")
    }
  }
}
