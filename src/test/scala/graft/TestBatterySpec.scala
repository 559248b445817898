package graft

import java.sql.Timestamp

/** Semantic pins for the round-10 inference battery (Wilcoxon
  * signed-rank, runs test, Friedman, Bartlett, Cohen's d, Granger).
  * The DuckDB oracle gate owns value-level correctness; these pin
  * range/sign invariants and detection on constructed fixtures —
  * dominant-side Wilcoxon saturating W+, alternating vs trending runs
  * flipping the z sign, a consistent daily ordering saturating
  * Friedman, and a perfectly lag-predictive series driving Granger's
  * unrestricted RSS to zero.
  */
class TestBatterySpec extends SparkSpec {

  private def run(name: String, dir: String) =
    SparkEntry.queries(name)(spark, dir)

  /** events fixture: one event per (day, type) pair with enough rows
    * to set the DAILY COUNT per type exactly — `counts(t)(i)` events
    * of type t on day i.
    */
  private def eventsDir(counts: Map[String, Seq[Int]]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_tb").toString
    val day0 = 1700006400000L // aligned to a UTC day boundary? not needed: same day for all rows of index i
    val rows = for {
      (t, cs) <- counts.toSeq
      (c, i) <- cs.zipWithIndex
      k <- 0 until c
    } yield (i * 100000L + k, new Timestamp(day0 + i * 86400000L + k),
      k.toLong, t, 1.0 + (k % 7), null.asInstanceOf[String])
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    dir
  }

  test("wilcoxon_signed_rank: a dominant side saturates W+ and drives z positive") {
    // clicks strictly above purchases every day, all |d| distinct:
    // every rank positive -> W+ = n(n+1)/2, z > 0, small p
    val n = 12
    val dir = eventsDir(Map(
      "click" -> (1 to n).map(i => 10 + 2 * i),
      "purchase" -> (1 to n).map(_ => 5)))
    val r = run("wilcoxon_signed_rank", dir).collect().head
    assert(r.getAs[Long]("n_pairs") === n.toLong)
    assert(r.getAs[Double]("w_plus") === n * (n + 1) / 2.0)
    assert(r.getAs[Double]("z") > 2.0)
    val p = r.getAs[Double]("p")
    assert(p >= 0.0 && p < 0.05, s"saturated W+ should be significant: $p")
  }

  test("runs_test: alternating flips z positive, a monotone trend flips it negative") {
    // alternation around the median -> maximum runs -> z > 0. The
    // lone 20 is the lower median (position 11 of 21) and drops; the
    // twenty alternating 10/30 days remain, giving 20 runs
    val alt = eventsDir(Map(
      "purchase" -> ((1 to 20).map(i => if (i % 2 == 0) 30 else 10) :+ 20)))
    val ra = run("runs_test", alt).collect().head
    assert(ra.getAs[Long]("runs") === ra.getAs[Long]("n1") + ra.getAs[Long]("n2"))
    assert(ra.getAs[Double]("z") > 2.0)
    // a monotone series has exactly 2 runs around its median -> z < 0
    val trend = eventsDir(Map("purchase" -> (1 to 20).map(i => i * 3)))
    val rt = run("runs_test", trend).collect().head
    assert(rt.getAs[Long]("runs") === 2L)
    assert(rt.getAs[Double]("z") < -2.0)
  }

  test("friedman_test: a consistent daily ordering saturates chi2 at 4n") {
    // five types with the same strict ordering every day: doubled rank
    // sums R2_j = 2jn, chi2 = 3*40n^2/(30n) = 4n; p closed-form small
    val n = 10
    val dir = eventsDir(Map(
      "click" -> Seq.fill(n)(50), "error" -> Seq.fill(n)(40),
      "purchase" -> Seq.fill(n)(30), "signup" -> Seq.fill(n)(20),
      "view" -> Seq.fill(n)(10)))
    val r = run("friedman_test", dir).collect().head
    assert(r.getAs[Long]("n_blocks") === n.toLong)
    assert(r.getAs[Int]("dof") === 4)
    assert(r.getAs[Double]("chi2") === 4.0 * n)
    assert(r.getAs[Double]("p") < 0.001)
    // incomplete blocks (a type missing on some days) must DROP those
    // days, not rank a 4-type block
    val holes = eventsDir(Map(
      "click" -> Seq.fill(n)(50), "error" -> Seq.fill(n)(40),
      "purchase" -> Seq.fill(n)(30), "signup" -> Seq.fill(n)(20),
      "view" -> (Seq.fill(n - 3)(10) ++ Seq.fill(3)(0))))
    val rh = run("friedman_test", holes).collect().head
    assert(rh.getAs[Long]("n_blocks") === (n - 3).toLong)
  }

  test("bartlett_test and cohens_d: equal groups degenerate correctly") {
    // identical distributions across types: chi2 ~ 0; purchase==view
    // daily totals -> d = 0 exactly
    val cs = (1 to 12).map(i => 10 + (i % 4) * 5)
    val dir = eventsDir(Map(
      "click" -> cs, "error" -> cs, "purchase" -> cs,
      "signup" -> cs, "view" -> cs))
    val b = run("bartlett_test", dir).collect().head
    assert(b.getAs[Long]("n_groups") === 5L)
    // the 6-dp census-term rounding leaves sub-1e-3 residue
    assert(math.abs(b.getAs[Double]("chi2")) < 1e-3)
    assert(b.getAs[Double]("p") > 0.99)
    val d = run("cohens_d", dir).collect().head
    assert(d.getAs[Double]("mean_diff") === 0.0)
    assert(d.getAs[Double]("cohens_d") === 0.0)
    assert(d.getAs[Double]("hedges_g") === 0.0)
  }

  test("granger_causality: a perfectly lag-predictive regressor kills the unrestricted RSS") {
    // y_t = x_{t-1} + tiny parity noise (exact zero RSS would make
    // the F guard's rssu>0 test float-fragile): the unrestricted fit
    // captures nearly everything, F explodes, incremental R2 -> 1
    val xs = Seq(13, 31, 17, 41, 11, 37, 19, 43, 23, 29, 47, 53)
    val dir = eventsDir(Map(
      "click" -> (xs :+ 20), // x on days 0..12
      "purchase" -> (20 +: xs.zipWithIndex.map { case (x, i) => x + i % 2 })))
    val r = run("granger_causality", dir).collect().head
    assert(r.getAs[Long]("n_obs") === 12L)
    assert(r.getAs[Double]("rss_unrestricted") < 10.0)
    assert(r.getAs[Double]("incr_r2") > 0.99)
    assert(r.getAs[Double]("f_stat") > 100.0)
  }
}
