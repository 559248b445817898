package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** Semantic pins for the rank-statistics wave. The DuckDB oracle gate
  * owns value-level correctness; these pin what a hash compare can't:
  * known-answer fixtures (perfectly monotone data, Simpson-style
  * strata), invariants (BH step-up prefix property), and independent
  * JVM recomputes (Taylor-series normal tail vs the A&S polynomial).
  */
class RankStatSpec extends SparkSpec {

  private def run(name: String, dir: String) =
    SparkEntry.queries(name)(spark, dir)

  private def words(n: Int) = Seq.fill(n)("w").mkString(" ")

  // sources: "mono" x and y both strictly increasing; "anti" y
  // strictly decreasing in x; "tied" constant x (zero rank variance)
  private lazy val spearDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_spear").toString
    val rows =
      (1 to 10).map(i => (i.toLong, words(i + 1), "en", "mono", 10L * i)) ++
      (1 to 10).map(i => (100L + i, words(i + 1), "en", "anti", 10L * (11 - i))) ++
      (1 to 10).map(i => (200L + i, words(5), "en", "tied", 50L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("spearman_corr: +1 on monotone, -1 on anti-monotone, NULL on ties") {
    val rows = run("spearman_corr", spearDir).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
    assert(rows("mono") === Some(1.0))
    assert(rows("anti") === Some(-1.0))
    assert(rows("tied") === None, "zero rank variance must yield NULL, not a crash")
  }

  // event types: "inc" strictly increasing hourly value; "const" flat
  private lazy val trendDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_trend").toString
    val base = Timestamp.valueOf("2024-01-01 00:30:00").getTime
    val rows = (0 until 48).flatMap { h =>
      val t = new Timestamp(base + h * 3600000L)
      Seq((h.toLong * 2, t, 1L, "inc", 1.0 + h, null.asInstanceOf[String]),
        (h.toLong * 2 + 1, t, 2L, "const", 10.0, null.asInstanceOf[String]))
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    dir
  }

  test("mann_kendall: tau=1 and z>0 on a strict uptrend; NULL on constant") {
    val rows = run("mann_kendall", trendDir).collect()
      .map(r => r.getString(0) -> r).toMap
    val inc = rows("inc")
    assert(inc.getLong(1) === 48L)
    assert(inc.getLong(2) === 48L * 47 / 2, "S must count every pair concordant")
    assert(inc.getDouble(3) === 1.0)
    assert(inc.getDouble(4) > 9.0, s"uptrend z ${inc.getDouble(4)} should be large")
    val const = rows("const")
    assert(const.getLong(2) === 0L)
    assert(const.isNullAt(3) && const.isNullAt(4),
      "all-tied series has zero variance: tau and z must be NULL")
  }

  // sources: "tight" all docs 11 tokens (zero spread); "wide" tokens
  // 1,5,...,41 (median 21, deviations 0,4,...,20)
  private lazy val levDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_lev").toString
    val rows =
      (1 to 11).map(i => (i.toLong, words(11), "en", "tight", 100L)) ++
      (0 to 10).map(i => (100L + i, words(1 + 4 * i), "en", "wide", 100L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("levene_bf: zero-spread vs wide-spread groups yield a large F") {
    val rows = run("levene_bf", levDir).collect()
      .map(r => r.getString(0) -> r).toMap
    val tight = rows("tight")
    assert(tight.getDouble(2) === 11.0 && tight.getDouble(3) === 0.0)
    val wide = rows("wide")
    assert(wide.getDouble(2) === 21.0)
    // mean |dev|: deviations 20,16,...,0,...,16,20 sum 120 over 11
    assert(wide.getDouble(3) === 10.909091)
    val f = tight.getDouble(4)
    assert(f === wide.getDouble(4), "F is a family statistic, equal on every row")
    assert(f > 10.0, s"between-group spread dwarfs within: F=$f")
    assert(tight.getLong(5) === 1L && tight.getLong(6) === 20L)
  }

  test("benjamini_hochberg: p matches a Taylor-series normal tail; step-up prefix") {
    val rows = run("benjamini_hochberg", sf0001).orderBy("k").collect()
    assert(rows.nonEmpty)
    // independent recompute: two-sided p = erfc(|z|/sqrt(2)) via the
    // alternating Taylor series of erf (converges for |x| <= ~5)
    def erfTaylor(x: Double): Double = {
      var term = x; var sum = x; var n = 1
      while (math.abs(term) > 1e-18 && n < 200) {
        term = -term * x * x * (2 * n - 1) / (n * (2 * n + 1.0))
        sum += term; n += 1
      }
      sum * 2.0 / math.sqrt(math.Pi)
    }
    rows.foreach { r =>
      val z = math.abs(r.getDouble(1)); val p = r.getDouble(2)
      if (z <= 5.0) {
        val ref = 1.0 - erfTaylor(z / math.sqrt(2.0))
        assert(math.abs(p - ref) < 2e-6,
          s"A&S p=$p vs Taylor ref=$ref at z=$z (poly max err 1.5e-7 + 6dp round)")
      }
      assert(p >= 0.0 && p <= 1.0)
    }
    // p non-decreasing in k; significance is a prefix of the p-ranking
    val ps = rows.map(_.getDouble(2))
    assert(ps.zip(ps.tail).forall { case (a, b) => a <= b })
    val sig = rows.map(_.getBoolean(5))
    val firstFalse = sig.indexOf(false)
    if (firstFalse >= 0)
      assert(sig.drop(firstFalse).forall(!_),
        "BH rejections must be a prefix of the p-sorted family")
    // crit = 0.05*k/m rounded
    val m = rows.length
    rows.foreach { r =>
      val k = r.getLong(3)
      assert(r.getDouble(4) ===
        BigDecimal(0.05 * k / m).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  // Simpson-style strata: exposure helps within BOTH days, but day 2
  // is both mostly-unexposed and low-converting, so the crude pooled
  // OR understates the common OR the CMH estimator recovers.
  private lazy val cmhDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cmh").toString
    val d1 = Timestamp.valueOf("2024-01-01 12:00:00")
    val d2 = Timestamp.valueOf("2024-01-02 12:00:00")
    var id = 0L
    def userDay(day: Timestamp, user: Long, purchased: Boolean) = {
      id += 1
      (id, day, user, if (purchased) "purchase" else "view", 1.0,
        null.asInstanceOf[String])
    }
    // day1 (high-converting, mostly unexposed): exposed 9/10 convert,
    // unexposed 20/40 — within-stratum OR = 9
    val day1 = (1 to 10).map(i => userDay(d1, 2L * i, i <= 9)) ++
      (1 to 40).map(i => userDay(d1, 2L * i + 1, i <= 20))
    // day2 (low-converting, mostly EXPOSED): exposed 8/40 convert,
    // unexposed 1/10 — within-stratum OR = 2.25
    val day2 = (1 to 40).map(i => userDay(d2, 2L * i, i <= 8)) ++
      (1 to 10).map(i => userDay(d2, 2L * i + 1, i <= 1))
    (day1 ++ day2).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    dir
  }

  test("cmh_test recovers the stratum-level association (JVM recompute)") {
    val r = run("cmh_test", cmhDir).collect().head
    assert(r.getLong(0) === 2L)
    assert(r.getLong(1) === 17L) // 9 + 8 exposed converters
    // JVM recompute with the query's exact decimal-quantized terms
    case class S(a: Long, n1: Long, n0: Long, m1: Long, m0: Long, nk: Long)
    val strata = Seq(S(9, 10, 40, 29, 21, 50), S(8, 40, 10, 9, 41, 50))
    def q6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val e = strata.map(s => q6(s.n1.toDouble * s.m1 / s.nk)).sum
    val v = strata.map(s => q6(s.n1.toDouble * s.n0 * s.m1 * s.m0
      / (s.nk.toDouble * s.nk * (s.nk - 1)))).sum
    val rr = strata.map(s => q6(s.a.toDouble * (s.n0 - s.m1 + s.a) / s.nk)).sum
    val ss = strata.map(s => q6((s.n1 - s.a).toDouble * (s.m1 - s.a) / s.nk)).sum
    assert(r.getDouble(2) === e.toDouble && r.getDouble(3) === v.toDouble)
    val dev = math.abs(17.0 - e.toDouble) - 0.5
    assert(r.getDouble(4) ===
      q6(dev * dev / v.toDouble).toDouble)
    val orMh = r.getDouble(5)
    assert(orMh === q6(rr.toDouble / ss.toDouble).toDouble)
    assert(orMh > 3.0, s"exposure helps within both strata: OR_MH=$orMh")
    // full Simpson reversal: pooled 2x2 is exposed 17/50 vs
    // unexposed 21/50 — the crude OR says exposure HURTS
    val crude = 17.0 * 29.0 / (33.0 * 21.0)
    assert(crude < 1.0 && orMh > 1.0,
      s"Simpson reversal: crude=$crude flips against stratified=$orMh")
  }
}
