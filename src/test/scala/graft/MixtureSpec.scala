package graft

import java.sql.Timestamp

/** Semantic pins for the count-mixture wave. The DuckDB oracle gate
  * owns value-level cross-engine equality; these pin what a hash
  * compare can't: a known bimodal fixture the EM must actually
  * separate, the under-dispersed degenerate case, and the exact
  * mean-preservation identity of the M-step.
  */
class MixtureSpec extends SparkSpec {

  private def run(name: String, dir: String) =
    SparkEntry.queries(name)(spark, dir)

  /** events fixture: `spec` = (userIdBase, nUsers, eventsPerUser)* */
  private def eventsDir(spec: (Long, Int, Int)*): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_mix").toString
    val rows = for {
      (base, nUsers, k) <- spec
      u <- 1 to nUsers
      i <- 1 to k
    } yield (base + u, new Timestamp(1700000000000L + i * 60000L),
      base + u, "view", 1.0, null.asInstanceOf[String])
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    dir
  }

  test("overdispersion_fit: exact moments on a bimodal census") {
    // 40 users x 2 events + 40 users x 20 events:
    // mean = 11, var = (16160 - 80*121)/79 = 6480/79
    val dir = eventsDir((0L, 40, 2), (1000L, 40, 20))
    val r = run("overdispersion_fit", dir).collect().head
    assert(r.getLong(0) === 80L)
    assert(r.getDouble(1) === 11.0)
    val varExp = BigDecimal(6480.0 / 79)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(2) === varExp)
    assert(r.getDouble(3) > 1.0, "bimodal counts must be overdispersed")
    // r_hat = mean^2 / (var - mean)
    val rhatExp = BigDecimal(121.0 / (6480.0 / 79 - 11.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(4) === rhatExp)
  }

  test("overdispersion_fit: under-dispersed data yields NULL r_hat, not a crash") {
    // every user has exactly 5 events -> var = 0 < mean
    val dir = eventsDir((0L, 30, 5))
    val r = run("overdispersion_fit", dir).collect().head
    assert(r.getLong(0) === 30L)
    assert(r.getDouble(1) === 5.0)
    assert(r.getDouble(2) === 0.0)
    assert(r.getDouble(3) === 0.0)
    assert(r.isNullAt(4), "NB moment equations have no solution at var <= mean")
  }

  test("poisson_em separates a planted two-regime population") {
    val dir = eventsDir((0L, 40, 2), (1000L, 40, 20))
    val r = run("poisson_em", dir).collect().head
    assert(r.getLong(0) === 80L)
    val (l1, l2, w) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    // planted lambdas are 2 and 20 with equal weights; 8 EM rounds
    // from the mean/2 // mean*2 init must land close on this census
    assert(math.abs(l1 - 2.0) < 0.1, s"lambda_low=$l1")
    assert(math.abs(l2 - 20.0) < 0.1, s"lambda_high=$l2")
    assert(math.abs(w - 0.5) < 0.01, s"weight_low=$w")
    assert(r.getLong(4) === 40L, "hard assignment must recover the planted split")
  }

  test("poisson_em M-step preserves the corpus mean (real data)") {
    val em = run("poisson_em", sf0001).collect().head
    val mo = run("overdispersion_fit", sf0001).collect().head
    val (l1, l2, w) = (em.getDouble(1), em.getDouble(2), em.getDouble(3))
    assert(w >= 0.0 && w <= 1.0)
    assert(l1 > 0.0 && l2 > 0.0 && l1 <= l2)
    // n1*l1 + n2*l2 = s1 + s2 = total events exactly in rationals;
    // the 6-dp per-round quantization leaves only sub-1e-4 residue
    val mixMean = w * l1 + (1 - w) * l2
    assert(math.abs(mixMean - mo.getDouble(1)) < 1e-3,
      s"mixture mean $mixMean != corpus mean ${mo.getDouble(1)}")
  }
}
