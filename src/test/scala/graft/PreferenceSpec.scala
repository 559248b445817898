package graft

import org.apache.spark.sql.functions._

import graft.queries.Preference

/** Semantic pins for the preference-data family (the DuckDB oracle
  * owns value-level correctness; these pin the semantics a hash
  * compare can't): pair construction invariants, Bradley–Terry
  * normalization and MM self-consistency, and Wilson-bound sanity.
  */
class PreferenceSpec extends SparkSpec {

  private def run(name: String, dir: String = sf001) =
    SparkEntry.queries(name)(spark, dir)

  test("preference_pairs: chosen always outscores rejected; one pair per multi-doc group") {
    val rows = run("preference_pairs").collect()
    // margins are best-minus-worst by construction: strictly >= 0, and
    // a zero margin can only come from score ties inside a group
    assert(rows.forall(_.getLong(3) >= 0L), "sum of non-negative margins")
    assert(rows.forall(r => r.getDouble(4) >= 0.0))
    val nPairs = rows.map(_.getLong(2)).sum
    val nGroups = Preference.candidates(spark, sf001)
      .groupBy("pg").count().filter(col("count") >= 2).count()
    assert(nPairs === nGroups,
      "exactly one (chosen, rejected) pair per group with >= 2 candidates")
  }

  test("bradley_terry_rank: strengths normalize to mean 1 and satisfy the MM fixed point") {
    val rows = run("bradley_terry_rank").collect()
    val k = rows.length
    val strengths = rows.map(r => r.getString(0) -> r.getDouble(1)).toMap
    // normalization: sum == k up to the nano quantization
    assert(math.abs(rows.map(_.getDouble(1)).sum - k) < 1e-6 * k)
    assert(rows.forall(_.getDouble(1) > 0.0))
    // wins/matches accounting: 0 <= W_i <= M_i, and global win total
    // is half the (doubled) match total — every match has one winner
    assert(rows.forall(r => r.getLong(2) >= 0 && r.getLong(2) <= r.getLong(3)))
    assert(rows.map(_.getLong(2)).sum * 2 === rows.map(_.getLong(3)).sum)
    // MM self-consistency: after the query's fixed iteration count
    // the strengths must be near the fixed point
    // r_i = W_i / Σ_j m_ij/(r_i+r_j) (up to the final mean-1
    // rescale). Rebuild the census and check the post-update ratio
    // spread is small relative to the rescale.
    val mc = Preference.matchCensus(Preference.candidates(spark, sf001))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3)))
    val updated = rows.map { r =>
      val i = r.getString(0)
      val wi = r.getLong(2).toDouble
      val denom = mc.iterator.flatMap { case (s1, s2, m, _) =>
        if (s1 == i) Some(m / (strengths(i) + strengths(s2)))
        else if (s2 == i) Some(m / (strengths(i) + strengths(s1)))
        else None
      }.sum
      i -> (wi / denom)
    }.toMap
    // one more MM step rescales every strength by (almost) the same
    // factor iff we are at the fixed point (strength ratios stable)
    val ratios = rows.map(r => updated(r.getString(0)) / r.getDouble(1))
    val spread = ratios.max / ratios.min
    assert(spread < 1.02,
      s"MM step still moves strength ratios by ${spread}x — not converged")
  }

  test("bt_confidence: intervals bracket the strength; doubling the match census tightens se by 1/sqrt(2)") {
    val rows = run("bt_confidence").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (st, se, lo, hi) =
        (r.getDouble(1), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(se > 0.0, "positive uncertainty")
      assert(lo < st && st < hi, "the Wald interval must bracket the strength")
    }
    // monotonicity in match count, exactly: doubling every census cell
    // (m, w1) leaves the scale-free MM fixed point where it was but
    // doubles every Fisher term, so se_log shrinks by 1/sqrt(2) (up to
    // the pico-unit quantization and double-rounding of the iterate)
    val mc = Preference.matchCensus(Preference.candidates(spark, sf001))
      .localCheckpoint(true)
    val mc2 = mc.select(col("s1"), col("s2"),
      (col("m") * 2).cast("long").as("m"),
      (col("w1") * 2).cast("long").as("w1")).localCheckpoint(true)
    val se1 = Preference.btConfidence(mc).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    val se2 = Preference.btConfidence(mc2).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(se1.keySet === se2.keySet)
    se1.foreach { case (s, se) =>
      val ratio = se2(s) / se
      assert(math.abs(ratio - 1.0 / math.sqrt(2.0)) < 1e-6,
        s"source $s: doubled-census se ratio $ratio != 1/sqrt(2)")
      assert(se2(s) < se, "more matches must strictly tighten the interval")
    }
  }

  test("pairwise_winrate_matrix: bounds and orientation hold in every cell") {
    val rows = run("pairwise_winrate_matrix").collect()
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1), "cells are ordered s1 < s2")
      val m = r.getLong(2); val w = r.getLong(3)
      assert(w >= 0 && w <= m)
      val wr = r.getDouble(4); val lo = r.getDouble(5)
      assert(math.abs(wr - w.toDouble / m) < 1e-12)
      assert(lo <= wr + 1e-12, "Wilson lower bound cannot exceed the rate")
      assert(lo >= -1e-12 && lo <= 1.0)
    }
  }
}
