package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Count-model fitting over the per-user activity census — the
  * in-dataflow EM/moments sibling of ols_cramer and kmeans: does the
  * event-count distribution look Poisson, and if not, which mixture
  * explains it?
  *
  * Scale shape: ONE scan reduces the corpus to the (count → n_users)
  * value census; every fitting step is census×(1-row params) work,
  * constant at any corpus size. Cross-engine determinism: the EM
  * responsibility needs only the ratio of Poisson masses, so k!
  * CANCELS — no lgamma anywhere; per-cell responsibilities quantize
  * to 9 dp before the decimal census sums, parameters re-quantize to
  * 6 dp per iteration, and both engines run the SAME written update,
  * so the 8-step trajectories are identical.
  */
object MixtureQueries {

  val EmIters = 8

  def all: Seq[Q] = Seq(

    // NEGATIVE-BINOMIAL OVERDISPERSION: method-of-moments fit of the
    // per-user event-count distribution. A Poisson process has
    // variance == mean; real engagement is overdispersed, and the NB
    // size r-hat = mean² / (var - mean) quantifies by how much. All
    // moments are exact integer sums; the estimates are the final
    // double expressions (NULL when the data is UNDER-dispersed and
    // the NB moment equations have no solution).
    Q("overdispersion_fit",
      """WITH u AS (SELECT user_id, COUNT(*) AS k FROM events GROUP BY 1),
        |m AS (SELECT COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS s,
        |    CAST(SUM(k * k) AS BIGINT) AS ss FROM u)
        |SELECT n AS n_users,
        |  round(CAST(s AS DOUBLE) / n, 6) AS mean_events,
        |  CASE WHEN n > 1 THEN
        |    round((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1), 6)
        |  END AS var_events,
        |  CASE WHEN n > 1 AND s > 0 THEN
        |    round(((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1))
        |      / (CAST(s AS DOUBLE) / n), 6) END AS dispersion,
        |  CASE WHEN n > 1 AND (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1)
        |       > CAST(s AS DOUBLE) / n THEN
        |    round((CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)
        |      / ((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1)
        |         - CAST(s AS DOUBLE) / n), 6) END AS r_hat
        |FROM m""".stripMargin) { (s, dir) =>
      val u = Tables.load(s, dir, "events")
        .groupBy("user_id").agg(count(lit(1)).as("k"))
      val m = u.agg(count(lit(1)).as("n"),
        sum(col("k")).cast("long").as("s"),
        sum(col("k") * col("k")).cast("long").as("ss"))
      val mean = col("s").cast("double") / col("n")
      val vr = (col("ss").cast("double") - col("s").cast("double") * col("s")
        / col("n")) / (col("n") - 1)
      m.select(col("n").as("n_users"),
        round(mean, 6).as("mean_events"),
        when(col("n") > 1, round(vr, 6)).as("var_events"),
        when(col("n") > 1 && col("s") > 0, round(vr / mean, 6)).as("dispersion"),
        when(col("n") > 1 && vr > mean,
          round(mean * mean / (vr - mean), 6)).as("r_hat"))
    },

    // TWO-COMPONENT POISSON MIXTURE via 8 unrolled EM steps: split
    // the user base into a low- and a high-activity regime with soft
    // assignments. The responsibility ratio
    // r1 = w / (w + (1-w)·exp(k·ln(λ2/λ1) + λ1 - λ2)) cancels k!,
    // so the whole E-step is one exp per census CELL. The ipf_raking
    // discipline: per-cell r1 quantizes to 9 dp, census-weighted
    // sums are exact decimals, params re-quantize to 6 dp per round.
    // Oracle shape: the CTE chain is strictly LINEAR — each p$i
    // carries (l1, l2, nt) forward as columns so no CTE is referenced
    // more than once (the census c is MATERIALIZED for its 8 fan-out
    // reads). A scalar-subquery formulation referencing p${i-1} three
    // times made DuckDB's inliner go exponential (3^8 chain copies).
    Q("poisson_em", {
      val iterCtes = (1 to EmIters).map { i =>
        s"""r$i AS (SELECT c.k, c.n, p.l1 AS pl1, p.l2 AS pl2, p.nt,
           |    CASE WHEN p.l1 > 0 AND p.l2 > 0 THEN
           |      CAST(round(CAST(p.w AS DOUBLE) / (CAST(p.w AS DOUBLE)
           |        + (1.0 - CAST(p.w AS DOUBLE))
           |          * exp(c.k * ln(CAST(p.l2 AS DOUBLE) / CAST(p.l1 AS DOUBLE))
           |                + CAST(p.l1 AS DOUBLE) - CAST(p.l2 AS DOUBLE))), 9) AS DECIMAL(12,9))
           |    ELSE CAST(0.5 AS DECIMAL(12,9)) END AS r1
           |  FROM c, p${i - 1} p),
           |a$i AS (SELECT CAST(SUM(n * r1) AS DECIMAL(24,9)) AS n1,
           |    CAST(SUM(k * n * r1) AS DECIMAL(28,9)) AS s1,
           |    CAST(SUM(n * (1.0 - r1)) AS DECIMAL(24,9)) AS n2,
           |    CAST(SUM(k * n * (1.0 - r1)) AS DECIMAL(28,9)) AS s2,
           |    MIN(pl1) AS pl1, MIN(pl2) AS pl2, MIN(nt) AS nt${
          if (i == EmIters)
            s""",
               |    CAST(SUM(CASE WHEN r1 >= 0.5 THEN n ELSE 0 END) AS BIGINT) AS n_low"""
              .stripMargin
          else ""}
           |  FROM r$i),
           |p$i AS (SELECT
           |    CASE WHEN n1 > 0 THEN CAST(round(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE), 6) AS DECIMAL(18,6))
           |         ELSE pl1 END AS l1,
           |    CASE WHEN n2 > 0 THEN CAST(round(CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE), 6) AS DECIMAL(18,6))
           |         ELSE pl2 END AS l2,
           |    CAST(round(CAST(n1 AS DOUBLE) / nt, 6) AS DECIMAL(12,6)) AS w,
           |    nt${if (i == EmIters) ", n_low" else ""}
           |  FROM a$i)""".stripMargin
      }.mkString(",\n")
      s"""WITH u AS (SELECT user_id, COUNT(*) AS k FROM events GROUP BY 1),
         |c AS MATERIALIZED (SELECT k, COUNT(*) AS n FROM u GROUP BY 1),
         |t AS (SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(k * n) AS BIGINT) AS st FROM c),
         |p0 AS (SELECT
         |    CAST(round(CAST(st AS DOUBLE) / nt / 2.0, 6) AS DECIMAL(18,6)) AS l1,
         |    CAST(round(CAST(st AS DOUBLE) / nt * 2.0, 6) AS DECIMAL(18,6)) AS l2,
         |    CAST(0.5 AS DECIMAL(12,6)) AS w, nt
         |  FROM t),
         |$iterCtes
         |SELECT p.nt AS n_users,
         |  CAST(p.l1 AS DOUBLE) AS lambda_low, CAST(p.l2 AS DOUBLE) AS lambda_high,
         |  CAST(p.w AS DOUBLE) AS weight_low, p.n_low AS n_assigned_low
         |FROM p$EmIters p""".stripMargin
    }) { (s, dir) =>
      val u = Tables.load(s, dir, "events")
        .groupBy("user_id").agg(count(lit(1)).as("k"))
      val c = u.groupBy("k").agg(count(lit(1)).as("n"))
        .localCheckpoint(true) // census feeds all 8 rounds
      val t = c.agg(sum(col("n")).cast("long").as("nt"),
        sum(col("k") * col("n")).cast("long").as("st"))
      def d6(cc: org.apache.spark.sql.Column) = cc.cast(DecimalType(18, 6))
      var p: DataFrame = t.select(
        d6(round(col("st").cast("double") / col("nt") / 2.0, 6)).as("l1"),
        d6(round(col("st").cast("double") / col("nt") * 2.0, 6)).as("l2"),
        lit(0.5).cast(DecimalType(12, 6)).as("w"))
      var lastR: DataFrame = null
      for (_ <- 1 to EmIters) {
        val r1 = when(col("l1") > 0 && col("l2") > 0,
          round(col("w").cast("double") / (col("w").cast("double")
            + (lit(1.0) - col("w").cast("double"))
              * exp(col("k") * log(col("l2").cast("double") / col("l1").cast("double"))
                + col("l1").cast("double") - col("l2").cast("double"))), 9)
            .cast(DecimalType(12, 9)))
          .otherwise(lit(0.5).cast(DecimalType(12, 9)))
        val r = c.crossJoin(broadcast(p))
          .select(col("k"), col("n"), col("l1"), col("l2"), r1.as("r1"))
          .localCheckpoint(true) // bounded census x 1-row params
        lastR = r
        val a = r.agg(
          sum(col("n") * col("r1")).cast(DecimalType(24, 9)).as("n1"),
          sum(col("k") * col("n") * col("r1")).cast(DecimalType(28, 9)).as("s1"),
          sum(col("n") * (lit(1.0).cast(DecimalType(12, 9)) - col("r1")))
            .cast(DecimalType(24, 9)).as("n2"),
          sum(col("k") * col("n") * (lit(1.0).cast(DecimalType(12, 9)) - col("r1")))
            .cast(DecimalType(28, 9)).as("s2"),
          first(col("l1")).as("pl1"), first(col("l2")).as("pl2"))
        p = a.crossJoin(broadcast(t)).select(
          when(col("n1") > 0,
            d6(round(col("s1").cast("double") / col("n1").cast("double"), 6)))
            .otherwise(col("pl1")).as("l1"),
          when(col("n2") > 0,
            d6(round(col("s2").cast("double") / col("n2").cast("double"), 6)))
            .otherwise(col("pl2")).as("l2"),
          round(col("n1").cast("double") / col("nt"), 6)
            .cast(DecimalType(12, 6)).as("w"))
      }
      val h = lastR.agg(sum(when(col("r1") >= lit(0.5).cast(DecimalType(12, 9)),
        col("n")).otherwise(0L)).cast("long").as("n_low"))
      p.crossJoin(broadcast(t)).crossJoin(broadcast(h))
        .select(col("nt").as("n_users"),
          col("l1").cast("double").as("lambda_low"),
          col("l2").cast("double").as("lambda_high"),
          col("w").cast("double").as("weight_low"),
          col("n_low").as("n_assigned_low"))
    }
  )
}
