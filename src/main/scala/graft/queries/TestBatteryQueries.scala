package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Round-10 completion of the classical-inference battery: the paired
  * and blocked nonparametrics (Wilcoxon signed-rank, runs test,
  * Friedman), variance homogeneity (Bartlett), effect size (Cohen's
  * d / Hedges' g), and lag-1 Granger causality — each the standard
  * next question after a test the suite already answers (Mann-Whitney
  * → Wilcoxon for PAIRED samples; Levene → Bartlett under normality;
  * Welch "is there a difference" → Cohen "how big"; CCF lead-lag →
  * Granger "does the lag PREDICT").
  *
  * Scale shape shared by all six: ONE corpus scan reduces events to
  * the ≤|days| daily census (30 rows at any SF — calendar-bounded,
  * the var_es/mad_outliers class); every rank window, pair join, and
  * moment sum runs on that census. Determinism: integer/decimal sums
  * end-to-end, doubled average ranks (2·rank is integral under ties),
  * cross-engine double math only in single fixed-association final
  * expressions, per-group log terms rounded to 6 dp and summed as
  * DECIMAL so k-group reductions cannot depend on row order.
  */
object TestBatteryQueries {

  /** Abramowitz-Stegun 7.1.26 erfc — the suite's standard normal-tail
    * device (InferenceQueries uses the same constants).
    */
  private val ErfP = 0.3275911
  private val ErfA = Seq(0.254829592, -0.284496736, 1.421413741,
    -1.453152027, 1.061405429)

  /** Two-sided normal p from |z|: erfc(|z|/√2), Horner form. */
  private def pTwoSided(absZ: Column): Column = {
    val z0 = absZ / lit(math.sqrt(2.0))
    val tv = lit(1.0) / (lit(1.0) + lit(ErfP) * z0)
    val poly = ErfA.reverse.map(lit).reduce((acc, a) => acc * tv + a) * tv
    round(poly * exp(-z0 * z0), 6)
  }

  /** The same erfc pipeline as DuckDB SQL over a column expr `z`
    * (already |z|/√2 at the call site keeps both engines literal-
    * identical, so callers pass absz and this divides).
    */
  private def duckPTwoSided(absz: String): String = {
    val horner = ErfA.reverse.map(_.toString)
      .reduce((acc, a) => s"($acc * tv + $a)")
    s"""round($horner * tv * exp(-(($absz) / sqrt(2.0)) * (($absz) / sqrt(2.0))), 6)"""
  }

  /** Daily event-count census for one type: (d, c). */
  private def duckDaily(t: String, as: String) =
    s"""$as AS (SELECT epoch_us(date_trunc('day', ts)) // 86400000000 AS d,
       |    CAST(COUNT(*) AS BIGINT) AS c
       |  FROM events WHERE event_type = '$t' GROUP BY 1)""".stripMargin

  private def sparkDaily(s: org.apache.spark.sql.SparkSession, dir: String,
                         t: String) =
    Tables.load(s, dir, "events")
      .filter(col("event_type") === t)
      .groupBy(expr("unix_micros(date_trunc('day', ts)) div 86400000000L")
        .as("d"))
      .agg(count(lit(1)).cast("long").as("c"))

  def all: Seq[Q] = Seq(

    // WILCOXON SIGNED-RANK — the PAIRED complement to mann_whitney:
    // do daily click and purchase counts differ systematically, using
    // each day as its own control? Zero differences drop (standard),
    // |d| ranks use the doubled-average-rank convention (2·rank
    // integral under ties), so the rank-sum statistic S2 = Σ_{d>0} 2R
    // is EXACT integer arithmetic over the |days| census; the
    // tie-corrected variance is likewise an integer numerator
    // (2n(n+1)(2n+1) − Σ(t³−t))/12. One double z, one erfc p.
    Q("wilcoxon_signed_rank", {
      s"""WITH ${duckDaily("click", "cx")}, ${duckDaily("purchase", "cy")},
        |pr AS (SELECT cx.d, cx.c - cy.c AS diff FROM cx JOIN cy ON cx.d = cy.d
        |       WHERE cx.c <> cy.c),
        |g AS (SELECT ABS(diff) AS ad, COUNT(*) AS t,
        |    CAST(SUM(CASE WHEN diff > 0 THEN 1 ELSE 0 END) AS BIGINT) AS pos
        |  FROM pr GROUP BY 1),
        |r AS (SELECT ad, t, pos,
        |    SUM(t) OVER (ORDER BY ad ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS cum FROM g),
        |m AS (SELECT CAST(SUM(t) AS BIGINT) AS n,
        |    CAST(SUM(pos * (2 * (cum - t) + t + 1)) AS BIGINT) AS s2,
        |    CAST(SUM(t * t * t - t) AS BIGINT) AS tt FROM r),
        |z AS (SELECT n, s2,
        |    CASE WHEN n > 1 AND (2.0 * n * (n + 1) * (2 * n + 1) - tt) > 0
        |      THEN (s2 - n * (n + 1.0) / 2.0)
        |        / sqrt((2.0 * n * (n + 1) * (2 * n + 1) - tt) / 12.0) END AS zs
        |  FROM m),
        |e AS (SELECT n, s2, zs,
        |    1.0 / (1.0 + $ErfP * (ABS(zs) / sqrt(2.0))) AS tv FROM z)
        |SELECT n AS n_pairs, round(s2 / 2.0, 6) AS w_plus,
        |  round(zs, 6) AS z,
        |  CASE WHEN zs IS NOT NULL THEN ${duckPTwoSided("ABS(zs)")} END AS p
        |FROM e""".stripMargin
    }) { (s, dir) =>
      val cx = sparkDaily(s, dir, "click").toDF("d", "cx")
      val cy = sparkDaily(s, dir, "purchase").toDF("dy", "cy")
      val pr = cx.join(broadcast(cy), col("d") === col("dy"))
        .filter(col("cx") =!= col("cy"))
        .select((col("cx") - col("cy")).as("diff"))
      val g = pr.groupBy(abs(col("diff")).as("ad"))
        .agg(count(lit(1)).as("t"),
          sum(when(col("diff") > 0, 1).otherwise(0)).cast("long").as("pos"))
      // |days|-census window (≤ calendar days — bounded at any SF)
      val r = g.withColumn("cum",
        sum(col("t")).over(Window.orderBy("ad")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val m = r.agg(sum(col("t")).cast("long").as("n"),
        sum(col("pos") * (lit(2) * (col("cum") - col("t")) + col("t") + 1))
          .cast("long").as("s2"),
        sum(col("t") * col("t") * col("t") - col("t")).cast("long").as("tt"))
      val varNum = lit(2.0) * col("n") * (col("n") + 1) *
        (lit(2) * col("n") + 1) - col("tt")
      val z = m.select(col("n"), col("s2"),
        when(col("n") > 1 && varNum > 0,
          (col("s2") - col("n") * (col("n") + lit(1.0)) / lit(2.0))
            / sqrt(varNum / lit(12.0))).as("zs"))
      z.select(col("n").as("n_pairs"),
        round(col("s2") / lit(2.0), 6).as("w_plus"),
        round(col("zs"), 6).as("z"),
        when(col("zs").isNotNull, pTwoSided(abs(col("zs")))).as("p"))
    },

    // WALD-WOLFOWITZ RUNS TEST — randomness of the purchase series'
    // daily fluctuation around its (lower) median: too FEW runs means
    // trending/regime structure, too MANY means oscillation. Median
    // by deterministic row_number selection on the |days| census;
    // equal-to-median days drop (standard); runs counted by a lag
    // window over day order. All integers until one z and one erfc p.
    Q("runs_test", {
      s"""WITH ${duckDaily("purchase", "cy")},
        |rk AS (SELECT c, row_number() OVER (ORDER BY c, d) AS i,
        |    COUNT(*) OVER () AS n FROM cy),
        |md AS (SELECT c AS med FROM rk WHERE i = (n + 1) // 2),
        |sg AS (SELECT d, CASE WHEN c > med THEN 1 ELSE -1 END AS s
        |  FROM cy CROSS JOIN md WHERE c <> med),
        |lg AS (SELECT s, lag(s) OVER (ORDER BY d) AS ps FROM sg),
        |m AS (SELECT
        |    CAST(SUM(CASE WHEN ps IS NULL OR s <> ps THEN 1 ELSE 0 END) AS BIGINT) AS runs,
        |    CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(SUM(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n2 FROM lg),
        |z AS (SELECT runs, n1, n2,
        |    CASE WHEN n1 > 0 AND n2 > 0 AND n1 + n2 > 1
        |        AND 2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2) > 0
        |      THEN (runs - (1.0 + 2.0 * n1 * n2 / (n1 + n2)))
        |        / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
        |            / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0))) END AS zs
        |  FROM m),
        |e AS (SELECT runs, n1, n2, zs,
        |    1.0 / (1.0 + $ErfP * (ABS(zs) / sqrt(2.0))) AS tv FROM z)
        |SELECT runs, n1, n2, round(zs, 6) AS z,
        |  CASE WHEN zs IS NOT NULL THEN ${duckPTwoSided("ABS(zs)")} END AS p
        |FROM e""".stripMargin
    }) { (s, dir) =>
      val cy = sparkDaily(s, dir, "purchase")
      val rk = cy.withColumn("i",
          row_number().over(Window.orderBy(col("c"), col("d"))))
        .withColumn("n", count(lit(1)).over(Window.partitionBy()))
      // `div`, not `/`: Spark's `/` is double division even on longs
      val md = rk.filter(col("i") === expr("(n + 1) div 2"))
        .select(col("c").as("med"))
      val sg = cy.crossJoin(broadcast(md))
        .filter(col("c") =!= col("med"))
        .select(col("d"), when(col("c") > col("med"), 1).otherwise(-1).as("s"))
      val lg = sg.withColumn("ps", lag(col("s"), 1).over(Window.orderBy("d")))
      val m = lg.agg(
        sum(when(col("ps").isNull || col("s") =!= col("ps"), 1).otherwise(0))
          .cast("long").as("runs"),
        sum(when(col("s") === 1, 1).otherwise(0)).cast("long").as("n1"),
        sum(when(col("s") === -1, 1).otherwise(0)).cast("long").as("n2"))
      val nn = col("n1") + col("n2")
      val varNum = lit(2.0) * col("n1") * col("n2") *
        (lit(2.0) * col("n1") * col("n2") - col("n1") - col("n2"))
      val z = m.select(col("runs"), col("n1"), col("n2"),
        when(col("n1") > 0 && col("n2") > 0 && nn > 1 && varNum > 0,
          (col("runs") - (lit(1.0) + lit(2.0) * col("n1") * col("n2") / nn))
            / sqrt(varNum / (nn * nn * (nn - lit(1.0))))).as("zs"))
      z.select(col("runs"), col("n1"), col("n2"),
        round(col("zs"), 6).as("z"),
        when(col("zs").isNotNull, pTwoSided(abs(col("zs")))).as("p"))
    },

    // FRIEDMAN TEST — the blocked k-sample rank test: do the five
    // event types keep the same daily-volume ordering across days
    // (blocks)? Within-day doubled average ranks (ties by count get
    // the tie-group average; integral because doubled) over complete
    // blocks only (days where all k types appear). The statistic is
    // exact-integer until one division: with doubled rank sums R2_j,
    // χ²_F = 3·Σ_j(R2_j − n(k+1))² / (n·k·(k+1)). dof = k−1 = 4 is
    // even, so the survival is closed form exp(−q/2)·(1 + q/2) — no
    // erf needed. Ties use average ranks without the variance
    // correction (the classic formulation; conservative).
    Q("friedman_test",
      """WITH dc AS (SELECT epoch_us(date_trunc('day', ts)) // 86400000000 AS d,
        |    event_type, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |cb AS (SELECT d FROM dc GROUP BY d HAVING COUNT(*) = 5),
        |f AS (SELECT dc.d, event_type, c FROM dc JOIN cb ON dc.d = cb.d),
        |g AS (SELECT d, c, COUNT(*) AS t FROM f GROUP BY 1, 2),
        |r AS (SELECT d, c, t, SUM(t) OVER (PARTITION BY d ORDER BY c
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM g),
        |rr AS (SELECT f.d, f.event_type,
        |    2 * (r.cum - r.t) + r.t + 1 AS r2
        |  FROM f JOIN r ON f.d = r.d AND f.c = r.c),
        |sj AS (SELECT event_type, CAST(SUM(r2) AS BIGINT) AS r2j,
        |    CAST(COUNT(*) AS BIGINT) AS n FROM rr GROUP BY 1),
        |q AS (SELECT CAST(SUM((r2j - n * 6) * (r2j - n * 6)) AS BIGINT) AS ss,
        |    MAX(n) AS n FROM sj),
        |st AS (SELECT n, CASE WHEN n > 0
        |    THEN round(3.0 * ss / (n * 5.0 * 6.0), 6) END AS chi2 FROM q)
        |SELECT n AS n_blocks, 4 AS dof, chi2,
        |  CASE WHEN chi2 IS NOT NULL
        |    THEN round(exp(-chi2 / 2.0) * (1.0 + chi2 / 2.0), 6) END AS p
        |FROM st""".stripMargin) { (s, dir) =>
      val dc = Tables.load(s, dir, "events")
        .groupBy(expr("unix_micros(date_trunc('day', ts)) div 86400000000L")
          .as("d"), col("event_type"))
        .agg(count(lit(1)).cast("long").as("c"))
      val cb = dc.groupBy("d").agg(count(lit(1)).as("k"))
        .filter(col("k") === 5).select("d")
      val f = dc.join(broadcast(cb), "d")
      // per-day tie census: the window partitions by DAY (parallel,
      // ≤k rows per partition) — no single-partition exchange
      val g = f.groupBy("d", "c").agg(count(lit(1)).as("t"))
      val r = g.withColumn("cum",
        sum(col("t")).over(Window.partitionBy("d").orderBy("c")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val rr = f.join(broadcast(r), Seq("d", "c"))
        .select(col("event_type"),
          (lit(2) * (col("cum") - col("t")) + col("t") + 1).as("r2"))
      val sj = rr.groupBy("event_type")
        .agg(sum(col("r2")).cast("long").as("r2j"),
          count(lit(1)).cast("long").as("n"))
      val q = sj.agg(
        sum((col("r2j") - col("n") * 6) * (col("r2j") - col("n") * 6))
          .cast("long").as("ss"),
        max(col("n")).as("n"))
      val st = q.select(col("n"),
        when(col("n") > 0,
          round(lit(3.0) * col("ss") / (col("n") * lit(5.0) * lit(6.0)), 6))
          .as("chi2"))
      st.select(col("n").as("n_blocks"), lit(4).as("dof"), col("chi2"),
        when(col("chi2").isNotNull,
          round(exp(-col("chi2") / lit(2.0))
            * (lit(1.0) + col("chi2") / lit(2.0)), 6)).as("p"))
    },

    // BARTLETT'S TEST — variance homogeneity across the five types'
    // daily cent totals (the normal-theory sharp version of the
    // levene_bf robust check the suite already runs; disagreement
    // between the two is itself the classic non-normality signal).
    // Per-group moments are exact DECIMAL; each group's
    // (n_j−1)·ln(s²_j) and 1/(n_j−1) term is rounded to 6 dp and
    // summed as DECIMAL(24,6) so the k-group reduction is
    // order-independent (the suite's unigram_logprob discipline).
    Q("bartlett_test",
      """WITH h AS (SELECT event_type, epoch_us(date_trunc('day', ts)) // 86400000000 AS d,
        |    CAST(SUM(CAST(value AS DECIMAL(12,2)) * 100) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nj,
        |    CAST(SUM(c) AS DECIMAL(20,0)) AS sx,
        |    CAST(SUM(CAST(c AS DECIMAL(18,0)) * c) AS DECIMAL(38,0)) AS sxx
        |  FROM h GROUP BY 1),
        |v AS (SELECT event_type, nj,
        |    CAST((nj * sxx - sx * sx) AS DOUBLE) / nj / (nj - 1) AS s2
        |  FROM g WHERE nj > 1),
        |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(nj) AS BIGINT) AS nt,
        |    CAST(SUM(CAST(round((nj - 1) * ln(s2), 6) AS DECIMAL(24,6))) AS DOUBLE) AS sl,
        |    CAST(SUM(CAST(round((nj - 1) * s2, 6) AS DECIMAL(24,6))) AS DOUBLE) AS sp,
        |    CAST(SUM(CAST(round(1.0 / (nj - 1), 6) AS DECIMAL(24,6))) AS DOUBLE) AS si
        |  FROM v WHERE s2 > 0),
        |st AS (SELECT k, nt,
        |    round(((nt - k) * ln(sp / (nt - k)) - sl)
        |      / (1.0 + (si - 1.0 / (nt - k)) / (3.0 * (k - 1))), 6) AS chi2
        |  FROM t WHERE k > 1 AND nt > k)
        |SELECT k AS n_groups, nt AS n_days_total, chi2,
        |  round(exp(-chi2 / 2.0) * (1.0 + chi2 / 2.0), 6) AS p
        |FROM st""".stripMargin) { (s, dir) =>
      val h = Tables.load(s, dir, "events")
        .groupBy(col("event_type"),
          expr("unix_micros(date_trunc('day', ts)) div 86400000000L").as("d"))
        .agg((loudCast(sum(col("value").cast(DecimalType(12, 2))),
          DecimalType(18, 2), "bartlett daily sum") * 100).cast("long").as("c"))
      val g = h.groupBy("event_type")
        .agg(count(lit(1)).cast("long").as("nj"),
          loudCast(sum(col("c")), DecimalType(20, 0),
            "bartlett sx moment").as("sx"),
          loudCast(sum(col("c").cast(DecimalType(18, 0)) * col("c")),
            DecimalType(38, 0), "bartlett sxx moment").as("sxx"))
      val v = g.filter(col("nj") > 1)
        .select(col("nj"),
          ((col("nj") * col("sxx") - col("sx") * col("sx")).cast("double")
            / col("nj") / (col("nj") - 1)).as("s2"))
      def dec6(c: Column) = round(c, 6).cast(DecimalType(24, 6))
      val t = v.filter(col("s2") > 0).agg(
        count(lit(1)).cast("long").as("k"),
        sum(col("nj")).cast("long").as("nt"),
        sum(dec6((col("nj") - 1) * log(col("s2")))).cast("double").as("sl"),
        sum(dec6((col("nj") - 1) * col("s2"))).cast("double").as("sp"),
        sum(dec6(lit(1.0) / (col("nj") - 1))).cast("double").as("si"))
      val st = t.filter(col("k") > 1 && col("nt") > col("k"))
        .select(col("k"), col("nt"),
          round(((col("nt") - col("k")) * log(col("sp") / (col("nt") - col("k")))
            - col("sl"))
            / (lit(1.0) + (col("si") - lit(1.0) / (col("nt") - col("k")))
              / (lit(3.0) * (col("k") - 1))), 6).as("chi2"))
      st.select(col("k").as("n_groups"), col("nt").as("n_days_total"),
        col("chi2"),
        round(exp(-col("chi2") / lit(2.0))
          * (lit(1.0) + col("chi2") / lit(2.0)), 6).as("p"))
    },

    // COHEN'S d / HEDGES' g — the effect-size report that belongs
    // next to every "significant" verdict the suite emits: purchase
    // vs view daily cent totals, pooled-SD standardized difference +
    // the small-sample bias correction J = 1 − 3/(4m − 9). One-row
    // two-group moment census, exact until the final fixed expression.
    Q("cohens_d",
      """WITH h AS (SELECT event_type, epoch_us(date_trunc('day', ts)) // 86400000000 AS d,
        |    CAST(SUM(CAST(value AS DECIMAL(12,2)) * 100) AS BIGINT) AS c
        |  FROM events WHERE event_type IN ('purchase', 'view') GROUP BY 1, 2),
        |g AS (SELECT
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN c ELSE 0 END) AS DECIMAL(20,0)) AS s1,
        |    CAST(SUM(CASE WHEN event_type = 'view' THEN c ELSE 0 END) AS DECIMAL(20,0)) AS s2,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(c AS DECIMAL(18,0)) * c ELSE 0 END) AS DECIMAL(38,0)) AS q1,
        |    CAST(SUM(CASE WHEN event_type = 'view' THEN CAST(c AS DECIMAL(18,0)) * c ELSE 0 END) AS DECIMAL(38,0)) AS q2
        |  FROM h),
        |e AS (SELECT n1, n2,
        |    CAST(s1 AS DOUBLE) / n1 AS m1, CAST(s2 AS DOUBLE) / n2 AS m2,
        |    CAST(n1 * q1 - s1 * s1 AS DOUBLE) / n1 / (n1 - 1) AS v1,
        |    CAST(n2 * q2 - s2 * s2 AS DOUBLE) / n2 / (n2 - 1) AS v2
        |  FROM g WHERE n1 > 1 AND n2 > 1),
        |dd AS (SELECT n1, n2, m1, m2,
        |    sqrt(((n1 - 1) * v1 + (n2 - 1) * v2) / (n1 + n2 - 2)) AS sp
        |  FROM e)
        |SELECT n1, n2, round((m1 - m2) / 100.0, 6) AS mean_diff,
        |  CASE WHEN sp > 0 THEN round((m1 - m2) / sp, 6) END AS cohens_d,
        |  CASE WHEN sp > 0 THEN round((m1 - m2) / sp
        |    * (1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0)), 6) END AS hedges_g
        |FROM dd""".stripMargin) { (s, dir) =>
      val h = Tables.load(s, dir, "events")
        .filter(col("event_type").isin("purchase", "view"))
        .groupBy(col("event_type"),
          expr("unix_micros(date_trunc('day', ts)) div 86400000000L").as("d"))
        .agg((loudCast(sum(col("value").cast(DecimalType(12, 2))),
          DecimalType(18, 2), "cohens_d daily sum") * 100).cast("long").as("c"))
      def w(t: String, e: Column) =
        sum(when(col("event_type") === t, e).otherwise(lit(0)))
      val g = h.agg(
        w("purchase", lit(1)).cast("long").as("n1"),
        w("view", lit(1)).cast("long").as("n2"),
        loudCast(w("purchase", col("c")), DecimalType(20, 0),
          "cohens_d s1 moment").as("s1"),
        loudCast(w("view", col("c")), DecimalType(20, 0),
          "cohens_d s2 moment").as("s2"),
        loudCast(w("purchase", col("c").cast(DecimalType(18, 0)) * col("c")),
          DecimalType(38, 0), "cohens_d q1 moment").as("q1"),
        loudCast(w("view", col("c").cast(DecimalType(18, 0)) * col("c")),
          DecimalType(38, 0), "cohens_d q2 moment").as("q2"))
      val e = g.filter(col("n1") > 1 && col("n2") > 1)
        .select(col("n1"), col("n2"),
          (col("s1").cast("double") / col("n1")).as("m1"),
          (col("s2").cast("double") / col("n2")).as("m2"),
          ((col("n1") * col("q1") - col("s1") * col("s1")).cast("double")
            / col("n1") / (col("n1") - 1)).as("v1"),
          ((col("n2") * col("q2") - col("s2") * col("s2")).cast("double")
            / col("n2") / (col("n2") - 1)).as("v2"))
      val dd = e.select(col("n1"), col("n2"), col("m1"), col("m2"),
        sqrt(((col("n1") - 1) * col("v1") + (col("n2") - 1) * col("v2"))
          / (col("n1") + col("n2") - 2)).as("sp"))
      dd.select(col("n1"), col("n2"),
        round((col("m1") - col("m2")) / lit(100.0), 6).as("mean_diff"),
        when(col("sp") > 0,
          round((col("m1") - col("m2")) / col("sp"), 6)).as("cohens_d"),
        when(col("sp") > 0,
          round((col("m1") - col("m2")) / col("sp")
            * (lit(1.0) - lit(3.0) / (lit(4.0) * (col("n1") + col("n2"))
              - lit(9.0))), 6)).as("hedges_g"))
    },

    // GRANGER CAUSALITY (lag 1) — does yesterday's CLICK count
    // predict today's PURCHASE count beyond yesterday's purchases?
    // The predictive sequel to ccf_leadlag's symmetric correlation.
    // Exactly ols_cramer's discipline on the lag-joined |days|
    // census: all ten moments exact DECIMAL, the unrestricted
    // 3-regressor solve via Cramer determinants in exact arithmetic,
    // both RSS values single fixed double expressions, F-ratio the
    // only division chain. Width ceiling: both engines cap decimal
    // products at DECIMAL(38,0) (probed; exact while values fit), so
    // the saa·sbb inner products are exact through daily counts
    // ~5·10^8 (30·c² ≤ 10^19 each side); beyond that, split the
    // widths the way ols_cramer splits span- vs volume-moments —
    // and the ceiling is ENFORCED, not just documented: every
    // narrowing moment cast is loudCast-wrapped so Spark raises
    // exactly where DuckDB would. Reported: F(1, n−3), both RSS, and the
    // incremental R². (The F p-value needs the incomplete beta — out
    // of closed-form scope; the statistic itself is the contract.)
    Q("granger_causality", {
      s"""WITH ${duckDaily("click", "cx")}, ${duckDaily("purchase", "cy")},
        |j AS (SELECT y.c AS yt, py.c AS ya, px.c AS xa
        |  FROM cy y JOIN cy py ON py.d = y.d - 1
        |            JOIN cx px ON px.d = y.d - 1),
        |m AS (SELECT CAST(COUNT(*) AS DECIMAL(12,0)) AS n,
        |    CAST(SUM(ya) AS DECIMAL(16,0)) AS sa,
        |    CAST(SUM(xa) AS DECIMAL(16,0)) AS sb,
        |    CAST(SUM(yt) AS DECIMAL(16,0)) AS sy,
        |    CAST(SUM(CAST(ya AS DECIMAL(16,0)) * ya) AS DECIMAL(24,0)) AS saa,
        |    CAST(SUM(CAST(ya AS DECIMAL(16,0)) * xa) AS DECIMAL(24,0)) AS sab,
        |    CAST(SUM(CAST(xa AS DECIMAL(16,0)) * xa) AS DECIMAL(24,0)) AS sbb,
        |    CAST(SUM(CAST(ya AS DECIMAL(16,0)) * yt) AS DECIMAL(24,0)) AS say,
        |    CAST(SUM(CAST(xa AS DECIMAL(16,0)) * yt) AS DECIMAL(24,0)) AS sby,
        |    CAST(SUM(CAST(yt AS DECIMAL(16,0)) * yt) AS DECIMAL(24,0)) AS syy
        |  FROM j),
        |d AS (SELECT n, sy, say, sby, syy, saa, sa,
        |    n * CAST(saa * sbb - sab * sab AS DECIMAL(38,0))
        |      - sa * CAST(sa * sbb - sab * sb AS DECIMAL(38,0))
        |      + sb * CAST(sa * sab - saa * sb AS DECIMAL(38,0)) AS det,
        |    sy * CAST(saa * sbb - sab * sab AS DECIMAL(38,0))
        |      - sa * CAST(say * sbb - sab * sby AS DECIMAL(38,0))
        |      + sb * CAST(say * sab - saa * sby AS DECIMAL(38,0)) AS det0,
        |    n * CAST(say * sbb - sby * sab AS DECIMAL(38,0))
        |      - sy * CAST(sa * sbb - sab * sb AS DECIMAL(38,0))
        |      + sb * CAST(sa * sby - say * sb AS DECIMAL(38,0)) AS det1,
        |    n * CAST(saa * sby - sab * say AS DECIMAL(38,0))
        |      - sa * CAST(sa * sby - say * sb AS DECIMAL(38,0))
        |      + sy * CAST(sa * sab - saa * sb AS DECIMAL(38,0)) AS det2
        |  FROM m),
        |rs AS (SELECT n,
        |    CAST(syy AS DOUBLE)
        |      - (CAST(det0 AS DOUBLE) / CAST(det AS DOUBLE) * CAST(sy AS DOUBLE)
        |        + CAST(det1 AS DOUBLE) / CAST(det AS DOUBLE) * CAST(say AS DOUBLE)
        |        + CAST(det2 AS DOUBLE) / CAST(det AS DOUBLE) * CAST(sby AS DOUBLE)) AS rssu,
        |    CAST(syy AS DOUBLE)
        |      - ((CAST(sy AS DOUBLE) * CAST(saa AS DOUBLE)
        |          - CAST(sa AS DOUBLE) * CAST(say AS DOUBLE))
        |            / (CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
        |              - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
        |          * CAST(sy AS DOUBLE)
        |        + (CAST(n AS DOUBLE) * CAST(say AS DOUBLE)
        |          - CAST(sa AS DOUBLE) * CAST(sy AS DOUBLE))
        |            / (CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
        |              - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
        |          * CAST(say AS DOUBLE)) AS rssr
        |  FROM d WHERE det <> 0
        |    AND n * saa - sa * sa <> 0)
        |SELECT CAST(n AS BIGINT) AS n_obs,
        |  round(rssr, 6) AS rss_restricted, round(rssu, 6) AS rss_unrestricted,
        |  CASE WHEN rssu > 0 AND n > 3
        |    THEN round((rssr - rssu) * (CAST(n AS DOUBLE) - 3.0) / rssu, 6) END AS f_stat,
        |  CASE WHEN rssr > 0
        |    THEN round((rssr - rssu) / rssr, 6) END AS incr_r2
        |FROM rs""".stripMargin
    }) { (s, dir) =>
      val cx = sparkDaily(s, dir, "click").toDF("dx", "xc")
      val cy = sparkDaily(s, dir, "purchase")
      val yTod = cy.toDF("d", "yt")
      val yLag = cy.toDF("dl", "ya")
      val j = yTod
        .join(broadcast(yLag), col("dl") === col("d") - 1)
        .join(broadcast(cx), col("dx") === col("d") - 1)
        .select(col("yt"), col("ya"), col("xc").as("xa"))
      def d16(c: Column) = c.cast(DecimalType(16, 0))
      // every narrowing moment cast loudCast-wrapped (ols_cramer's
      // discipline): past the documented ~5·10^8 daily-count ceiling
      // BOTH engines now raise instead of Spark silently NULLing the
      // moment and emitting an empty result where DuckDB throws
      def m16(c: Column, what: String) =
        loudCast(c, DecimalType(16, 0), s"granger $what moment")
      def m24(c: Column, what: String) =
        loudCast(c, DecimalType(24, 0), s"granger $what moment")
      val m = j.agg(
        count(lit(1)).cast(DecimalType(12, 0)).as("n"),
        m16(sum(col("ya")), "sa").as("sa"),
        m16(sum(col("xa")), "sb").as("sb"),
        m16(sum(col("yt")), "sy").as("sy"),
        m24(sum(d16(col("ya")) * col("ya")), "saa").as("saa"),
        m24(sum(d16(col("ya")) * col("xa")), "sab").as("sab"),
        m24(sum(d16(col("xa")) * col("xa")), "sbb").as("sbb"),
        m24(sum(d16(col("ya")) * col("yt")), "say").as("say"),
        m24(sum(d16(col("xa")) * col("yt")), "sby").as("sby"),
        m24(sum(d16(col("yt")) * col("yt")), "syy").as("syy"))
      def d38(c: Column) = c.cast(DecimalType(38, 0))
      val (n, sa, sb, sy, saa, sab, sbb, say, sby) =
        (col("n"), col("sa"), col("sb"), col("sy"), col("saa"), col("sab"),
          col("sbb"), col("say"), col("sby"))
      val d = m.select(n, sy, say, sby, col("syy"), saa, sa,
        (n * d38(saa * sbb - sab * sab) - sa * d38(sa * sbb - sab * sb)
          + sb * d38(sa * sab - saa * sb)).as("det"),
        (sy * d38(saa * sbb - sab * sab) - sa * d38(say * sbb - sab * sby)
          + sb * d38(say * sab - saa * sby)).as("det0"),
        (n * d38(say * sbb - sby * sab) - sy * d38(sa * sbb - sab * sb)
          + sb * d38(sa * sby - say * sb)).as("det1"),
        (n * d38(saa * sby - sab * say) - sa * d38(sa * sby - say * sb)
          + sy * d38(sa * sab - saa * sb)).as("det2"))
      val detD = col("det").cast("double")
      val det2x2 = n.cast("double") * saa.cast("double") -
        sa.cast("double") * sa.cast("double")
      val rs = d.filter(col("det") =!= 0
          && n * saa - sa * sa =!= 0)
        .select(n,
          (col("syy").cast("double")
            - (col("det0").cast("double") / detD * sy.cast("double")
              + col("det1").cast("double") / detD * say.cast("double")
              + col("det2").cast("double") / detD * sby.cast("double")))
            .as("rssu"),
          (col("syy").cast("double")
            - ((sy.cast("double") * saa.cast("double")
                - sa.cast("double") * say.cast("double")) / det2x2
                * sy.cast("double")
              + (n.cast("double") * say.cast("double")
                - sa.cast("double") * sy.cast("double")) / det2x2
                * say.cast("double")))
            .as("rssr"))
      rs.select(n.cast("long").as("n_obs"),
        round(col("rssr"), 6).as("rss_restricted"),
        round(col("rssu"), 6).as("rss_unrestricted"),
        when(col("rssu") > 0 && n > 3,
          round((col("rssr") - col("rssu")) * (n.cast("double") - lit(3.0))
            / col("rssu"), 6)).as("f_stat"),
        when(col("rssr") > 0,
          round((col("rssr") - col("rssu")) / col("rssr"), 6)).as("incr_r2"))
    })
}
