package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Rank statistics and stratified tests — the second statistical-
  * inference wave: tie-corrected Spearman correlation, the
  * Mann–Kendall trend test (Kendall's tau-b of value against time),
  * Brown–Forsythe variance homogeneity, Benjamini–Hochberg FDR
  * control over the per-source shift-test family, and the
  * Cochran–Mantel–Haenszel stratified association test.
  *
  * Scale shape: every query reduces the corpus to a census in one
  * scan — (source, value)-count grids for the rank machinery, the
  * hourly cent census for trend, day-strata 2x2 cells for CMH — and
  * all pair/rank work runs on the census, bounded by the value grid
  * or time span, never the corpus. Determinism: the suite's standard
  * contract — the doubled-rank trick keeps average ranks integral
  * under ties, strata terms are decimal-quantized before summing
  * (order-free exact sums), and each query ends in one identically-
  * written double expression rounded to 6 dp.
  */
object RankStatQueries {

  /** Abramowitz & Stegun 7.1.26 erf coefficients (max abs error
    * 1.5e-7), the one literal table both engines share — the
    * two-sided normal p-value is p = erfc(|z|/sqrt(2)) =
    * poly(t)·exp(-x²) with t = 1/(1+Px). */
  private val ErfP = 0.3275911
  private val ErfA = Seq(0.254829592, -0.284496736, 1.421413741,
    -1.453152027, 1.061405429)

  /** Doubled average rank of a grouped census: 2·rank is integral
    * even at ties (the mann_whitney trick). `c` is the tie-group
    * count, cumulative over the ordered census. */
  private def r2(cum: Column, c: Column): Column =
    lit(2) * (cum - c) + c + 1

  def all: Seq[Q] = Seq(

    // SPEARMAN RANK CORRELATION (tie-corrected, per source) between a
    // document's token count and its character count. Average ranks
    // come from per-(source, value) census windows via the doubled-
    // rank trick, so every rank is an exact integer; rho is Pearson
    // on the doubled ranks (affine-invariant, so identical to rho on
    // the true average ranks), computed from six integer sums with
    // ONE final double expression. Bound: with n docs per source and
    // 2r <= 2n, n·Σ(2rx·2ry) <= 4n³ — BIGINT-safe to ~1e4x this SF.
    Q("spearman_corr",
      """WITH d AS (SELECT source, len(string_split(text, ' ')) AS x, n_chars AS y FROM documents),
        |gx AS (SELECT source, x, COUNT(*) AS c FROM d GROUP BY 1, 2),
        |rx AS (SELECT source, x,
        |    2 * (SUM(c) OVER (PARTITION BY source ORDER BY x ROWS UNBOUNDED PRECEDING) - c) + c + 1 AS r2
        |  FROM gx),
        |gy AS (SELECT source, y, COUNT(*) AS c FROM d GROUP BY 1, 2),
        |ry AS (SELECT source, y,
        |    2 * (SUM(c) OVER (PARTITION BY source ORDER BY y ROWS UNBOUNDED PRECEDING) - c) + c + 1 AS r2
        |  FROM gy),
        |j AS (SELECT d.source, rx.r2 AS ax, ry.r2 AS ay
        |      FROM d JOIN rx ON d.source = rx.source AND d.x = rx.x
        |             JOIN ry ON d.source = ry.source AND d.y = ry.y),
        |t AS (SELECT source, COUNT(*) AS n,
        |    CAST(SUM(ax) AS BIGINT) AS sx, CAST(SUM(ay) AS BIGINT) AS sy,
        |    CAST(SUM(ax * ax) AS BIGINT) AS sxx, CAST(SUM(ay * ay) AS BIGINT) AS syy,
        |    CAST(SUM(ax * ay) AS BIGINT) AS sxy
        |  FROM j GROUP BY 1)
        |SELECT source, n,
        |  CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
        |    THEN round(CAST(n * sxy - sx * sy AS DOUBLE)
        |      / sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE)), 6)
        |  END AS rho
        |FROM t ORDER BY source""".stripMargin) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
        .select(col("source"), size(split(col("text"), " ")).as("x"),
          col("n_chars").as("y"))
      val cum = (k: String) => Window.partitionBy("source").orderBy(k)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      def ranks(key: String, out: String) =
        d.groupBy("source", key).agg(count(lit(1)).as("c"))
          .select(col("source"), col(key),
            r2(sum(col("c")).over(cum(key)), col("c")).as(out))
      val j = d
        .join(broadcast(ranks("x", "ax")), Seq("source", "x"))
        .join(broadcast(ranks("y", "ay")), Seq("source", "y"))
      val t = j.groupBy("source").agg(count(lit(1)).as("n"),
        sum(col("ax")).cast("long").as("sx"),
        sum(col("ay")).cast("long").as("sy"),
        sum(col("ax") * col("ax")).cast("long").as("sxx"),
        sum(col("ay") * col("ay")).cast("long").as("syy"),
        sum(col("ax") * col("ay")).cast("long").as("sxy"))
      val vx = col("n") * col("sxx") - col("sx") * col("sx")
      val vy = col("n") * col("syy") - col("sy") * col("sy")
      t.select(col("source"), col("n"),
        when(vx > 0 && vy > 0,
          round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
            / sqrt(vx.cast("double") * vy.cast("double")), 6)).as("rho"))
        .orderBy("source")
    },

    // MANN-KENDALL TREND TEST per event type: Kendall's S over the
    // hourly cent census (every (earlier, later) hour pair scores
    // sign(c2 - c1)), the tie-corrected variance, the continuity-
    // corrected z, and tau-b. The pair expansion is census x census
    // WITHIN an event type — bounded by the time span squared, not
    // the corpus — and S, the tie terms, and both variance factors
    // are exact integers; z and tau are the final double expressions.
    Q("mann_kendall",
      """WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hour,
        |    CAST(SUM(CAST(value AS DECIMAL(12,2)) * 100) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |p AS (SELECT a.event_type,
        |    CAST(SUM(CASE WHEN b.c > a.c THEN 1 WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT) AS s
        |  FROM h a JOIN h b ON a.event_type = b.event_type AND a.hour < b.hour
        |  GROUP BY 1),
        |n AS (SELECT event_type, COUNT(*) AS n FROM h GROUP BY 1),
        |tt AS (SELECT event_type,
        |    CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS t3,
        |    CAST(SUM(t * (t - 1)) AS BIGINT) AS t2
        |  FROM (SELECT event_type, c, COUNT(*) AS t FROM h GROUP BY 1, 2) GROUP BY 1)
        |SELECT n.event_type, n.n, COALESCE(p.s, 0) AS s,
        |  CASE WHEN n.n * (n.n - 1) - tt.t2 > 0
        |    THEN round(2.0 * COALESCE(p.s, 0)
        |      / sqrt(CAST(n.n * (n.n - 1) - tt.t2 AS DOUBLE) * CAST(n.n * (n.n - 1) AS DOUBLE)), 6)
        |  END AS tau,
        |  CASE WHEN n.n * (n.n - 1) * (2 * n.n + 5) - tt.t3 > 0
        |    THEN round((CAST(COALESCE(p.s, 0) AS DOUBLE)
        |        - CASE WHEN COALESCE(p.s, 0) > 0 THEN 1 WHEN COALESCE(p.s, 0) < 0 THEN -1 ELSE 0 END)
        |      / sqrt(CAST(n.n * (n.n - 1) * (2 * n.n + 5) - tt.t3 AS DOUBLE) / 18.0), 6)
        |  END AS z
        |FROM n JOIN tt ON n.event_type = tt.event_type
        |  LEFT JOIN p ON n.event_type = p.event_type
        |ORDER BY n.event_type""".stripMargin) { (s, dir) =>
      val h = Tables.load(s, dir, "events")
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg((sum(col("value").cast(DecimalType(12, 2)))
          .cast(DecimalType(18, 2)) * 100).cast("long").as("c"))
      val p = h.as("a")
        .join(h.as("b"), col("a.event_type") === col("b.event_type")
          && col("a.hour") < col("b.hour"))
        .groupBy(col("a.event_type").as("event_type"))
        .agg(sum(when(col("b.c") > col("a.c"), 1)
          .when(col("b.c") < col("a.c"), -1).otherwise(0))
          .cast("long").as("s"))
      val n = h.groupBy("event_type").agg(count(lit(1)).as("n"))
      val tt = h.groupBy("event_type", "c").agg(count(lit(1)).as("t"))
        .groupBy("event_type")
        .agg(sum(col("t") * (col("t") - 1) * (lit(2) * col("t") + 5))
          .cast("long").as("t3"),
          sum(col("t") * (col("t") - 1)).cast("long").as("t2"))
      val sC = coalesce(col("s"), lit(0L))
      val u1 = col("n") * (col("n") - 1) - col("t2")
      val v18 = col("n") * (col("n") - 1) * (lit(2) * col("n") + 5) - col("t3")
      n.join(tt, "event_type").join(p, Seq("event_type"), "left")
        .select(col("event_type"), col("n"), sC.as("s"),
          when(u1 > 0,
            round(lit(2.0) * sC / sqrt(u1.cast("double")
              * (col("n") * (col("n") - 1)).cast("double")), 6)).as("tau"),
          when(v18 > 0,
            round((sC.cast("double")
              - when(sC > 0, 1).when(sC < 0, -1).otherwise(0))
              / sqrt(v18.cast("double") / 18.0), 6)).as("z"))
        .orderBy("event_type")
    },

    // BROWN-FORSYTHE (median-centered Levene) variance-homogeneity
    // test: are token-count spreads equal across sources? The
    // doubled absolute deviation |2x - 2·median| is an exact integer
    // (an interpolated integer median is k or k+0.5, so 2·median is
    // integral), per-group rational terms S²/n are decimal-quantized
    // before the cross-group sums (order-free exact), and the F
    // statistic is the single final double. Output: the per-source
    // spread census with the shared F/df on every row.
    Q("levene_bf",
      """WITH d AS (SELECT source, len(string_split(text, ' ')) AS x FROM documents),
        |m AS (SELECT source, CAST(2 * quantile_cont(x, 0.5) AS BIGINT) AS med2 FROM d GROUP BY 1),
        |z AS (SELECT d.source, abs(2 * d.x - m.med2) AS d2 FROM d JOIN m ON d.source = m.source),
        |g AS (SELECT source, COUNT(*) AS n, CAST(SUM(d2) AS BIGINT) AS sg,
        |    CAST(SUM(d2 * d2) AS BIGINT) AS ssg FROM z GROUP BY 1),
        |t AS (SELECT COUNT(*) AS k, CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(sg) AS BIGINT) AS st,
        |    CAST(SUM(CAST(round(CAST(sg * sg AS DOUBLE) / n, 6) AS DECIMAL(24,6))) AS DECIMAL(30,6)) AS bsum,
        |    CAST(SUM(CAST(round(ssg - CAST(sg * sg AS DOUBLE) / n, 6) AS DECIMAL(24,6))) AS DECIMAL(30,6)) AS wsum
        |  FROM g),
        |f AS (SELECT k, nt,
        |    CAST(bsum AS DOUBLE) - round(CAST(st * st AS DOUBLE) / nt, 6) AS btw,
        |    CAST(wsum AS DOUBLE) AS wth FROM t)
        |SELECT g.source, g.n,
        |  m.med2 / 2.0 AS median_tokens,
        |  round(CAST(g.sg AS DOUBLE) / (2.0 * g.n), 6) AS mean_absdev,
        |  CASE WHEN f.k > 1 AND f.nt > f.k AND f.wth > 0
        |    THEN round(f.btw * (f.nt - f.k) / (f.wth * (f.k - 1)), 6) END AS f_stat,
        |  f.k - 1 AS df1, f.nt - f.k AS df2
        |FROM g JOIN m ON g.source = m.source CROSS JOIN f
        |ORDER BY g.source""".stripMargin) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
        .select(col("source"), size(split(col("text"), " ")).as("x"))
      val m = d.groupBy("source")
        .agg((percentile(col("x"), lit(0.5)) * 2).cast("long").as("med2"))
      val z = d.join(broadcast(m), "source")
        .select(col("source"), abs(lit(2) * col("x") - col("med2")).as("d2"))
      val g = z.groupBy("source").agg(count(lit(1)).as("n"),
        sum(col("d2")).cast("long").as("sg"),
        sum(col("d2") * col("d2")).cast("long").as("ssg"))
      val bg = round((col("sg") * col("sg")).cast("double") / col("n"), 6)
      val t = g.agg(count(lit(1)).as("k"),
        sum(col("n")).cast("long").as("nt"),
        sum(col("sg")).cast("long").as("st"),
        sum(bg.cast(DecimalType(24, 6))).cast(DecimalType(30, 6)).as("bsum"),
        sum(round(col("ssg") - (col("sg") * col("sg")).cast("double") / col("n"), 6)
          .cast(DecimalType(24, 6))).cast(DecimalType(30, 6)).as("wsum"))
      val f = t.select(col("k"), col("nt"),
        (col("bsum").cast("double")
          - round((col("st") * col("st")).cast("double") / col("nt"), 6)).as("btw"),
        col("wsum").cast("double").as("wth"))
      g.join(broadcast(m), "source").crossJoin(broadcast(f))
        .select(col("source"), col("n"),
          (col("med2") / lit(2.0)).as("median_tokens"),
          round(col("sg").cast("double") / (lit(2.0) * col("n")), 6).as("mean_absdev"),
          when(col("k") > 1 && col("nt") > col("k") && col("wth") > 0,
            round(col("btw") * (col("nt") - col("k"))
              / (col("wth") * (col("k") - 1)), 6)).as("f_stat"),
          (col("k") - 1).as("df1"), (col("nt") - col("k")).as("df2"))
        .orderBy("source")
    },

    // BENJAMINI-HOCHBERG FDR over the per-source shift-test family:
    // the mann_whitney per-source z (identical derivation) feeds a
    // two-sided normal p via the A&S 7.1.26 erf polynomial — ONE
    // Scala constant table injected into both engines — then the BH
    // step-up: rank p ascending, reject ranks <= max{k: p_k <=
    // alpha·k/m} at alpha = 0.05. Decisions compare the ROUNDED
    // 6-dp p (a decimal both engines agree on bit-for-bit) against
    // the exact-rational threshold, so the discovery set cannot
    // drift on a sub-ulp libm difference.
    {
      val horner = ErfA.reverse.map(_.toString)
        .reduce((acc, a) => s"($acc * tv + $a)") + " * tv"
      Q("benjamini_hochberg",
        s"""WITH d AS (SELECT source, len(string_split(text, ' ')) AS x FROM documents),
          |g AS (SELECT x, COUNT(*) AS nx FROM d GROUP BY 1),
          |r AS (SELECT x, nx,
          |    2 * (SUM(nx) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) - nx) + nx + 1 AS r2
          |  FROM g),
          |sc AS (SELECT source, x, COUNT(*) AS cnt FROM d GROUP BY 1, 2),
          |t AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS n1,
          |    CAST(SUM(cnt * r.r2) AS BIGINT) AS r2sum
          |  FROM sc JOIN r ON sc.x = r.x GROUP BY 1),
          |nn AS (SELECT CAST(SUM(nx) AS BIGINT) AS nt,
          |    CAST(SUM(nx * nx * nx - nx) AS BIGINT) AS ties FROM g),
          |zz AS (SELECT source,
          |    round((CAST(r2sum - n1 * (n1 + 1) AS DOUBLE) - CAST(n1 * (nt - n1) AS DOUBLE))
          |      / (2.0 * sqrt(CAST(n1 AS DOUBLE) * (nt - n1) / 12.0
          |          * ((nt + 1.0) - CAST(ties AS DOUBLE) / nt / (nt - 1.0)))), 6) AS z
          |  FROM t, nn WHERE n1 < nt AND nt > 1),
          |x1 AS (SELECT source, z, abs(z) / sqrt(2.0) AS x FROM zz),
          |x2 AS (SELECT source, z, x, 1.0 / (1.0 + $ErfP * x) AS tv FROM x1),
          |pp AS (SELECT source, z, round($horner * exp(-x * x), 6) AS p FROM x2),
          |k AS (SELECT source, z, p,
          |    CAST(row_number() OVER (ORDER BY p, source) AS BIGINT) AS k,
          |    COUNT(*) OVER () AS m FROM pp)
          |SELECT source, z, p, k, round(CAST(0.05 AS DOUBLE) * k / m, 6) AS crit,
          |  k <= MAX(CASE WHEN p <= CAST(0.05 AS DOUBLE) * k / m THEN k ELSE 0 END) OVER () AS significant
          |FROM k ORDER BY k""".stripMargin) { (s, dir) =>
        val d = Tables.load(s, dir, "documents")
          .select(col("source"), size(split(col("text"), " ")).as("x"))
        val g = d.groupBy("x").agg(count(lit(1)).as("nx"))
        val cum = Window.orderBy("x")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val r = g.select(col("x"),
          r2(sum(col("nx")).over(cum), col("nx")).as("r2"))
        val sc = d.groupBy("source", "x").agg(count(lit(1)).as("cnt"))
        val t = sc.join(broadcast(r), "x")
          .groupBy("source")
          .agg(sum(col("cnt")).cast("long").as("n1"),
            sum(col("cnt") * col("r2")).cast("long").as("r2sum"))
        val nn = g.agg(sum(col("nx")).cast("long").as("nt"),
          sum(col("nx") * col("nx") * col("nx") - col("nx")).cast("long").as("ties"))
        val zz = t.crossJoin(broadcast(nn))
          .filter(col("n1") < col("nt") && col("nt") > 1)
          .select(col("source"),
            round(((col("r2sum") - col("n1") * (col("n1") + 1)).cast("double")
              - (col("n1") * (col("nt") - col("n1"))).cast("double"))
              / (lit(2.0) * sqrt(col("n1").cast("double") * (col("nt") - col("n1")) / 12.0
                * ((col("nt") + lit(1.0))
                  - col("ties").cast("double") / col("nt") / (col("nt") - lit(1.0))))), 6)
              .as("z"))
        val x = abs(col("z")) / sqrt(lit(2.0))
        val tE = lit(1.0) / (lit(1.0) + lit(ErfP) * x)
        val poly = ErfA.reverse.map(lit)
          .reduce((acc, a) => acc * tE + a) * tE
        val pp = zz.withColumn("p", round(poly * exp(-x * x), 6))
        val ord = Window.orderBy("p", "source")
        val whole = Window.orderBy("p", "source")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        val k = pp
          .withColumn("k", row_number().over(ord).cast("long"))
          .withColumn("m", count(lit(1)).over(whole))
        val crit = lit(0.05) * col("k") / col("m")
        k.withColumn("kmax",
            max(when(col("p") <= crit, col("k")).otherwise(0L)).over(whole))
          .select(col("source"), col("z"), col("p"), col("k"),
            round(crit, 6).as("crit"),
            (col("k") <= col("kmax")).as("significant"))
          .orderBy("k")
      }
    },

    // COCHRAN-MANTEL-HAENSZEL: does the user-parity cohort convert
    // (>=1 purchase) differently, controlling for DAY? Unit = active
    // user-day; each day is a 2x2 stratum. The CMH chi-square (with
    // the standard 0.5 continuity correction) and the Mantel-
    // Haenszel common odds ratio sum per-stratum rational terms that
    // are decimal-quantized first — exact order-free sums — with the
    // two final ratios as the only unrounded doubles. Day strata keep
    // every cell census-sized; the scan is one pass.
    Q("cmh_test",
      """WITH u AS (SELECT date_trunc('day', ts) AS day, user_id,
        |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS o
        |  FROM events GROUP BY 1, 2),
        |ue AS (SELECT day, CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS e, o FROM u),
        |s AS (SELECT day, CAST(SUM(e * o) AS BIGINT) AS a,
        |    CAST(SUM(e) AS BIGINT) AS n1, CAST(SUM(1 - e) AS BIGINT) AS n0,
        |    CAST(SUM(o) AS BIGINT) AS m1, CAST(SUM(1 - o) AS BIGINT) AS m0,
        |    COUNT(*) AS nk
        |  FROM ue GROUP BY 1),
        |t AS (SELECT COUNT(*) AS n_strata, CAST(SUM(a) AS BIGINT) AS sa,
        |    CAST(SUM(CAST(round(CAST(n1 * m1 AS DOUBLE) / nk, 6) AS DECIMAL(20,6))) AS DECIMAL(27,6)) AS se,
        |    CAST(SUM(CASE WHEN nk > 1
        |        THEN CAST(round(CAST(n1 * n0 AS DOUBLE) * m1 * m0 / (CAST(nk AS DOUBLE) * nk * (nk - 1)), 6) AS DECIMAL(20,6))
        |        ELSE CAST(0 AS DECIMAL(20,6)) END) AS DECIMAL(27,6)) AS sv,
        |    CAST(SUM(CAST(round(CAST(a * (n0 - m1 + a) AS DOUBLE) / nk, 6) AS DECIMAL(20,6))) AS DECIMAL(27,6)) AS sr,
        |    CAST(SUM(CAST(round(CAST((n1 - a) * (m1 - a) AS DOUBLE) / nk, 6) AS DECIMAL(20,6))) AS DECIMAL(27,6)) AS ss
        |  FROM s)
        |SELECT n_strata, sa AS sum_a, CAST(se AS DOUBLE) AS e_sum, CAST(sv AS DOUBLE) AS v_sum,
        |  CASE WHEN sv > 0
        |    THEN round((abs(CAST(sa AS DOUBLE) - CAST(se AS DOUBLE)) - 0.5)
        |      * (abs(CAST(sa AS DOUBLE) - CAST(se AS DOUBLE)) - 0.5) / CAST(sv AS DOUBLE), 6)
        |  END AS chi2_cmh,
        |  CASE WHEN ss > 0 THEN round(CAST(sr AS DOUBLE) / CAST(ss AS DOUBLE), 6) END AS or_mh
        |FROM t""".stripMargin) { (s, dir) =>
      val u = Tables.load(s, dir, "events")
        .groupBy(date_trunc("day", col("ts")).as("day"), col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1).otherwise(0)).as("o"))
        .select(col("day"),
          when(col("user_id") % 2 === 0, 1).otherwise(0).as("e"), col("o"))
      val st = u.groupBy("day").agg(
        sum(col("e") * col("o")).cast("long").as("a"),
        sum(col("e")).cast("long").as("n1"),
        sum(lit(1) - col("e")).cast("long").as("n0"),
        sum(col("o")).cast("long").as("m1"),
        sum(lit(1) - col("o")).cast("long").as("m0"),
        count(lit(1)).as("nk"))
      def dec(c: Column) = c.cast(DecimalType(20, 6))
      val t = st.agg(count(lit(1)).as("n_strata"),
        sum(col("a")).cast("long").as("sa"),
        sum(dec(round((col("n1") * col("m1")).cast("double") / col("nk"), 6)))
          .cast(DecimalType(27, 6)).as("se"),
        sum(when(col("nk") > 1,
          dec(round((col("n1") * col("n0")).cast("double") * col("m1") * col("m0")
            / (col("nk").cast("double") * col("nk") * (col("nk") - 1)), 6)))
          .otherwise(dec(lit(0)))).cast(DecimalType(27, 6)).as("sv"),
        sum(dec(round((col("a") * (col("n0") - col("m1") + col("a"))).cast("double")
          / col("nk"), 6))).cast(DecimalType(27, 6)).as("sr"),
        sum(dec(round(((col("n1") - col("a")) * (col("m1") - col("a"))).cast("double")
          / col("nk"), 6))).cast(DecimalType(27, 6)).as("ss"))
      val dev = abs(col("sa").cast("double") - col("se").cast("double")) - 0.5
      t.select(col("n_strata"), col("sa").as("sum_a"),
        col("se").cast("double").as("e_sum"),
        col("sv").cast("double").as("v_sum"),
        when(col("sv") > 0,
          round(dev * dev / col("sv").cast("double"), 6)).as("chi2_cmh"),
        when(col("ss") > 0,
          round(col("sr").cast("double") / col("ss").cast("double"), 6)).as("or_mh"))
    }
  )
}
