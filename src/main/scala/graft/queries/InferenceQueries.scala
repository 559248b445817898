package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Third statistical-inference wave: the k-group omnibus tests and
  * paired-agreement statistics that sit between the existing two-group
  * machinery (mann_whitney, ttest_welch) and the FDR layer
  * (benjamini_hochberg) — one-way ANOVA and Kruskal–Wallis across all
  * sources at once, Cohen's kappa / McNemar over paired per-document
  * verdicts (the label-quality audit for weak-supervision rules), and
  * Kendall's tau-b between two daily event series.
  *
  * Scale shape: every query is census-first — one corpus scan reduces
  * to a (value, count) or per-source moment grid, and ALL rank/pair
  * work runs on that census (bounded by the value domain or the day
  * span, never the corpus). Determinism: the suite's standard
  * contract — integer census sums, the doubled-rank trick for exact
  * average ranks under ties, per-group terms quantized to
  * DECIMAL(28,6) before the cross-group sum (order-free exact
  * addition), and ONE identically-written double expression per
  * output column, rounded to 6 dp.
  */
object InferenceQueries {

  /** A&S 7.1.26 erf polynomial (same constants as RankStatQueries):
    * erfc(z) = poly(t)·exp(-z²), t = 1/(1+Pz) — gives the 1-dof
    * chi-square survival p = erfc(sqrt(x/2)). */
  private val ErfP = 0.3275911
  private val ErfA = Seq(0.254829592, -0.284496736, 1.421413741,
    -1.453152027, 1.061405429)

  /** Doubled average rank (2·rank is integral even at ties). */
  private def r2(cum: Column, c: Column): Column =
    lit(2) * (cum - c) + c + 1

  /** The two deterministic "raters" for the agreement tests: rule A
    * fires on raw length (median split), rule B on mean word length
    * ≥ 5.4 chars — written integer-exact as 10·n_chars ≥ 54·tokens so
    * neither engine divides. Genuinely different signals (length vs
    * lexical density: cells ~189/67/157/87 at sf0.01), the standard
    * shape of two weak-supervision labeling functions judged against
    * each other. */
  private val duckRaters =
    """c AS (SELECT CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS a,
      |  CASE WHEN 10 * n_chars >= 54 * len(string_split(text, ' '))
      |    THEN 1 ELSE 0 END AS b
      |FROM documents)""".stripMargin

  private def sparkRaters(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.load(s, dir, "documents")
      .select(
        when(col("n_chars") >= 300, 1).otherwise(0).as("a"),
        when(lit(10) * col("n_chars") >= lit(54) * size(split(col("text"), " ")),
          1).otherwise(0).as("b"))

  /** Three-rater variant for the k-treatment tests: the two rules
    * above plus a type-token-ratio rule (lexical diversity ≥ 0.7,
    * integer-exact as 10·distinct ≥ 7·tokens). */
  private val duckRaters3 =
    """r AS (SELECT CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS a,
      |  CASE WHEN 10 * n_chars >= 54 * len(string_split(text, ' '))
      |    THEN 1 ELSE 0 END AS b,
      |  CASE WHEN 10 * len(list_distinct(string_split(text, ' ')))
      |    >= 7 * len(string_split(text, ' ')) THEN 1 ELSE 0 END AS c
      |FROM documents)""".stripMargin

  /** The three rule columns over any documents-shaped frame (text,
    * n_chars) — shared with the StreamAgreement streaming twin so the
    * streamed census and the batch query can never diverge. */
  private[graft] def raters3Of(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.select(
      when(col("n_chars") >= 300, 1).otherwise(0).as("a"),
      when(lit(10) * col("n_chars") >= lit(54) * size(split(col("text"), " ")),
        1).otherwise(0).as("b"),
      when(lit(10) * size(array_distinct(split(col("text"), " ")))
        >= lit(7) * size(split(col("text"), " ")), 1).otherwise(0).as("c"))

  private def sparkRaters3(s: org.apache.spark.sql.SparkSession, dir: String) =
    raters3Of(Tables.load(s, dir, "documents"))

  def all: Seq[Q] = Seq(

    // ONE-WAY ANOVA F — does mean document length differ ACROSS the
    // twenty sources (the omnibus companion to ttest_welch's two-group
    // form and levene_bf's variance question)? Everything reduces to
    // per-source integer moments (n, Σx) plus the global Σx² in one
    // scan; each source's between-group term sx²/n is quantized to
    // 6 dp and decimal-summed so the cross-source addition is
    // order-free, then SSB/SSW/F are single double expressions. The
    // sx² square is done in DOUBLE deliberately: at petabyte row
    // counts BIGINT would overflow long before the double loses the
    // 6-dp contract (terms are rounded anyway).
    Q("anova_f",
      """WITH d AS (SELECT source, n_chars AS x FROM documents),
        |t AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n1,
        |    CAST(SUM(x) AS BIGINT) AS sx FROM d GROUP BY 1),
        |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
        |    CAST(SUM(n1) AS BIGINT) AS nt, CAST(SUM(sx) AS BIGINT) AS gx,
        |    SUM(CAST(round(CAST(sx AS DOUBLE) * sx / (1.0 * n1), 6)
        |      AS DECIMAL(28,6))) AS a FROM t),
        |q AS (SELECT CAST(SUM(x * x) AS BIGINT) AS sxx FROM d)
        |SELECT nt AS n, k, CAST(k - 1 AS BIGINT) AS df_between,
        |  CAST(nt - k AS BIGINT) AS df_within,
        |  round(CAST(a AS DOUBLE) - CAST(gx AS DOUBLE) * gx / nt, 6) AS ssb,
        |  round(CAST(sxx AS DOUBLE) - CAST(a AS DOUBLE), 6) AS ssw,
        |  CASE WHEN k > 1 AND nt > k AND CAST(sxx AS DOUBLE) - CAST(a AS DOUBLE) > 0
        |    THEN round(((CAST(a AS DOUBLE) - CAST(gx AS DOUBLE) * gx / nt) / (k - 1))
        |      / ((CAST(sxx AS DOUBLE) - CAST(a AS DOUBLE)) / (nt - k)), 6) END AS f
        |FROM s, q""".stripMargin) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
        .select(col("source"), col("n_chars").as("x"))
      val t = d.groupBy("source")
        .agg(count(lit(1)).cast("long").as("n1"),
          sum(col("x")).cast("long").as("sx"))
      val st = t.agg(count(lit(1)).cast("long").as("k"),
        sum(col("n1")).cast("long").as("nt"),
        sum(col("sx")).cast("long").as("gx"),
        sum(round(col("sx").cast("double") * col("sx") / (lit(1.0) * col("n1")), 6)
          .cast(DecimalType(28, 6))).as("a"))
      val q = d.agg(sum(col("x") * col("x")).cast("long").as("sxx"))
      val ssb = col("a").cast("double") -
        col("gx").cast("double") * col("gx") / col("nt")
      val ssw = col("sxx").cast("double") - col("a").cast("double")
      st.crossJoin(q)
        .select(col("nt").as("n"), col("k"),
          (col("k") - 1).cast("long").as("df_between"),
          (col("nt") - col("k")).cast("long").as("df_within"),
          round(ssb, 6).as("ssb"), round(ssw, 6).as("ssw"),
          // single-group / zero-within-variance inputs: NULL, never an
          // ANSI divide-by-zero (the degenerate-sweep contract)
          when(col("k") > 1 && col("nt") > col("k") && ssw > 0,
            round((ssb / (col("k") - 1)) / (ssw / (col("nt") - col("k"))), 6))
            .as("f"))
    },

    // KRUSKAL–WALLIS H — the rank-based omnibus sibling: are the
    // per-source length distributions exchangeable? Global doubled
    // average ranks come from ONE (value, count) census window (every
    // rank an exact integer under ties), per-source rank sums are
    // BIGINT, each source's R²/n term is quantized and decimal-summed
    // (order-free), and the tie-corrected H divides by
    // 1 − Σ(t³−t)/(N³−N) from the same census.
    Q("kruskal_wallis",
      """WITH d AS (SELECT source, n_chars AS x FROM documents),
        |g AS (SELECT x, COUNT(*) AS nx FROM d GROUP BY 1),
        |r AS (SELECT x,
        |    2 * (SUM(nx) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) - nx) + nx + 1 AS r2
        |  FROM g),
        |sc AS (SELECT source, x, COUNT(*) AS cnt FROM d GROUP BY 1, 2),
        |t AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS n1,
        |    CAST(SUM(cnt * r.r2) AS BIGINT) AS r2sum
        |  FROM sc JOIN r ON sc.x = r.x GROUP BY 1),
        |nn AS (SELECT CAST(SUM(nx) AS BIGINT) AS nt,
        |    CAST(SUM(nx * nx * nx - nx) AS BIGINT) AS ties FROM g),
        |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
        |    SUM(CAST(round(CAST(r2sum AS DOUBLE) * r2sum / (4.0 * n1), 6)
        |      AS DECIMAL(28,6))) AS ssum FROM t)
        |SELECT nt AS n, k, CAST(k - 1 AS BIGINT) AS df,
        |  round(12.0 * CAST(ssum AS DOUBLE) / (CAST(nt AS DOUBLE) * (nt + 1.0))
        |    - 3.0 * (nt + 1.0), 6) AS h,
        |  CASE WHEN nt > 1 AND ties < nt * nt * nt - nt
        |    THEN round((12.0 * CAST(ssum AS DOUBLE) / (CAST(nt AS DOUBLE) * (nt + 1.0))
        |        - 3.0 * (nt + 1.0))
        |      / (1.0 - CAST(ties AS DOUBLE) / (CAST(nt AS DOUBLE) * nt * nt - nt)), 6)
        |    END AS h_tie_corrected
        |FROM s, nn""".stripMargin) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
        .select(col("source"), col("n_chars").as("x"))
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
        sum(col("nx") * col("nx") * col("nx") - col("nx")).cast("long")
          .as("ties"))
      val st = t.agg(count(lit(1)).cast("long").as("k"),
        sum(round(col("r2sum").cast("double") * col("r2sum")
            / (lit(4.0) * col("n1")), 6)
          .cast(DecimalType(28, 6))).as("ssum"))
      val h = lit(12.0) * col("ssum").cast("double") /
        (col("nt").cast("double") * (col("nt") + lit(1.0))) -
        lit(3.0) * (col("nt") + lit(1.0))
      val corr = lit(1.0) - col("ties").cast("double") /
        (col("nt").cast("double") * col("nt") * col("nt") - col("nt"))
      st.crossJoin(nn)
        .select(col("nt").as("n"), col("k"),
          (col("k") - 1).cast("long").as("df"),
          round(h, 6).as("h"),
          // all-tied or single-row inputs: NULL, never a divide-by-zero
          when(col("nt") > 1 &&
              col("ties") < col("nt") * col("nt") * col("nt") - col("nt"),
            round(h / corr, 6)).as("h_tie_corrected"))
    },

    // COHEN'S KAPPA — chance-corrected agreement between the two
    // labeling rules: the confusion census (four BIGINT cells) is the
    // whole reduction; observed and expected agreement are single
    // double expressions over it. The canonical label-quality gate
    // before trusting weak-supervision rules as training labels.
    Q("cohens_kappa",
      s"""WITH $duckRaters,
        |m AS (SELECT CAST(SUM(a * b) AS BIGINT) AS n11,
        |    CAST(SUM(a * (1 - b)) AS BIGINT) AS n10,
        |    CAST(SUM((1 - a) * b) AS BIGINT) AS n01,
        |    CAST(SUM((1 - a) * (1 - b)) AS BIGINT) AS n00,
        |    CAST(COUNT(*) AS BIGINT) AS n FROM c)
        |SELECT n11, n10, n01, n00,
        |  CASE WHEN n > 0 THEN round(CAST(n11 + n00 AS DOUBLE) / n, 6) END AS po,
        |  CASE WHEN n > 0 THEN round((CAST(n11 + n10 AS DOUBLE) * (n11 + n01)
        |    + CAST(n01 + n00 AS DOUBLE) * (n10 + n00)) / (CAST(n AS DOUBLE) * n), 6)
        |    END AS pe,
        |  CASE WHEN n > 0 AND (CAST(n11 + n10 AS DOUBLE) * (n11 + n01)
        |      + CAST(n01 + n00 AS DOUBLE) * (n10 + n00)) < CAST(n AS DOUBLE) * n
        |    THEN round((CAST(n11 + n00 AS DOUBLE) / n
        |      - (CAST(n11 + n10 AS DOUBLE) * (n11 + n01)
        |        + CAST(n01 + n00 AS DOUBLE) * (n10 + n00)) / (CAST(n AS DOUBLE) * n))
        |    / (1.0 - (CAST(n11 + n10 AS DOUBLE) * (n11 + n01)
        |        + CAST(n01 + n00 AS DOUBLE) * (n10 + n00)) / (CAST(n AS DOUBLE) * n)),
        |    6) END AS kappa
        |FROM m""".stripMargin) { (s, dir) =>
      val m = sparkRaters(s, dir)
        .agg(sum(col("a") * col("b")).cast("long").as("n11"),
          sum(col("a") * (lit(1) - col("b"))).cast("long").as("n10"),
          sum((lit(1) - col("a")) * col("b")).cast("long").as("n01"),
          sum((lit(1) - col("a")) * (lit(1) - col("b"))).cast("long").as("n00"),
          count(lit(1)).cast("long").as("n"))
      val po = (col("n11") + col("n00")).cast("double") / col("n")
      val peNum = (col("n11") + col("n10")).cast("double") * (col("n11") + col("n01")) +
        (col("n01") + col("n00")).cast("double") * (col("n10") + col("n00"))
      val pe = peNum / (col("n").cast("double") * col("n"))
      // empty input or pe == 1 (both raters constant and equal): NULL,
      // never an ANSI divide-by-zero. pe < 1 is tested on the exact
      // integer-derived products, identically in both engines.
      m.select(col("n11"), col("n10"), col("n01"), col("n00"),
        when(col("n") > 0, round(po, 6)).as("po"),
        when(col("n") > 0, round(pe, 6)).as("pe"),
        when(col("n") > 0 && peNum < col("n").cast("double") * col("n"),
          round((po - pe) / (lit(1.0) - pe), 6)).as("kappa"))
    },

    // McNEMAR — do the two rules DISAGREE symmetrically? Only the
    // discordant cells matter: chi² = (b−c)²/(b+c) plus the
    // continuity-corrected form, with the 1-dof survival p =
    // erfc(sqrt(x/2)) via the suite's shared A&S erf polynomial (one
    // literal constant table injected into both engines). Rounding
    // the statistic to 6 dp BEFORE the p transform keeps the libm
    // inputs bit-identical across engines.
    {
      val horner = ErfA.reverse.map(_.toString)
        .reduce((acc, a) => s"($acc * tv + $a)") + " * tv"
      Q("mcnemar_test",
        s"""WITH $duckRaters,
          |m AS (SELECT CAST(SUM(a * (1 - b)) AS BIGINT) AS b,
          |    CAST(SUM((1 - a) * b) AS BIGINT) AS c FROM c),
          |x AS (SELECT b, c,
          |    CASE WHEN b + c > 0 THEN
          |      round(CAST((b - c) * (b - c) AS DOUBLE) / (b + c), 6) END AS chi2,
          |    CASE WHEN b + c > 0 THEN round((CAST(abs(b - c) AS DOUBLE) - 1.0)
          |      * (CAST(abs(b - c) AS DOUBLE) - 1.0) / (b + c), 6) END AS chi2_cc
          |  FROM m),
          |z AS (SELECT b, c, chi2, chi2_cc, sqrt(chi2_cc / 2.0) AS z0 FROM x),
          |t AS (SELECT b, c, chi2, chi2_cc, z0,
          |    1.0 / (1.0 + $ErfP * z0) AS tv FROM z)
          |SELECT b, c, chi2, chi2_cc,
          |  round($horner * exp(-z0 * z0), 6) AS p
          |FROM t""".stripMargin) { (s, dir) =>
        val m = sparkRaters(s, dir)
          .agg(sum(col("a") * (lit(1) - col("b"))).cast("long").as("b"),
            sum((lit(1) - col("a")) * col("b")).cast("long").as("c"))
        // zero discordance: NULL statistic, never a divide-by-zero
        val x = m.select(col("b"), col("c"),
          when(col("b") + col("c") > 0,
            round(((col("b") - col("c")) * (col("b") - col("c"))).cast("double")
              / (col("b") + col("c")), 6)).as("chi2"),
          when(col("b") + col("c") > 0,
            round((abs(col("b") - col("c")).cast("double") - lit(1.0))
              * (abs(col("b") - col("c")).cast("double") - lit(1.0))
              / (col("b") + col("c")), 6)).as("chi2_cc"))
        val z0 = sqrt(col("chi2_cc") / lit(2.0))
        val tv = lit(1.0) / (lit(1.0) + lit(ErfP) * z0)
        val poly = ErfA.reverse.map(lit).reduce((acc, a) => acc * tv + a) * tv
        x.select(col("b"), col("c"), col("chi2"), col("chi2_cc"),
          round(poly * exp(-z0 * z0), 6).as("p"))
      }
    },

    // KENDALL TAU-B between the daily click and purchase count
    // series — the ordinal association check behind "do these two
    // streams move together?", robust to the marginal distributions
    // in a way ccf/Pearson is not. The corpus reduces to ONE ≤|days|
    // row census in a single scan; concordance counting is a pair
    // join ON THE CENSUS (D(D−1)/2 pairs, trivially bounded by the
    // calendar — at 100 TB the day census is still tiny), and tau-b's
    // tie terms come from the same pair counts. All-integer until the
    // one final double.
    Q("kendall_tau_daily",
      """WITH e AS (SELECT epoch_us(date_trunc('day', ts)) // 86400000000 AS d,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS x,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |p AS (SELECT
        |    CAST(SUM(CASE WHEN (a.x < b.x AND a.y < b.y)
        |      OR (a.x > b.x AND a.y > b.y) THEN 1 ELSE 0 END) AS BIGINT) AS nc,
        |    CAST(SUM(CASE WHEN (a.x < b.x AND a.y > b.y)
        |      OR (a.x > b.x AND a.y < b.y) THEN 1 ELSE 0 END) AS BIGINT) AS nd,
        |    CAST(SUM(CASE WHEN a.x = b.x THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(SUM(CASE WHEN a.y = b.y THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |    CAST(COUNT(*) AS BIGINT) AS n0,
        |    CAST(COUNT(DISTINCT a.d) + 1 AS BIGINT) AS n_days
        |  FROM e a JOIN e b ON a.d < b.d)
        |SELECT n_days, nc, nd, n1 AS n_tied_x, n2 AS n_tied_y,
        |  CASE WHEN n0 > n1 AND n0 > n2 THEN round(CAST(nc - nd AS DOUBLE)
        |    / sqrt(CAST(n0 - n1 AS DOUBLE) * (n0 - n2)), 6) END AS tau_b
        |FROM p""".stripMargin) { (s, dir) =>
      val e = Tables.load(s, dir, "events")
        .groupBy(expr("unix_micros(date_trunc('day', ts)) div 86400000000L")
          .as("d"))
        .agg(sum(when(col("event_type") === "click", 1).otherwise(0))
            .cast("long").as("x"),
          sum(when(col("event_type") === "purchase", 1).otherwise(0))
            .cast("long").as("y"))
      val a = e.toDF("da", "xa", "ya")
      val b = e.toDF("db", "xb", "yb")
      val p = a.join(broadcast(b), col("da") < col("db"))
        .agg(
          sum(when((col("xa") < col("xb") && col("ya") < col("yb"))
            || (col("xa") > col("xb") && col("ya") > col("yb")), 1)
            .otherwise(0)).cast("long").as("nc"),
          sum(when((col("xa") < col("xb") && col("ya") > col("yb"))
            || (col("xa") > col("xb") && col("ya") < col("yb")), 1)
            .otherwise(0)).cast("long").as("nd"),
          sum(when(col("xa") === col("xb"), 1).otherwise(0)).cast("long")
            .as("n1"),
          sum(when(col("ya") === col("yb"), 1).otherwise(0)).cast("long")
            .as("n2"),
          count(lit(1)).cast("long").as("n0"),
          (countDistinct(col("da")) + 1).cast("long").as("n_days"))
      // a fully-tied series (either margin): NULL, never a divide-by-zero
      p.select(col("n_days"), col("nc"), col("nd"),
        col("n1").as("n_tied_x"), col("n2").as("n_tied_y"),
        when(col("n0") > col("n1") && col("n0") > col("n2"),
          round((col("nc") - col("nd")).cast("double")
            / sqrt((col("n0") - col("n1")).cast("double")
              * (col("n0") - col("n2"))), 6)).as("tau_b"))
    },

    // COCHRAN'S Q — McNemar's k-treatment generalization: do the
    // THREE labeling rules (length, word length, type-token ratio)
    // fire at the same rate on the same documents? Everything reduces
    // to four integers in one scan — per-rule column totals G_j and
    // the per-doc row-sum moments ΣL, ΣL² — and Q's numerator and
    // denominator are both exact integers. The 2-dof survival is
    // closed-form: p = exp(-Q/2) (even-dof chi-square needs no erf).
    // Unanimous-per-document corpora (every row sum 0 or 3) have zero
    // denominator: NULL, never a divide-by-zero.
    Q("cochrans_q",
      s"""WITH $duckRaters3,
        |m AS (SELECT CAST(SUM(a) AS BIGINT) AS g1,
        |    CAST(SUM(b) AS BIGINT) AS g2, CAST(SUM(c) AS BIGINT) AS g3,
        |    CAST(SUM((a + b + c) * (a + b + c)) AS BIGINT) AS sl2,
        |    CAST(COUNT(*) AS BIGINT) AS n FROM r)
        |SELECT n, g1, g2, g3,
        |  CASE WHEN 3 * (g1 + g2 + g3) - sl2 > 0
        |    THEN round(2.0 * (3 * (g1 * g1 + g2 * g2 + g3 * g3)
        |        - (g1 + g2 + g3) * (g1 + g2 + g3))
        |      / (3 * (g1 + g2 + g3) - sl2), 6) END AS q_stat,
        |  CASE WHEN 3 * (g1 + g2 + g3) - sl2 > 0
        |    THEN round(exp(-(2.0 * (3 * (g1 * g1 + g2 * g2 + g3 * g3)
        |        - (g1 + g2 + g3) * (g1 + g2 + g3))
        |      / (3 * (g1 + g2 + g3) - sl2)) / 2.0), 6) END AS p
        |FROM m""".stripMargin) { (s, dir) =>
      val l = col("a") + col("b") + col("c")
      val m = sparkRaters3(s, dir)
        .agg(sum(col("a")).cast("long").as("g1"),
          sum(col("b")).cast("long").as("g2"),
          sum(col("c")).cast("long").as("g3"),
          sum(l * l).cast("long").as("sl2"),
          count(lit(1)).cast("long").as("n"))
      val sg = col("g1") + col("g2") + col("g3")
      val den = lit(3) * sg - col("sl2")
      val qs = lit(2.0) * (lit(3) * (col("g1") * col("g1")
        + col("g2") * col("g2") + col("g3") * col("g3")) - sg * sg) / den
      m.select(col("n"), col("g1"), col("g2"), col("g3"),
        when(den > 0, round(qs, 6)).as("q_stat"),
        when(den > 0, round(exp(-qs / lit(2.0)), 6)).as("p"))
    },

    // FLEISS' KAPPA — chance-corrected agreement for ALL THREE rules
    // at once (cohens_kappa handles exactly two): with n=3 raters and
    // binary categories the whole computation lives on the 4-cell
    // row-sum census m_s (how many docs got s of 3 votes). P̄ comes
    // from the integer T1 = Σ m_s·[s(s−1)+(3−s)(2−s)], the chance
    // agreement from the integer vote total S — every ratio is ONE
    // identically-written double over exact integers. A corpus where
    // every rater votes identically on every doc has P̄e = 1: NULL.
    Q("fleiss_kappa",
      s"""WITH $duckRaters3,
        |cen AS (SELECT a + b + c AS sv, CAST(COUNT(*) AS BIGINT) AS m
        |        FROM r GROUP BY 1),
        |t AS (SELECT CAST(SUM(m) AS BIGINT) AS n,
        |    CAST(SUM(sv * m) AS BIGINT) AS s,
        |    CAST(SUM((sv * (sv - 1) + (3 - sv) * (2 - sv)) * m) AS BIGINT) AS t1
        |  FROM cen)
        |SELECT n, s AS n_votes,
        |  round(CAST(t1 AS DOUBLE) / (6.0 * n), 6) AS pbar,
        |  round((CAST(s AS DOUBLE) * s + CAST(3 * n - s AS DOUBLE) * (3 * n - s))
        |    / (9.0 * n * n), 6) AS pe,
        |  CASE WHEN CAST(s AS DOUBLE) * s + CAST(3 * n - s AS DOUBLE) * (3 * n - s)
        |      < 9.0 * n * n
        |    THEN round((CAST(t1 AS DOUBLE) / (6.0 * n)
        |        - (CAST(s AS DOUBLE) * s + CAST(3 * n - s AS DOUBLE) * (3 * n - s))
        |          / (9.0 * n * n))
        |      / (1.0 - (CAST(s AS DOUBLE) * s + CAST(3 * n - s AS DOUBLE) * (3 * n - s))
        |          / (9.0 * n * n)), 6) END AS kappa
        |FROM t""".stripMargin) { (s, dir) =>
      val sv = col("a") + col("b") + col("c")
      val cen = sparkRaters3(s, dir)
        .groupBy(sv.as("sv")).agg(count(lit(1)).cast("long").as("m"))
      val t = cen.agg(sum(col("m")).cast("long").as("n"),
        sum(col("sv") * col("m")).cast("long").as("s"),
        sum((col("sv") * (col("sv") - 1)
          + (lit(3) - col("sv")) * (lit(2) - col("sv"))) * col("m"))
          .cast("long").as("t1"))
      val peNum = col("s").cast("double") * col("s") +
        (lit(3) * col("n") - col("s")).cast("double") *
          (lit(3) * col("n") - col("s"))
      val pe = peNum / (lit(9.0) * col("n") * col("n"))
      val pbar = col("t1").cast("double") / (lit(6.0) * col("n"))
      t.select(col("n"), col("s").as("n_votes"),
        round(pbar, 6).as("pbar"), round(pe, 6).as("pe"),
        when(peNum < lit(9.0) * col("n") * col("n"),
          round((pbar - pe) / (lit(1.0) - pe), 6)).as("kappa"))
    },

    // PAIRWISE WELCH + BH — the post-hoc layer anova_f points at:
    // WHICH source pairs differ in mean length? Every pair's Welch z
    // comes from the same per-source integer moment census (large-n
    // normal approximation of the t reference, the suite's standard —
    // n=25/source at the gate SF and far larger in production), the
    // two-sided p via the shared A&S erf polynomial on the 6-dp
    // ROUNDED z, and the Benjamini–Hochberg step-up controls FDR over
    // all |k|(|k|−1)/2 comparisons at α = 0.05 — the
    // benjamini_hochberg machinery applied to the pair family.
    // Zero-variance or single-row sources: NULL z, excluded from the
    // family (matching the omnibus guards).
    {
      val horner = ErfA.reverse.map(_.toString)
        .reduce((acc, a) => s"($acc * tv + $a)") + " * tv"
      val vA = "(CAST(sxxa AS DOUBLE) - CAST(sxa AS DOUBLE) * sxa / na) / (na - 1)"
      val vB = "(CAST(sxxb AS DOUBLE) - CAST(sxb AS DOUBLE) * sxb / nb) / (nb - 1)"
      Q("pairwise_welch_bh",
        s"""WITH d AS (SELECT source, n_chars AS x FROM documents),
          |t AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n1,
          |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(x * x) AS BIGINT) AS sxx
          |  FROM d GROUP BY 1),
          |pr AS (SELECT a.source AS source_a, b.source AS source_b,
          |    a.n1 AS na, a.sx AS sxa, a.sxx AS sxxa,
          |    b.n1 AS nb, b.sx AS sxb, b.sxx AS sxxb
          |  FROM t a JOIN t b ON a.source < b.source),
          |zz AS (SELECT source_a, source_b,
          |    CASE WHEN na > 1 AND nb > 1 AND $vA / na + $vB / nb > 0
          |      THEN round((CAST(sxa AS DOUBLE) / na - CAST(sxb AS DOUBLE) / nb)
          |        / sqrt($vA / na + $vB / nb), 6) END AS z
          |  FROM pr),
          |zf AS (SELECT source_a, source_b, z FROM zz WHERE z IS NOT NULL),
          |x1 AS (SELECT source_a, source_b, z, abs(z) / sqrt(2.0) AS x FROM zf),
          |x2 AS (SELECT source_a, source_b, z, x,
          |       1.0 / (1.0 + $ErfP * x) AS tv FROM x1),
          |pp AS (SELECT source_a, source_b, z,
          |       round($horner * exp(-x * x), 6) AS p FROM x2),
          |k AS (SELECT source_a, source_b, z, p,
          |    CAST(row_number() OVER (ORDER BY p, source_a, source_b) AS BIGINT) AS k,
          |    COUNT(*) OVER () AS m FROM pp)
          |SELECT source_a, source_b, z, p, k,
          |  round(CAST(0.05 AS DOUBLE) * k / m, 6) AS crit,
          |  k <= MAX(CASE WHEN p <= CAST(0.05 AS DOUBLE) * k / m
          |    THEN k ELSE 0 END) OVER () AS significant
          |FROM k ORDER BY k""".stripMargin) { (s, dir) =>
        val d = Tables.load(s, dir, "documents")
          .select(col("source"), col("n_chars").as("x"))
        val t = d.groupBy("source")
          .agg(count(lit(1)).cast("long").as("n1"),
            sum(col("x")).cast("long").as("sx"),
            sum(col("x") * col("x")).cast("long").as("sxx"))
        val a = t.toDF("source_a", "na", "sxa", "sxxa")
        val b = t.toDF("source_b", "nb", "sxb", "sxxb")
        val va = (col("sxxa").cast("double")
          - col("sxa").cast("double") * col("sxa") / col("na")) / (col("na") - 1)
        val vb = (col("sxxb").cast("double")
          - col("sxb").cast("double") * col("sxb") / col("nb")) / (col("nb") - 1)
        val se2 = va / col("na") + vb / col("nb")
        val zz = a.join(b, col("source_a") < col("source_b"))
          .select(col("source_a"), col("source_b"),
            when(col("na") > 1 && col("nb") > 1 && se2 > 0,
              round((col("sxa").cast("double") / col("na")
                - col("sxb").cast("double") / col("nb")) / sqrt(se2), 6))
              .as("z"))
          .filter(col("z").isNotNull)
        val x = abs(col("z")) / sqrt(lit(2.0))
        val tv = lit(1.0) / (lit(1.0) + lit(ErfP) * x)
        val poly = ErfA.reverse.map(lit).reduce((acc, c) => acc * tv + c) * tv
        val pp = zz.withColumn("p", round(poly * exp(-x * x), 6))
        val ord = Window.orderBy("p", "source_a", "source_b")
        val whole = Window.orderBy("p", "source_a", "source_b")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        val kf = pp
          .withColumn("k", row_number().over(ord).cast("long"))
          .withColumn("m", count(lit(1)).over(whole))
        val crit = lit(0.05) * col("k") / col("m")
        kf.withColumn("kmax",
            max(when(col("p") <= crit, col("k")).otherwise(0L)).over(whole))
          .select(col("source_a"), col("source_b"), col("z"), col("p"),
            col("k"), round(crit, 6).as("crit"),
            (col("k") <= col("kmax")).as("significant"))
          .orderBy("k")
      }
    },

    // MUTUAL INFORMATION between the two labeling rules — the
    // information-theoretic complement to cohens_kappa on the SAME
    // 2×2 confusion census: how many nats does knowing rule A's
    // verdict buy about rule B's? Reported with both marginal
    // entropies and the normalized MI = I/√(H(a)·H(b)) (the
    // feature-redundancy score a labeling-function library dedups
    // by). Four per-cell terms added in literal written order; empty
    // cells contribute 0 by the 0·ln 0 = 0 convention, identically in
    // both engines.
    {
      def duckTerm(nij: String, ri: String, cj: String) =
        s"""CASE WHEN $nij > 0 THEN (CAST($nij AS DOUBLE) / n)
           |    * ln(CAST($nij AS DOUBLE) * n / (CAST($ri AS DOUBLE) * $cj))
           |    ELSE 0.0 END""".stripMargin
      val (r1, r0, c1, c0) = ("(n11 + n10)", "(n01 + n00)", "(n11 + n01)", "(n10 + n00)")
      def duckEnt(m1: String, m0: String) =
        s"""-(CASE WHEN $m1 > 0 THEN (CAST($m1 AS DOUBLE) / n) * ln(CAST($m1 AS DOUBLE) / n) ELSE 0.0 END
           |  + CASE WHEN $m0 > 0 THEN (CAST($m0 AS DOUBLE) / n) * ln(CAST($m0 AS DOUBLE) / n) ELSE 0.0 END)""".stripMargin
      val miExpr = Seq(
        duckTerm("n11", r1, c1), duckTerm("n10", r1, c0),
        duckTerm("n01", r0, c1), duckTerm("n00", r0, c0)).mkString(" +\n  ")
      Q("mutual_info_rules",
        s"""WITH $duckRaters,
          |m AS (SELECT CAST(SUM(a * b) AS BIGINT) AS n11,
          |    CAST(SUM(a * (1 - b)) AS BIGINT) AS n10,
          |    CAST(SUM((1 - a) * b) AS BIGINT) AS n01,
          |    CAST(SUM((1 - a) * (1 - b)) AS BIGINT) AS n00,
          |    CAST(COUNT(*) AS BIGINT) AS n FROM c)
          |SELECT n11, n10, n01, n00,
          |  CASE WHEN n > 0 THEN round($miExpr, 6) END AS mi_nats,
          |  CASE WHEN n > 0 THEN round(${duckEnt(r1, r0)}, 6) END AS h_a,
          |  CASE WHEN n > 0 THEN round(${duckEnt(c1, c0)}, 6) END AS h_b,
          |  CASE WHEN n > 0 AND ${duckEnt(r1, r0)} > 0 AND ${duckEnt(c1, c0)} > 0
          |    THEN round(($miExpr)
          |      / sqrt((${duckEnt(r1, r0)}) * (${duckEnt(c1, c0)})), 6) END AS nmi
          |FROM m""".stripMargin) { (s, dir) =>
        val m = sparkRaters(s, dir)
          .agg(sum(col("a") * col("b")).cast("long").as("n11"),
            sum(col("a") * (lit(1) - col("b"))).cast("long").as("n10"),
            sum((lit(1) - col("a")) * col("b")).cast("long").as("n01"),
            sum((lit(1) - col("a")) * (lit(1) - col("b"))).cast("long").as("n00"),
            count(lit(1)).cast("long").as("n"))
        val rr1 = col("n11") + col("n10"); val rr0 = col("n01") + col("n00")
        val cc1 = col("n11") + col("n01"); val cc0 = col("n10") + col("n00")
        def term(nij: Column, ri: Column, cj: Column) =
          when(nij > 0, (nij.cast("double") / col("n"))
            * log(nij.cast("double") * col("n") / (ri.cast("double") * cj)))
            .otherwise(lit(0.0))
        def ent(m1: Column, m0: Column) =
          -(when(m1 > 0, (m1.cast("double") / col("n"))
              * log(m1.cast("double") / col("n"))).otherwise(lit(0.0))
            + when(m0 > 0, (m0.cast("double") / col("n"))
              * log(m0.cast("double") / col("n"))).otherwise(lit(0.0)))
        val mi = term(col("n11"), rr1, cc1) + term(col("n10"), rr1, cc0) +
          term(col("n01"), rr0, cc1) + term(col("n00"), rr0, cc0)
        val ha = ent(rr1, rr0); val hb = ent(cc1, cc0)
        m.select(col("n11"), col("n10"), col("n01"), col("n00"),
          when(col("n") > 0, round(mi, 6)).as("mi_nats"),
          when(col("n") > 0, round(ha, 6)).as("h_a"),
          when(col("n") > 0, round(hb, 6)).as("h_b"),
          when(col("n") > 0 && ha > 0 && hb > 0,
            round(mi / sqrt(ha * hb), 6)).as("nmi"))
      }
    },

    // CRAMÉR'S V — the effect size chi_square_independence omits: how
    // STRONGLY are a document's language and source associated
    // (χ² says only whether; V ∈ [0,1] says how much, comparable
    // across table shapes)? The (lang, source) contingency census is
    // completed to the full marginal grid (zero cells still carry
    // expected mass), each cell's (o−e)²/e is quantized to 9 dp and
    // decimal-summed (order-free across the grid), and χ² and V are
    // single double expressions. Degenerate 1×c / r×1 tables: NULL,
    // never a divide-by-zero.
    Q("cramers_v",
      """WITH g AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
        |           FROM documents GROUP BY 1, 2),
        |r AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS rl FROM g GROUP BY 1),
        |cc AS (SELECT source, CAST(SUM(o) AS BIGINT) AS cs FROM g GROUP BY 1),
        |nn AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
        |    CAST((SELECT COUNT(*) FROM r) AS BIGINT) AS nr,
        |    CAST((SELECT COUNT(*) FROM cc) AS BIGINT) AS nc FROM g),
        |grid AS (SELECT r.rl, cc.cs, COALESCE(g.o, 0) AS o, nn.n, nn.nr, nn.nc
        |  FROM r CROSS JOIN cc CROSS JOIN nn
        |  LEFT JOIN g ON g.lang = r.lang AND g.source = cc.source),
        |chi AS (SELECT n, nr, nc,
        |    SUM(CAST(round((CAST(o AS DOUBLE) - CAST(rl AS DOUBLE) * cs / n)
        |      * (CAST(o AS DOUBLE) - CAST(rl AS DOUBLE) * cs / n)
        |      / (CAST(rl AS DOUBLE) * cs / n), 9) AS DECIMAL(28,9))) AS x2
        |  FROM grid GROUP BY 1, 2, 3)
        |SELECT n, nr AS n_rows, nc AS n_cols,
        |  CAST((nr - 1) * (nc - 1) AS BIGINT) AS df,
        |  round(CAST(x2 AS DOUBLE), 6) AS chi2,
        |  CASE WHEN n > 0 AND least(nr, nc) > 1
        |    THEN round(sqrt(CAST(x2 AS DOUBLE) / (CAST(n AS DOUBLE)
        |      * (least(nr, nc) - 1))), 6) END AS v
        |FROM chi""".stripMargin) { (s, dir) =>
      val g = Tables.load(s, dir, "documents")
        .groupBy("lang", "source").agg(count(lit(1)).cast("long").as("o"))
      val r = g.groupBy("lang").agg(sum(col("o")).cast("long").as("rl"))
      val cgrp = g.groupBy("source").agg(sum(col("o")).cast("long").as("cs"))
      val nn = g.agg(sum(col("o")).cast("long").as("n"))
        .crossJoin(r.agg(count(lit(1)).cast("long").as("nr")))
        .crossJoin(cgrp.agg(count(lit(1)).cast("long").as("nc")))
      val grid = r.crossJoin(broadcast(cgrp)).crossJoin(broadcast(nn))
        .join(g, Seq("lang", "source"), "left")
        .select(col("rl"), col("cs"), coalesce(col("o"), lit(0L)).as("o"),
          col("n"), col("nr"), col("nc"))
      val e = col("rl").cast("double") * col("cs") / col("n")
      val chi = grid.groupBy("n", "nr", "nc")
        .agg(sum(round((col("o").cast("double") - e)
            * (col("o").cast("double") - e) / e, 9)
          .cast(DecimalType(28, 9))).as("x2"))
      chi.select(col("n"), col("nr").as("n_rows"), col("nc").as("n_cols"),
        ((col("nr") - 1) * (col("nc") - 1)).cast("long").as("df"),
        round(col("x2").cast("double"), 6).as("chi2"),
        when(col("n") > 0 && least(col("nr"), col("nc")) > 1,
          round(sqrt(col("x2").cast("double") / (col("n").cast("double")
            * (least(col("nr"), col("nc")) - 1))), 6)).as("v"))
    }
  )
}
