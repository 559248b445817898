package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Causal-attribution layer over the event stream: stratified
  * (standardized) treatment-effect estimation, and Markov
  * removal-effect attribution of conversions to touch channels —
  * the model-based sibling of last_touch_attribution.
  *
  * Scale shape: both queries reduce the corpus to censuses in one
  * scan — a per-user activity/outcome census for stratification, a
  * ≤(|channels|+2)² journey-transition census for the chain — and
  * all estimator arithmetic runs on the census. Cross-engine
  * determinism: per-stratum and per-iteration terms are quantized
  * (9 dp) before any cross-row sum; the chain iterations use the
  * SAME written update expression in the Scala fold and the
  * generated DuckDB SQL, so the 12-step absorption trajectories are
  * identical doubles on both engines.
  */
object AttributionQueries {

  /** The marketing-funnel touch channels (the non-absorbing states);
    * 'purchase' is the conversion event, journey end is NULL. */
  val Channels = Seq("click", "error", "signup", "view")
  val Iters = 12

  def all: Seq[Q] = Seq(

    // STRATIFIED (STANDARDIZED) RISK DIFFERENCE: the user-parity
    // cohort's conversion uplift, standardized over fixed activity
    // strata (events-per-user bins) — the stratification sibling of
    // cmh_test (risk difference vs odds ratio; direct
    // standardization vs MH weighting). Strata lacking either arm
    // are excluded (positivity), weights renormalize over included
    // strata, and each stratum's weighted contribution is
    // 9-dp-quantized before the decimal ATE sum.
    Q("propensity_strata",
      """WITH u AS (SELECT user_id, COUNT(*) AS cnt,
        |    CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS e,
        |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS o
        |  FROM events GROUP BY 1),
        |b AS (SELECT CASE WHEN cnt <= 20 THEN 1 WHEN cnt <= 40 THEN 2
        |             WHEN cnt <= 60 THEN 3 ELSE 4 END AS stratum, e, o FROM u),
        |s AS (SELECT stratum,
        |    CAST(SUM(e) AS BIGINT) AS n1, CAST(SUM(e * o) AS BIGINT) AS a1,
        |    CAST(SUM(1 - e) AS BIGINT) AS n0,
        |    CAST(SUM((1 - e) * o) AS BIGINT) AS a0
        |  FROM b GROUP BY 1),
        |i AS (SELECT stratum, n1, a1, n0, a0, n1 + n0 AS nk,
        |    CAST(SUM(n1 + n0) OVER () AS BIGINT) AS nincl
        |  FROM s WHERE n1 > 0 AND n0 > 0),
        |c AS (SELECT stratum, n1, a1, n0, a0, nk, nincl,
        |    CAST(a1 AS DOUBLE) / n1 AS p1, CAST(a0 AS DOUBLE) / n0 AS p0,
        |    CAST(round(CAST(nk AS DOUBLE)
        |      * (CAST(a1 AS DOUBLE) / n1 - CAST(a0 AS DOUBLE) / n0) / nincl, 9)
        |      AS DECIMAL(12,9)) AS contrib
        |  FROM i)
        |SELECT stratum, nk AS n_users, n1 AS n_exposed, n0 AS n_control,
        |  round(p1, 6) AS p_exposed, round(p0, 6) AS p_control,
        |  round(p1 - p0, 6) AS rd,
        |  round(CAST(CAST(SUM(contrib) OVER () AS DECIMAL(16,9)) AS DOUBLE), 6) AS ate
        |FROM c ORDER BY stratum""".stripMargin) { (s, dir) =>
      val u = Tables.load(s, dir, "events")
        .groupBy("user_id")
        .agg(count(lit(1)).as("cnt"),
          max(when(col("event_type") === "purchase", 1).otherwise(0)).as("o"))
        .select(when(col("user_id") % 2 === 0, 1).otherwise(0).as("e"),
          col("o"),
          when(col("cnt") <= 20, 1).when(col("cnt") <= 40, 2)
            .when(col("cnt") <= 60, 3).otherwise(4).as("stratum"))
      val st = u.groupBy("stratum").agg(
        sum(col("e")).cast("long").as("n1"),
        sum(col("e") * col("o")).cast("long").as("a1"),
        sum(lit(1) - col("e")).cast("long").as("n0"),
        sum((lit(1) - col("e")) * col("o")).cast("long").as("a0"))
      val whole = Window.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      val p1 = col("a1").cast("double") / col("n1")
      val p0 = col("a0").cast("double") / col("n0")
      st.filter(col("n1") > 0 && col("n0") > 0)
        .withColumn("nk", col("n1") + col("n0"))
        .withColumn("nincl", sum(col("nk")).over(whole).cast("long"))
        .withColumn("contrib",
          round(col("nk").cast("double") * (p1 - p0) / col("nincl"), 9)
            .cast(DecimalType(12, 9)))
        .select(col("stratum"), col("nk").as("n_users"),
          col("n1").as("n_exposed"), col("n0").as("n_control"),
          round(p1, 6).as("p_exposed"), round(p0, 6).as("p_control"),
          round(p1 - p0, 6).as("rd"),
          round(sum(col("contrib")).over(whole)
            .cast(DecimalType(16, 9)).cast("double"), 6).as("ate"))
        .orderBy("stratum")
    },

    // MARKOV REMOVAL-EFFECT ATTRIBUTION: model user journeys (events
    // up to the first purchase) as a first-order chain over the
    // touch channels with CONV/NULL absorbing ends; a channel's
    // credit is how much the chain's conversion probability drops
    // when that state is removed (transitions into it forfeited) —
    // the standard model-based alternative to last-touch. Absorption
    // probabilities run 12 fixed iterations with every iterate
    // 9-dp-quantized, and the five chains (full + one removal per
    // channel) use the SAME update expression in the Scala fold and
    // the generated SQL, so trajectories are engine-identical.
    // Scale: the corpus reduces to a ≤(|channels|+2)² transition
    // census in one scan; the census collect is contract-bounded
    // (the BPE-argmax discipline), and the iteration cost is
    // constant at any corpus size.
    Q("markov_attribution", {
      val states = "START" +: Channels
      def pcol(f: String, t: String) = s"p_${f.toLowerCase}_$t"
      val pivCols = (for { f <- states; t <- Channels :+ "CONV" } yield
        s"COALESCE(SUM(CASE WHEN frm = '$f' AND to_ = '$t' THEN p END), 0.0) AS ${pcol(f, t)}"
        ).mkString(",\n    ")
      // chains: "f" = full, "r_<ch>" = channel ch removed (its a ≡ 0)
      val chains = ("f", "") +: Channels.map(c => (s"r_$c", c))
      def aName(ch: String, j: String) = s"a_${ch}_$j"
      val init = chains.flatMap { case (ch, rm) =>
        Channels.filter(_ != rm).map(j => s"0.0 AS ${aName(ch, j)}")
      }.mkString(", ")
      val iterCtes = (1 to Iters).map { k =>
        val cols = chains.flatMap { case (ch, rm) =>
          Channels.filter(_ != rm).map { i =>
            val terms = Channels.filter(_ != rm)
              .map(j => s"${pcol(i, j)} * ${aName(ch, j)}")
              .mkString(" + ")
            s"round($terms + ${pcol(i, "CONV")}, 9) AS ${aName(ch, i)}"
          }
        }.mkString(",\n    ")
        s"it$k AS (SELECT\n    $cols\n  FROM it${k - 1}, piv)"
      }.mkString(",\n")
      val fin = chains.map { case (ch, rm) =>
        val terms = Channels.filter(_ != rm)
          .map(j => s"${pcol("START", j)} * ${aName(ch, j)}")
          .mkString(" + ")
        s"round($terms + ${pcol("START", "CONV")}, 9) AS pc_$ch"
      }.mkString(",\n    ")
      val resRows = Channels.map(c =>
        s"SELECT '$c' AS channel, pc_f AS pf, pc_r_$c AS pr FROM fin")
        .mkString("\n  UNION ALL ")
      s"""WITH o AS (SELECT user_id, event_type,
         |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
         |  FROM events),
         |fp AS (SELECT user_id, MIN(rn) AS prn FROM o
         |       WHERE event_type = 'purchase' GROUP BY 1),
         |j AS (SELECT o.user_id,
         |    CASE WHEN o.event_type = 'purchase' THEN 'CONV' ELSE o.event_type END AS st,
         |    o.rn, fp.prn
         |  FROM o LEFT JOIN fp USING (user_id)
         |  WHERE fp.prn IS NULL OR o.rn <= fp.prn),
         |e1 AS (SELECT COALESCE(lag(st) OVER (PARTITION BY user_id ORDER BY rn), 'START') AS frm,
         |    st AS to_ FROM j),
         |e2 AS (SELECT st AS frm, 'NULL' AS to_ FROM
         |    (SELECT st, rn, prn, MAX(rn) OVER (PARTITION BY user_id) AS mx FROM j)
         |  WHERE rn = mx AND prn IS NULL),
         |edges AS (SELECT * FROM e1 UNION ALL SELECT * FROM e2),
         |cnt AS (SELECT frm, to_, COUNT(*) AS n FROM edges GROUP BY 1, 2),
         |rs AS (SELECT frm, CAST(SUM(n) AS BIGINT) AS tot FROM cnt GROUP BY 1),
         |m AS (SELECT cnt.frm, cnt.to_, round(CAST(n AS DOUBLE) / tot, 6) AS p
         |      FROM cnt JOIN rs ON cnt.frm = rs.frm),
         |piv AS (SELECT
         |    $pivCols
         |  FROM m),
         |it0 AS (SELECT $init),
         |$iterCtes,
         |fin AS (SELECT
         |    $fin
         |  FROM it$Iters, piv),
         |res AS ($resRows),
         |re AS (SELECT channel, pf, pr,
         |    CASE WHEN pf > 0 THEN CAST(round(1.0 - pr / pf, 9) AS DECIMAL(12,9)) END AS re9
         |  FROM res)
         |SELECT channel, round(pf, 6) AS p_conv, round(pr, 6) AS p_removed,
         |  round(CAST(re9 AS DOUBLE), 6) AS removal_effect,
         |  CASE WHEN CAST(SUM(re9) OVER () AS DECIMAL(16,9)) > 0
         |    THEN round(CAST(re9 AS DOUBLE)
         |      / CAST(CAST(SUM(re9) OVER () AS DECIMAL(16,9)) AS DOUBLE), 6)
         |  END AS attribution
         |FROM re ORDER BY channel""".stripMargin
    }) { (s, dir) =>
      val byUser = Window.partitionBy("user_id").orderBy("rn")
      val o = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          row_number().over(Window.partitionBy("user_id")
            .orderBy(col("ts"), col("event_id"))).as("rn"))
      val fp = o.filter(col("event_type") === "purchase")
        .groupBy("user_id").agg(min(col("rn")).as("prn"))
      val j = o.join(fp, Seq("user_id"), "left")
        .filter(col("prn").isNull || col("rn") <= col("prn"))
        .select(col("user_id"),
          when(col("event_type") === "purchase", "CONV")
            .otherwise(col("event_type")).as("st"),
          col("rn"), col("prn"))
      val e1 = j.select(
        coalesce(lag(col("st"), 1).over(byUser), lit("START")).as("frm"),
        col("st").as("to_"))
      val e2 = j
        .withColumn("mx", max(col("rn")).over(Window.partitionBy("user_id")))
        .filter(col("rn") === col("mx") && col("prn").isNull)
        .select(col("st").as("frm"), lit("NULL").as("to_"))
      val m = e1.unionAll(e2)
        .groupBy("frm", "to_").agg(count(lit(1)).as("n"))
        .withColumn("tot",
          sum(col("n")).over(Window.partitionBy("frm")).cast("long"))
        .select(col("frm"), col("to_"),
          round(col("n").cast("double") / col("tot"), 6).as("p"))
      // contract-bounded collect: the census is <= (|channels|+2)^2
      // rows by construction (the BPE-argmax discipline)
      val pm: Map[(String, String), Double] = m.collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
      def p(f: String, t: String) = pm.getOrElse((f, t), 0.0)
      def rd9(x: Double) =
        BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      // the SAME update expression as the generated SQL: left-assoc
      // sum over channels in declaration order, + the CONV term
      def absorb(rm: String): Map[String, Double] = {
        var a = Channels.filter(_ != rm).map(_ -> 0.0).toMap
        for (_ <- 1 to Iters)
          a = a.map { case (i, _) =>
            i -> rd9(a.keys.toSeq.sortBy(Channels.indexOf)
              .map(jj => p(i, jj) * a(jj)).sum + p(i, "CONV"))
          }
        a
      }
      def startProb(rm: String, a: Map[String, Double]): Double =
        rd9(Channels.filter(_ != rm).map(jj => p("START", jj) * a(jj)).sum
          + p("START", "CONV"))
      val pf = startProb("", absorb(""))
      val rows = Channels.map { c =>
        val pr = startProb(c, absorb(c))
        val re9 = if (pf > 0) Some(BigDecimal(1.0 - pr / pf)
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)) else None
        (c, pf, pr, re9)
      }
      val reSum = rows.flatMap(_._4).sum
      def r6(x: Double) =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      import s.implicits._
      rows.map { case (c, f, pr, re9) =>
        (c, r6(f), r6(pr), re9.map(v => r6(v.toDouble)),
          re9.filter(_ => reSum > 0)
            .map(v => r6(v.toDouble / reSum.toDouble)))
      }.toDF("channel", "p_conv", "p_removed", "removal_effect", "attribution")
        .orderBy("channel")
    },

    // QINI UPLIFT CURVE: rank users by a targeting score (activity
    // count, descending — the score a campaign would target by) and
    // report the cumulative incremental conversions of the exposed
    // cohort over the control baseline at every score level:
    // Qini(r) = K1(r) - K0(r)·N1(r)/N0(r). Scale-correct ranking: the
    // curve is emitted at SCORE-VALUE granularity — windows run over
    // the |distinct activity| census, never a global per-user sort —
    // which is also what makes it deterministic (no intra-tie order).
    Q("qini_curve",
      """WITH u AS (SELECT user_id, COUNT(*) AS cnt,
        |    CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS e,
        |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS o
        |  FROM events GROUP BY 1),
        |c AS (SELECT cnt, COUNT(*) AS nu,
        |    CAST(SUM(e) AS BIGINT) AS n1, CAST(SUM(e * o) AS BIGINT) AS k1,
        |    CAST(SUM(1 - e) AS BIGINT) AS n0,
        |    CAST(SUM((1 - e) * o) AS BIGINT) AS k0
        |  FROM u GROUP BY 1),
        |w AS (SELECT cnt,
        |    CAST(SUM(nu) OVER win AS BIGINT) AS n_cum,
        |    CAST(SUM(n1) OVER win AS BIGINT) AS n1_cum,
        |    CAST(SUM(k1) OVER win AS BIGINT) AS k1_cum,
        |    CAST(SUM(n0) OVER win AS BIGINT) AS n0_cum,
        |    CAST(SUM(k0) OVER win AS BIGINT) AS k0_cum
        |  FROM c WINDOW win AS (ORDER BY cnt DESC ROWS UNBOUNDED PRECEDING))
        |SELECT cnt AS score, n_cum, n1_cum, n0_cum, k1_cum, k0_cum,
        |  CASE WHEN n0_cum > 0 THEN
        |    round(CAST(k1_cum AS DOUBLE)
        |      - CAST(k0_cum AS DOUBLE) * n1_cum / n0_cum, 6) END AS qini
        |FROM w ORDER BY score DESC""".stripMargin) { (s, dir) =>
      val u = Tables.load(s, dir, "events")
        .groupBy("user_id")
        .agg(count(lit(1)).as("cnt"),
          max(when(col("event_type") === "purchase", 1).otherwise(0)).as("o"))
        .select(col("cnt"),
          when(col("user_id") % 2 === 0, 1).otherwise(0).as("e"), col("o"))
      val c = u.groupBy("cnt").agg(count(lit(1)).as("nu"),
        sum(col("e")).cast("long").as("n1"),
        sum(col("e") * col("o")).cast("long").as("k1"),
        sum(lit(1) - col("e")).cast("long").as("n0"),
        sum((lit(1) - col("e")) * col("o")).cast("long").as("k0"))
      val win = Window.orderBy(col("cnt").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      c.select(col("cnt").as("score"),
          sum(col("nu")).over(win).cast("long").as("n_cum"),
          sum(col("n1")).over(win).cast("long").as("n1_cum"),
          sum(col("n0")).over(win).cast("long").as("n0_cum"),
          sum(col("k1")).over(win).cast("long").as("k1_cum"),
          sum(col("k0")).over(win).cast("long").as("k0_cum"))
        .select(col("score"), col("n_cum"), col("n1_cum"), col("n0_cum"),
          col("k1_cum"), col("k0_cum"),
          when(col("n0_cum") > 0,
            round(col("k1_cum").cast("double")
              - col("k0_cum").cast("double") * col("n1_cum") / col("n0_cum"), 6))
            .as("qini"))
        .orderBy(col("score").desc)
    },

    // SHAPLEY ATTRIBUTION — the cooperative-game sibling of
    // markov_attribution (removal effect) and last_touch (position
    // rule): the exact Shapley value of each touch channel under the
    // coalition game v(S) = observed conversion rate of users whose
    // exact touched-channel set is S (0 for unobserved cohorts — the
    // standard empirical convention, documented; with 4 channels all
    // 16 cohorts are populated at any realistic scale). One scan
    // reduces the corpus to the 16-row (mask → users, conversions)
    // census; the 4·8 marginal terms |S|!·(3−|S|)!/4!·(v(S∪i)−v(S))
    // are exact-factorial doubles quantized to 9 dp before the
    // decimal sum. Efficiency (Σφ = v(full) − v(∅)) is pinned in
    // AttributionSpec.
    Q("shapley_attribution", {
      val vals = Channels.zipWithIndex
        .map { case (c, i) => s"('$c', ${1 << i})" }.mkString(", ")
      s"""WITH u AS (SELECT user_id,
         |    CAST(${Channels.zipWithIndex.map { case (c, i) =>
               s"${1 << i} * MAX(CASE WHEN event_type = '$c' THEN 1 ELSE 0 END)"
             }.mkString("\n       + ")} AS INTEGER) AS mask,
         |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS o
         |  FROM events GROUP BY 1),
         |cen AS (SELECT mask, COUNT(*) AS n, CAST(SUM(o) AS BIGINT) AS conv
         |        FROM u GROUP BY 1),
         |v AS (SELECT CAST(t.m AS INTEGER) AS m,
         |    COALESCE(CAST(cen.conv AS DOUBLE) / cen.n, 0.0) AS v
         |  FROM range(0, 16) t(m) LEFT JOIN cen ON t.m = cen.mask),
         |ch AS (SELECT * FROM (VALUES $vals) AS c(channel, bit)),
         |terms AS (SELECT ch.channel,
         |    CAST(round(CAST(factorial(bit_count(s.m)) AS DOUBLE)
         |      * CAST(factorial(3 - bit_count(s.m)) AS DOUBLE) / 24.0
         |      * (w.v - s.v), 9) AS DECIMAL(12,9)) AS t
         |  FROM ch JOIN v s ON (s.m & ch.bit) = 0
         |          JOIN v w ON w.m = (s.m | ch.bit)),
         |nu AS (SELECT ch.channel,
         |    CAST(COALESCE(SUM(CASE WHEN (cen.mask & ch.bit) > 0 THEN cen.n END), 0)
         |      AS BIGINT) AS n_users
         |  FROM ch, cen GROUP BY 1)
         |SELECT t.channel, nu.n_users,
         |  round(CAST(SUM(t.t) AS DOUBLE), 6) AS phi
         |FROM terms t JOIN nu ON t.channel = nu.channel
         |GROUP BY 1, 2 ORDER BY t.channel""".stripMargin
    }) { (s, dir) =>
      import s.implicits._
      val maskExpr = Channels.zipWithIndex.map { case (c, i) =>
        lit(1 << i) * max(when(col("event_type") === c, 1).otherwise(0))
      }.reduce(_ + _)
      val u = Tables.load(s, dir, "events")
        .groupBy("user_id")
        .agg(maskExpr.cast("int").as("mask"),
          max(when(col("event_type") === "purchase", 1).otherwise(0)).as("o"))
      val cen = u.groupBy("mask")
        .agg(count(lit(1)).as("n"), sum(col("o")).cast("long").as("conv"))
        .localCheckpoint(true) // <=16-row census feeds v and nu
      val v = s.range(0, 16).select(col("id").cast("int").as("m"))
        .join(cen, col("m") === col("mask"), "left")
        .select(col("m"),
          coalesce(col("conv").cast("double") / col("n"), lit(0.0)).as("v"))
        .localCheckpoint(true) // 16 rows, self-joined below
      val ch = Channels.zipWithIndex
        .map { case (c, i) => (c, 1 << i) }.toDF("channel", "bit")
      val terms = ch
        .join(v.as("s"), col("s.m").bitwiseAND(col("bit")) === 0)
        .join(v.as("w"), col("w.m") === col("s.m").bitwiseOR(col("bit")))
        .select(col("channel"),
          round(factorial(bit_count(col("s.m"))).cast("double")
              * factorial(lit(3) - bit_count(col("s.m"))).cast("double") / 24.0
              * (col("w.v") - col("s.v")), 9)
            .cast(DecimalType(12, 9)).as("t"))
      val nu = ch.join(cen, col("mask").bitwiseAND(col("bit")) > 0, "left")
        .groupBy("channel")
        .agg(coalesce(sum(col("n")), lit(0L)).cast("long").as("n_users"))
      terms.groupBy("channel")
        .agg(round(sum(col("t")).cast("double"), 6).as("phi"))
        .join(nu, "channel")
        .select(col("channel"), col("n_users"), col("phi"))
        .orderBy("channel")
    }
  )
}
