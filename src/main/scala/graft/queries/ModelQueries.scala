package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** In-dataflow model fitting and evaluation — the closed-form /
  * rank-statistic learners that reduce to moment censuses, so training
  * IS one corpus scan: exact ROC AUC for the quality scorer (the
  * rank-sum identity — AUC needs no threshold sweep), ordinary least
  * squares by Cramer's rule on the exact moment census (the
  * distributed closed form; MLlib's normal-equation solver computes
  * the same Gramian), the Markov-chain entropy rate of the event
  * stream, and an information-gain decision stump over document
  * quality features.
  *
  * Determinism: counts/moments are exact integers with widths chosen
  * for 38-digit products; logarithm terms follow the suite convention
  * (round(ln(x), 6) per term, summed in DECIMAL(20,6)); every final
  * double is one identically-written expression.
  */
object ModelQueries {

  def all: Seq[Q] = Seq(

    // exact ROC AUC via the rank-sum identity AUC = U/(n1·n0): ONE
    // global rank pass over the score census replaces the usual
    // threshold sweep, and tie handling (doubled average ranks) is
    // exact where a swept ROC needs interpolation. Complements
    // quality_pr_curve (same scorer, same label) with the
    // threshold-free summary.
    Q("roc_auc",
      s"""WITH ${EvalQueries.duckScoreLabel},
        |gg AS (SELECT score_u, COUNT(*) AS nx, SUM(label) AS npos FROM sl GROUP BY 1),
        |r AS (SELECT score_u, npos,
        |    2 * (SUM(nx) OVER (ORDER BY score_u ROWS UNBOUNDED PRECEDING) - nx) + nx + 1 AS r2
        |  FROM gg),
        |t AS (SELECT CAST(SUM(npos * r2) AS BIGINT) AS r2pos,
        |    CAST(SUM(npos) AS BIGINT) AS n1 FROM r),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM sl)
        |SELECT n1 AS n_pos, CAST(nt - n1 AS BIGINT) AS n_neg,
        |  CASE WHEN n1 > 0 AND n1 < nt THEN
        |    round((CAST(r2pos - n1 * (n1 + 1) AS DOUBLE) / 2.0)
        |      / (CAST(n1 AS DOUBLE) * (nt - n1)), 6) END AS auc,
        |  CASE WHEN n1 > 0 AND n1 < nt THEN
        |    round((CAST(r2pos - n1 * (n1 + 1) AS DOUBLE) / 2.0)
        |      / (CAST(n1 AS DOUBLE) * (nt - n1)) * 2.0 - 1.0, 6) END AS gini
        |FROM t, n""".stripMargin) { (s, dir) =>
      val sl = EvalQueries.scoreLabelOf(Tables.parallelize(
        Tables.load(s, dir, "documents").select("doc_id", "text")))
      val g = sl.groupBy("score_u")
        .agg(count(lit(1)).as("nx"), sum(col("label")).as("npos"))
      val cum = Window.orderBy("score_u")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val r = g.select(col("npos"),
        (lit(2) * (sum(col("nx")).over(cum) - col("nx")) + col("nx") + 1).as("r2"))
      val t = r.agg(sum(col("npos") * col("r2")).cast("long").as("r2pos"),
        sum(col("npos")).cast("long").as("n1"))
      val n = sl.agg(count(lit(1)).cast("long").as("nt"))
      val aucExpr = ((col("r2pos") - col("n1") * (col("n1") + 1)).cast("double") / 2.0) /
        (col("n1").cast("double") * (col("nt") - col("n1")))
      // single-class corpora have no ranking to score: NULL AUC
      // instead of an ANSI divide-by-zero (EdgeCasesSpec sweep)
      val ok = col("n1") > 0 && col("n1") < col("nt")
      t.crossJoin(broadcast(n))
        .select(col("n1").as("n_pos"),
          (col("nt") - col("n1")).cast("long").as("n_neg"),
          when(ok, round(aucExpr, 6)).as("auc"),
          when(ok, round(aucExpr * 2.0 - 1.0, 6)).as("gini"))
    },

    // distributed OLS in closed form: regress the hourly cent sum on
    // [1, t, hod] (t = hours since the first bucket). ONE scan reduces
    // to the 10-moment census; the normal equations solve by Cramer's
    // rule in EXACT integer/decimal arithmetic — the only doubles are
    // the final beta divisions and the R² expression. Moment widths
    // are bounded by what each actually sums: the t/hod moments are
    // SPAN-bounded (stt ≤ span³ fits DECIMAL(12,0) through a ~10⁴-hour
    // span) and stay at 12 digits, while the y-moments grow with
    // corpus VOLUME and get DECIMAL(20,0) (sty = Σt·y holds hourly
    // cents up to ~10¹³ over a 720-hour span; the narrowing is
    // loudCast-wrapped so an overflow raises in BOTH engines instead
    // of silently NULLing on the Spark side) and syy DECIMAL(30,0)
    // (also loudCast-wrapped); the determinant inner products
    // carry DECIMAL(30,0) so det0's worst case (~10³⁰ at those
    // ceilings) keeps DECIMAL(38,0) headroom.
    Q("ols_cramer",
      """WITH h AS (SELECT date_trunc('hour', ts) AS hour,
        |    CAST(SUM(CAST(value AS DECIMAL(12,2)) * 100) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |i0 AS (SELECT epoch_us(hour) // 3600000000 AS th,
        |    CAST(hour(hour) AS BIGINT) AS hod, y FROM h),
        |mn AS (SELECT MIN(th) AS t0 FROM i0),
        |i AS (SELECT th - mn.t0 AS t, hod, y FROM i0 CROSS JOIN mn),
        |m AS (SELECT CAST(COUNT(*) AS DECIMAL(12,0)) AS n,
        |    CAST(SUM(t) AS DECIMAL(12,0)) AS st,
        |    CAST(SUM(hod) AS DECIMAL(12,0)) AS sh,
        |    CAST(SUM(t * t) AS DECIMAL(12,0)) AS stt,
        |    CAST(SUM(t * hod) AS DECIMAL(12,0)) AS sth,
        |    CAST(SUM(hod * hod) AS DECIMAL(12,0)) AS shh,
        |    CAST(SUM(y) AS DECIMAL(20,0)) AS sy,
        |    CAST(SUM(CAST(t AS DECIMAL(18,0)) * y) AS DECIMAL(20,0)) AS sty,
        |    CAST(SUM(CAST(hod AS DECIMAL(18,0)) * y) AS DECIMAL(20,0)) AS shy,
        |    CAST(SUM(CAST(y AS DECIMAL(18,0)) * y) AS DECIMAL(30,0)) AS syy
        |  FROM i),
        |d AS (SELECT n, sy, sty, shy, syy,
        |    n*CAST(stt*shh - sth*sth AS DECIMAL(30,0)) - st*CAST(st*shh - sth*sh AS DECIMAL(30,0)) + sh*CAST(st*sth - stt*sh AS DECIMAL(30,0)) AS det,
        |    sy*CAST(stt*shh - sth*sth AS DECIMAL(30,0)) - st*CAST(sty*shh - sth*shy AS DECIMAL(30,0)) + sh*CAST(sty*sth - stt*shy AS DECIMAL(30,0)) AS det0,
        |    n*CAST(sty*shh - shy*sth AS DECIMAL(30,0)) - sy*CAST(st*shh - sth*sh AS DECIMAL(30,0)) + sh*CAST(st*shy - sty*sh AS DECIMAL(30,0)) AS det1,
        |    n*CAST(stt*shy - sth*sty AS DECIMAL(30,0)) - st*CAST(st*shy - sty*sh AS DECIMAL(30,0)) + sy*CAST(st*sth - stt*sh AS DECIMAL(30,0)) AS det2
        |  FROM m)
        |SELECT CAST(n AS BIGINT) AS n,
        |  CASE WHEN det <> 0 THEN round(CAST(det0 AS DOUBLE) / CAST(det AS DOUBLE) / 100.0, 6) END AS beta0,
        |  CASE WHEN det <> 0 THEN round(CAST(det1 AS DOUBLE) / CAST(det AS DOUBLE) / 100.0, 6) END AS beta1,
        |  CASE WHEN det <> 0 THEN round(CAST(det2 AS DOUBLE) / CAST(det AS DOUBLE) / 100.0, 6) END AS beta2,
        |  CASE WHEN det <> 0 AND CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) > 0 THEN
        |    round(1.0 - (CAST(syy AS DOUBLE)
        |      - (CAST(det0 AS DOUBLE) / CAST(det AS DOUBLE) * CAST(sy AS DOUBLE)
        |        + CAST(det1 AS DOUBLE) / CAST(det AS DOUBLE) * CAST(sty AS DOUBLE)
        |        + CAST(det2 AS DOUBLE) / CAST(det AS DOUBLE) * CAST(shy AS DOUBLE)))
        |    / (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)), 6) END AS r2
        |FROM d""".stripMargin) { (s, dir) =>
      val h = Tables.load(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour"))
        .agg((sum(col("value").cast(DecimalType(12, 2))).cast(DecimalType(18, 2))
          * 100).cast("long").as("y"))
      val i0 = h.select(expr("unix_micros(hour) div 3600000000L").as("th"),
        hour(col("hour")).cast("long").as("hod"), col("y"))
      val mn = i0.agg(min(col("th")).as("t0"))
      val i = i0.crossJoin(broadcast(mn))
        .select((col("th") - col("t0")).as("t"), col("hod"), col("y"))
      // loud narrowing (see package.loudCast): these widths are the
      // documented ceilings — blowing one must raise in BOTH engines,
      // not silently NULL the moment on the Spark side
      def dec(c: org.apache.spark.sql.Column) =
        loudCast(c, DecimalType(12, 0), "ols_cramer span moment")
      def dec20(c: org.apache.spark.sql.Column) =
        loudCast(c, DecimalType(20, 0), "ols_cramer y-moment")
      val m = i.agg(
        dec(count(lit(1))).as("n"), dec(sum(col("t"))).as("st"),
        dec(sum(col("hod"))).as("sh"), dec(sum(col("t") * col("t"))).as("stt"),
        dec(sum(col("t") * col("hod"))).as("sth"),
        dec(sum(col("hod") * col("hod"))).as("shh"),
        dec20(sum(col("y"))).as("sy"),
        dec20(sum(col("t").cast(DecimalType(18, 0)) * col("y"))).as("sty"),
        dec20(sum(col("hod").cast(DecimalType(18, 0)) * col("y"))).as("shy"),
        loudCast(sum(col("y").cast(DecimalType(18, 0)) * col("y")),
          DecimalType(30, 0), "ols_cramer syy").as("syy"))
      val (nC, st, sh, stt, sth, shh, sy, sty, shy) =
        (col("n"), col("st"), col("sh"), col("stt"), col("sth"),
          col("shh"), col("sy"), col("sty"), col("shy"))
      val d = m.select(nC, sy, sty, shy, col("syy"),
        (nC * (stt * shh - sth * sth) - st * (st * shh - sth * sh)
          + sh * (st * sth - stt * sh)).as("det"),
        (sy * (stt * shh - sth * sth) - st * (sty * shh - sth * shy)
          + sh * (sty * sth - stt * shy)).as("det0"),
        (nC * (sty * shh - shy * sth) - sy * (st * shh - sth * sh)
          + sh * (st * shy - sty * sh)).as("det1"),
        (nC * (stt * shy - sth * sty) - st * (st * shy - sty * sh)
          + sy * (st * sth - stt * sh)).as("det2"))
      val det = col("det").cast("double")
      val b0 = col("det0").cast("double") / det
      val b1 = col("det1").cast("double") / det
      val b2 = col("det2").cast("double") / det
      val syyD = col("syy").cast("double")
      val syD = col("sy").cast("double")
      // collinear features / constant response: NULL instead of an
      // ANSI divide-by-zero (EdgeCasesSpec sweep)
      val okDet = col("det") =!= 0
      val sst = syyD - syD * syD / col("n").cast("double")
      d.select(col("n").cast("long").as("n"),
        when(okDet, round(b0 / 100.0, 6)).as("beta0"),
        when(okDet, round(b1 / 100.0, 6)).as("beta1"),
        when(okDet, round(b2 / 100.0, 6)).as("beta2"),
        when(okDet && sst > 0,
          round(lit(1.0) - (syyD - (b0 * syD + b1 * col("sty").cast("double")
            + b2 * col("shy").cast("double"))) / sst, 6)).as("r2"))
    },

    // Markov-chain entropy rate of the per-user event stream: H =
    // -Σ_ij (n_ij/N)·ln(n_ij/n_i) over the transition census (the
    // empirical from-state weights π_i p_ij collapse to n_ij/N). The
    // per-cell log terms follow the suite's rounded-log convention so
    // the Σ is exact; one final divide-by-N. Complements
    // markov_transitions (same census) with the sequence-predictability
    // scalar a monitoring stack alerts on.
    Q("markov_entropy_rate",
      """WITH o AS (
        |  SELECT event_type AS next_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |  FROM events),
        |t AS (SELECT prev_type, next_type, COUNT(*) AS n FROM o
        |      WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        |w AS (SELECT prev_type, next_type, n,
        |    CAST(SUM(n) OVER (PARTITION BY prev_type) AS BIGINT) AS ni,
        |    CAST(SUM(n) OVER () AS BIGINT) AS nt FROM t)
        |SELECT CAST(MAX(nt) AS BIGINT) AS n_transitions, COUNT(*) AS n_cells,
        |  round(-CAST(SUM(n * CAST(round(ln(CAST(n AS DOUBLE) / ni), 6) AS DECIMAL(20,6))) AS DOUBLE)
        |    / MAX(nt), 6) AS entropy_rate
        |FROM w""".stripMargin) { (s, dir) =>
      val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val t = Tables.load(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("next_type"))
        .withColumn("prev_type", lag(col("next_type"), 1).over(byUser))
        .filter(col("prev_type").isNotNull)
        .groupBy("prev_type", "next_type").agg(count(lit(1)).as("n"))
      val w = t
        .withColumn("ni", sum(col("n")).over(
          Window.partitionBy("prev_type").rowsBetween(Long.MinValue, Long.MaxValue))
          .cast("long"))
        .withColumn("nt", sum(col("n")).over(
          Window.rowsBetween(Long.MinValue, Long.MaxValue)).cast("long"))
      w.agg(max(col("nt")).cast("long").as("n_transitions"),
        count(lit(1)).as("n_cells"),
        round(-sum(col("n") * round(log(col("n").cast("double") / col("ni")), 6)
          .cast(DecimalType(20, 6))).cast("double") / max(col("nt")), 6)
          .as("entropy_rate"))
    },

    // information-gain decision stump over three document quality
    // features (token count, type-token %, stopword %) against the
    // rule label: every distinct feature value is a candidate
    // threshold, cumulative pos/neg window sums price each split in
    // one pass over the VALUE census, and the best split per feature
    // is an argmax window. Entropies are single double expressions of
    // exact counts (no cross-row double sums), so ranking is
    // engine-stable.
    Q("decision_stump",
      s"""WITH ${EvalQueries.duckScoreLabel},
        |f0 AS (SELECT doc_id, len(string_split(text, ' ')) AS n_toks,
        |    len(list_distinct(string_split(text, ' '))) AS n_types,
        |    len(list_filter(string_split(text, ' '), x -> x = 'the' OR x = 'a')) AS n_stop
        |  FROM documents),
        |fv AS (SELECT sl.doc_id, sl.label, u.feature, u.v
        |  FROM sl JOIN f0 ON sl.doc_id = f0.doc_id,
        |  LATERAL (SELECT unnest(['n_toks', 'ttr_pct', 'stop_pct']) AS feature,
        |           unnest([f0.n_toks,
        |                   CAST(floor(100.0 * f0.n_types / f0.n_toks) AS BIGINT),
        |                   CAST(floor(100.0 * f0.n_stop / f0.n_toks) AS BIGINT)]) AS v) u),
        |gv AS (SELECT feature, v, COUNT(*) AS nx, CAST(SUM(label) AS BIGINT) AS npos
        |  FROM fv GROUP BY 1, 2),
        |c AS (SELECT feature, v,
        |    CAST(SUM(nx) OVER wf AS BIGINT) AS nl,
        |    CAST(SUM(npos) OVER wf AS BIGINT) AS pl,
        |    CAST(SUM(nx) OVER wt AS BIGINT) AS n,
        |    CAST(SUM(npos) OVER wt AS BIGINT) AS p
        |  FROM gv
        |  WINDOW wf AS (PARTITION BY feature ORDER BY v ROWS UNBOUNDED PRECEDING),
        |         wt AS (PARTITION BY feature)),
        |ig AS (SELECT feature, v AS threshold, nl AS n_left, n - nl AS n_right,
        |    round(
        |      (CASE WHEN p = 0 OR p = n THEN 0.0 ELSE
        |        -(CAST(p AS DOUBLE)/n)*ln(CAST(p AS DOUBLE)/n)
        |        -(CAST(n-p AS DOUBLE)/n)*ln(CAST(n-p AS DOUBLE)/n) END)
        |      - (CAST(nl AS DOUBLE)/n) * (CASE WHEN pl = 0 OR pl = nl THEN 0.0 ELSE
        |        -(CAST(pl AS DOUBLE)/nl)*ln(CAST(pl AS DOUBLE)/nl)
        |        -(CAST(nl-pl AS DOUBLE)/nl)*ln(CAST(nl-pl AS DOUBLE)/nl) END)
        |      - (CAST(n-nl AS DOUBLE)/n) * (CASE WHEN p-pl = 0 OR p-pl = n-nl THEN 0.0 ELSE
        |        -(CAST(p-pl AS DOUBLE)/(n-nl))*ln(CAST(p-pl AS DOUBLE)/(n-nl))
        |        -(CAST((n-nl)-(p-pl) AS DOUBLE)/(n-nl))*ln(CAST((n-nl)-(p-pl) AS DOUBLE)/(n-nl)) END)
        |    , 6) AS ig
        |  FROM c WHERE nl < n),
        |rk AS (SELECT feature, threshold, n_left, n_right, ig,
        |    ROW_NUMBER() OVER (PARTITION BY feature ORDER BY ig DESC, threshold) AS r
        |  FROM ig)
        |SELECT feature, threshold, n_left, n_right, ig
        |FROM rk WHERE r = 1 ORDER BY feature""".stripMargin) { (s, dir) =>
      val docs = Tables.parallelize(
        Tables.load(s, dir, "documents").select("doc_id", "text"))
      val sl = EvalQueries.scoreLabelOf(docs).select("doc_id", "label")
      val a = split(col("text"), " ")
      val f0 = docs.select(col("doc_id"),
        size(a).cast("long").as("n_toks"),
        size(array_distinct(a)).cast("long").as("n_types"),
        size(filter(a, x => x === "the" || x === "a")).cast("long").as("n_stop"))
      val fv = sl.join(f0, "doc_id")
        .select(col("label"), explode(array(
          struct(lit("n_toks").as("feature"), col("n_toks").as("v")),
          struct(lit("ttr_pct").as("feature"),
            floor(lit(100.0) * col("n_types") / col("n_toks")).cast("long").as("v")),
          struct(lit("stop_pct").as("feature"),
            floor(lit(100.0) * col("n_stop") / col("n_toks")).cast("long").as("v"))))
          .as("u"))
        .select(col("label"), col("u.feature"), col("u.v"))
      val g = fv.groupBy("feature", "v")
        .agg(count(lit(1)).as("nx"), sum(col("label")).cast("long").as("npos"))
      val wf = Window.partitionBy("feature").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wt = Window.partitionBy("feature")
        .rowsBetween(Long.MinValue, Long.MaxValue)
      val c = g.select(col("feature"), col("v"),
        sum(col("nx")).over(wf).cast("long").as("nl"),
        sum(col("npos")).over(wf).cast("long").as("pl"),
        sum(col("nx")).over(wt).cast("long").as("n"),
        sum(col("npos")).over(wt).cast("long").as("p"))
      def ent(pos: org.apache.spark.sql.Column, tot: org.apache.spark.sql.Column) =
        when(pos === 0 || pos === tot, 0.0).otherwise(
          -(pos.cast("double") / tot) * log(pos.cast("double") / tot)
            - ((tot - pos).cast("double") / tot) * log((tot - pos).cast("double") / tot))
      val nr = col("n") - col("nl")
      val pr = col("p") - col("pl")
      val ig = c.filter(col("nl") < col("n"))
        .select(col("feature"), col("v").as("threshold"),
          col("nl").as("n_left"), nr.as("n_right"),
          round(ent(col("p"), col("n"))
            - (col("nl").cast("double") / col("n")) * ent(col("pl"), col("nl"))
            - (nr.cast("double") / col("n")) * ent(pr, nr), 6).as("ig"))
      val rk = Window.partitionBy("feature").orderBy(col("ig").desc, col("threshold"))
      ig.withColumn("r", row_number().over(rk))
        .filter(col("r") === 1)
        .select(col("feature"), col("threshold"), col("n_left"), col("n_right"),
          col("ig"))
        .orderBy("feature")
    }
  )
}
