package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.functions.PortableHash.duckH32

/** Statistical inference over corpus/stream censuses — the hypothesis
  * tests and robust estimators an analyst runs on the monitoring
  * censuses the engine already produces: rank-sum shift detection
  * (the nonparametric sibling of ks_drift), contingency independence,
  * exact-lag autocorrelation, CUSUM changepoint location, Poisson-
  * bootstrap confidence intervals (THE distributed bootstrap — per-row
  * multiplicities are independent hash-derived Poisson(1) draws, so
  * resampling fuses into one scan), and Theil–Sen robust trend.
  *
  * Scale shape: every query is one corpus scan down to a census
  * (lengths, hourly sums, contingency cells, resample moments); all
  * pair/rank machinery runs on the census, whose size is bounded by
  * the time span or value grid, not the corpus. Determinism: the
  * suite's standard contract — exact integer/decimal sums everywhere,
  * one identically-written double expression at the end, 6 dp.
  */
object StatQueries {

  /** DuckDB hourly cent census (all types): `(hour, c)` exact cents. */
  private def duckCents(extra: String) =
    s"""h AS (SELECT ${extra}date_trunc('hour', ts) AS hour,
       |    CAST(SUM(CAST(value AS DECIMAL(12,2)) * 100) AS BIGINT) AS c
       |  FROM events GROUP BY ${if (extra.isEmpty) "1" else "1, 2"})""".stripMargin

  private def sparkCents(s: org.apache.spark.sql.SparkSession, dir: String,
                         extra: Seq[String]) =
    Tables.load(s, dir, "events")
      .groupBy((extra.map(col) :+ date_trunc("hour", col("ts")).as("hour")): _*)
      .agg((sum(col("value").cast(DecimalType(12, 2))).cast(DecimalType(18, 2))
        * 100).cast("long").as("c"))

  // Poisson(1) inverse-CDF thresholds, one Scala-computed literal
  // table for both engines (w capped at 7; P(w>7) ~ 1e-5)
  private val poissonCdf: IndexedSeq[Double] = {
    val e1 = math.exp(-1.0)
    (0 to 6).map { k =>
      e1 * (0 to k).map { j =>
        var f = 1.0; (1 to j).foreach(f *= _); 1.0 / f
      }.sum
    }
  }

  def all: Seq[Q] = Seq(

    // Mann–Whitney rank-sum: is source s's token-length distribution
    // shifted against the rest of the corpus? Doubled average ranks
    // (2·rank is integral even at ties) come from ONE global length
    // census window; per-source rank sums are census joins. The only
    // doubles are the final tie-corrected z expression.
    Q("mann_whitney",
      """WITH d AS (SELECT source, len(string_split(text, ' ')) AS x FROM documents),
        |g AS (SELECT x, COUNT(*) AS nx FROM d GROUP BY 1),
        |r AS (SELECT x, nx,
        |    2 * (SUM(nx) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) - nx) + nx + 1 AS r2
        |  FROM g),
        |sc AS (SELECT source, x, COUNT(*) AS cnt FROM d GROUP BY 1, 2),
        |t AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS n1,
        |    CAST(SUM(cnt * r.r2) AS BIGINT) AS r2sum
        |  FROM sc JOIN r ON sc.x = r.x GROUP BY 1),
        |nn AS (SELECT CAST(SUM(nx) AS BIGINT) AS nt,
        |    CAST(SUM(nx * nx * nx - nx) AS BIGINT) AS ties FROM g)
        |SELECT source, n1, CAST(r2sum - n1 * (n1 + 1) AS BIGINT) AS u2,
        |  CASE WHEN n1 < nt AND nt > 1 THEN
        |    round((CAST(u2 AS DOUBLE) - CAST(n1 * (nt - n1) AS DOUBLE))
        |      / (2.0 * sqrt(CAST(n1 AS DOUBLE) * (nt - n1) / 12.0
        |          * ((nt + 1.0) - CAST(ties AS DOUBLE) / nt / (nt - 1.0)))), 6) END AS z
        |FROM t, nn ORDER BY source""".stripMargin) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
        .select(col("source"), size(split(col("text"), " ")).as("x"))
      val g = d.groupBy("x").agg(count(lit(1)).as("nx"))
      val cum = Window.orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val r = g.select(col("x"),
        (lit(2) * (sum(col("nx")).over(cum) - col("nx")) + col("nx") + 1).as("r2"))
      val sc = d.groupBy("source", "x").agg(count(lit(1)).as("cnt"))
      val t = sc.join(broadcast(r), "x")
        .groupBy("source")
        .agg(sum(col("cnt")).cast("long").as("n1"),
          sum(col("cnt") * col("r2")).cast("long").as("r2sum"))
      val nn = g.agg(sum(col("nx")).cast("long").as("nt"),
        sum(col("nx") * col("nx") * col("nx") - col("nx")).cast("long").as("ties"))
      val u2 = (col("r2sum") - col("n1") * (col("n1") + 1)).cast("long")
      t.crossJoin(broadcast(nn))
        .withColumn("u2", u2)
        .select(col("source"), col("n1"), col("u2"),
          // single-source / single-row corpora have no "rest": NULL z
          // instead of an ANSI divide-by-zero (EdgeCasesSpec sweep)
          when(col("n1") < col("nt") && col("nt") > 1,
            round((col("u2").cast("double")
              - (col("n1") * (col("nt") - col("n1"))).cast("double"))
              / (lit(2.0) * sqrt(col("n1").cast("double") * (col("nt") - col("n1")) / 12.0
                * ((col("nt") + lit(1.0))
                  - col("ties").cast("double") / col("nt") / (col("nt") - lit(1.0))))), 6))
            .as("z"))
        .orderBy("source")
    },

    // chi-square independence audit of the (event_type, hour-of-day)
    // contingency census: per observed cell, the expectation under
    // independence and its chi-square term. Marginals are window sums
    // over the census (cells with zero observations are absent by
    // construction — the census IS the support).
    Q("chi_square_independence",
      """WITH c AS (SELECT event_type, CAST(hour(ts) AS INT) AS hod,
        |    COUNT(*) AS obs FROM events GROUP BY 1, 2),
        |w AS (SELECT event_type, hod, obs,
        |    CAST(SUM(obs) OVER (PARTITION BY event_type) AS BIGINT) AS rt,
        |    CAST(SUM(obs) OVER (PARTITION BY hod) AS BIGINT) AS ct,
        |    CAST(SUM(obs) OVER () AS BIGINT) AS nt FROM c)
        |SELECT event_type, hod, obs,
        |  round(CAST(rt * ct AS DOUBLE) / nt, 6) AS expected,
        |  round((CAST(obs AS DOUBLE) - CAST(rt * ct AS DOUBLE) / nt)
        |      * (CAST(obs AS DOUBLE) - CAST(rt * ct AS DOUBLE) / nt)
        |      / (CAST(rt * ct AS DOUBLE) / nt), 6) AS chi2_term
        |FROM w ORDER BY event_type, hod""".stripMargin) { (s, dir) =>
      val c = Tables.load(s, dir, "events")
        .groupBy(col("event_type"), hour(col("ts")).cast("int").as("hod"))
        .agg(count(lit(1)).as("obs"))
      val all = Window.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      val w = c
        .withColumn("rt", sum(col("obs")).over(
          Window.partitionBy("event_type").rowsBetween(Long.MinValue, Long.MaxValue)).cast("long"))
        .withColumn("ct", sum(col("obs")).over(
          Window.partitionBy("hod").rowsBetween(Long.MinValue, Long.MaxValue)).cast("long"))
        .withColumn("nt", sum(col("obs")).over(all).cast("long"))
      val e = (col("rt") * col("ct")).cast("double") / col("nt")
      val o = col("obs").cast("double")
      w.select(col("event_type"), col("hod"), col("obs"),
          round(e, 6).as("expected"),
          round((o - e) * (o - e) / e, 6).as("chi2_term"))
        .orderBy("event_type", "hod")
    },

    // sample autocorrelation of the hourly total-value series at TRUE
    // hour lags 1..24 (missing hours are genuinely absent, not
    // adjacent): deviations are N-scaled exact integers (c·N − S), the
    // lag pairing is a census self-join on hour-index difference, and
    // acf_k = Σ dev_t·dev_{t-k} / Σ dev² in exact DECIMAL up to one
    // final divide.
    Q("autocorrelation",
      s"""WITH ${duckCents("")},
        |i AS (SELECT epoch_us(hour) // 3600000000 AS t, c FROM h),
        |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS sc FROM i),
        |d AS (SELECT t, CAST(c * s.n - s.sc AS DECIMAL(18,0)) AS dev FROM i CROSS JOIN s),
        |p AS (SELECT CAST(a.t - b.t AS INT) AS k,
        |    CAST(SUM(a.dev * b.dev) AS DECIMAL(38,0)) AS num, COUNT(*) AS n_pairs
        |  FROM d a JOIN d b ON a.t - b.t BETWEEN 1 AND 24 GROUP BY 1),
        |dd AS (SELECT CAST(SUM(dev * dev) AS DECIMAL(38,0)) AS den FROM d)
        |SELECT k, n_pairs,
        |  CASE WHEN den > 0 THEN round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) END AS acf
        |FROM p, dd ORDER BY k""".stripMargin) { (s, dir) =>
      val i = sparkCents(s, dir, Nil)
        .select(expr("unix_micros(hour) div 3600000000L").as("t"), col("c"))
      val sCensus = i.agg(count(lit(1)).cast("long").as("n"),
        sum(col("c")).cast("long").as("sc"))
      val d = i.crossJoin(broadcast(sCensus))
        .select(col("t"),
          (col("c") * col("n") - col("sc")).cast(DecimalType(18, 0)).as("dev"))
        .localCheckpoint(true) // census; feeds both the pairs and the denominator
      val a = d.select(col("t").as("ta"), col("dev").as("deva"))
      val b = d.select(col("t").as("tb"), col("dev").as("devb"))
      val p = a.join(broadcast(b),
          col("ta") - col("tb") >= 1 && col("ta") - col("tb") <= 24)
        .groupBy((col("ta") - col("tb")).cast("int").as("k"))
        .agg(sum(col("deva") * col("devb")).cast(DecimalType(38, 0)).as("num"),
          count(lit(1)).as("n_pairs"))
      val dd = d.agg(sum(col("dev") * col("dev")).cast(DecimalType(38, 0)).as("den"))
      p.crossJoin(broadcast(dd))
        .select(col("k"), col("n_pairs"),
          when(col("den") > 0, // constant series: NULL, not divide-by-zero
            round(col("num").cast("double") / col("den").cast("double"), 6)).as("acf"))
        .orderBy("k")
    },

    // CUSUM changepoint locator per event_type: D_t = N·cumΣc − t·S is
    // the (N-scaled, exact-integer) deviation of the cumulative sum
    // from the no-change linear trend; the changepoint estimate is the
    // hour of max |D| (classic CUSUM argmax), reported with the
    // per-hour average deviation in value units.
    Q("cusum_changepoint",
      s"""WITH ${duckCents("event_type, ")},
        |s AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(c) AS BIGINT) AS sc FROM h GROUP BY 1),
        |w AS (SELECT h.event_type, hour,
        |    CAST(SUM(c) OVER (PARTITION BY h.event_type ORDER BY hour ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY h.event_type ORDER BY hour) AS BIGINT) AS tt,
        |    s.n, s.sc
        |  FROM h JOIN s ON h.event_type = s.event_type),
        |dv AS (SELECT event_type, hour,
        |    CAST(cum * n - tt * sc AS DECIMAL(20,0)) AS dev, n FROM w),
        |rk AS (SELECT event_type, hour, dev, n,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY abs(dev) DESC, hour) AS r
        |  FROM dv)
        |SELECT event_type, hour AS cp_hour,
        |  round(CAST(dev AS DOUBLE) / n / 100.0, 6) AS max_dev
        |FROM rk WHERE r = 1 ORDER BY event_type""".stripMargin) { (s, dir) =>
      val h = sparkCents(s, dir, Seq("event_type"))
      val sc = h.groupBy("event_type")
        .agg(count(lit(1)).cast("long").as("n"), sum(col("c")).cast("long").as("sc"))
      val ord = Window.partitionBy("event_type").orderBy("hour")
      val w = h.join(broadcast(sc), "event_type")
        .withColumn("cum", sum(col("c")).over(
          ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("long"))
        .withColumn("tt", row_number().over(ord).cast("long"))
        .select(col("event_type"), col("hour"),
          (col("cum") * col("n") - col("tt") * col("sc"))
            .cast(DecimalType(20, 0)).as("dev"), col("n"))
      val rk = Window.partitionBy("event_type")
        .orderBy(abs(col("dev")).desc, col("hour"))
      w.withColumn("r", row_number().over(rk))
        .filter(col("r") === 1)
        .select(col("event_type"), col("hour").as("cp_hour"),
          round(col("dev").cast("double") / col("n") / 100.0, 6).as("max_dev"))
        .orderBy("event_type")
    },

    // Poisson-bootstrap 95% CI for the mean token length: resample b
    // draws doc i with multiplicity ~ Poisson(1) via the portable-hash
    // uniform and a literal inverse-CDF ladder — all B=200 resamples
    // fuse into ONE scan (the reason Poisson bootstrap IS the
    // distributed bootstrap: no global n to coordinate). Resample
    // means quantize to micro-units; the CI is nearest-rank order
    // statistics on the 200-row census.
    {
      val B = 200
      def duckLadder(uh: String) =
        poissonCdf.zipWithIndex.map { case (p, k) =>
          s"WHEN $uh < $p THEN $k" }.mkString("CASE ", " ", " ELSE 7 END")
      Q("bootstrap_ci",
        s"""WITH d AS (SELECT doc_id, len(string_split(text, ' ')) AS x FROM documents),
          |dr AS (SELECT doc_id, x, r.b AS b,
          |    CAST(${duckH32("'b|' || r.b || '|' || doc_id")} AS DOUBLE) / 4294967296.0 AS uh
          |  FROM d, range(0, $B) r(b)),
          |w AS (SELECT b, x, ${duckLadder("uh")} AS w FROM dr),
          |m AS (SELECT b,
          |    CAST(floor(CAST(SUM(w * x) AS DOUBLE) / SUM(w) * 1000000.0 + 0.5) AS BIGINT) AS mu
          |  FROM w GROUP BY b HAVING SUM(w) > 0),
          |r AS (SELECT mu, b, ROW_NUMBER() OVER (ORDER BY mu, b) AS rn,
          |    COUNT(*) OVER () AS nb FROM m),
          |sel AS (SELECT MAX(CASE WHEN rn = 5 THEN mu END) AS lo,
          |    MAX(CASE WHEN rn = 195 THEN mu END) AS hi, MAX(nb) AS nb FROM r),
          |fm AS (SELECT round(CAST(SUM(x) AS DOUBLE) / COUNT(*), 6) AS mean_full FROM d)
          |SELECT nb AS n_resamples, mean_full,
          |  round(lo / 1000000.0, 6) AS ci_lo, round(hi / 1000000.0, 6) AS ci_hi
          |FROM sel, fm""".stripMargin) { (s, dir) =>
        val d = Tables.parallelize(
          Tables.load(s, dir, "documents")
            .select(col("doc_id"), size(split(col("text"), " ")).as("x")))
        val uh = conv(substring(md5(
            concat(lit("b|"), col("b").cast("string"), lit("|"),
              col("doc_id").cast("string"))), 1, 8), 16, 10)
          .cast("long").cast("double") / 4294967296.0
        val ladder = poissonCdf.zipWithIndex.foldRight(lit(7): Column) {
          case ((p, k), acc) => when(col("uh") < p, lit(k)).otherwise(acc)
        }
        val m = d.select(col("doc_id"), col("x"),
            explode(sequence(lit(0), lit(B - 1))).as("b"))
          .withColumn("uh", uh)
          .select(col("b"), col("x"), ladder.as("w"))
          .groupBy("b")
          .agg(sum(col("w") * col("x")).as("swx"), sum(col("w")).as("sw"))
          .filter(col("sw") > 0)
          .select(col("b"),
            floor(col("swx").cast("double") / col("sw") * 1000000.0 + 0.5)
              .cast("long").as("mu"))
        val r = m.withColumn("rn",
            row_number().over(Window.orderBy("mu", "b")))
          .withColumn("nb", count(lit(1)).over(
            Window.rowsBetween(Long.MinValue, Long.MaxValue)))
        val sel = r.agg(
          max(when(col("rn") === 5, col("mu"))).as("lo"),
          max(when(col("rn") === 195, col("mu"))).as("hi"),
          max(col("nb")).as("nb"))
        val fm = d.agg(
          round(sum(col("x")).cast("double") / count(lit(1)), 6).as("mean_full"))
        sel.crossJoin(broadcast(fm))
          .select(col("nb").as("n_resamples"), col("mean_full"),
            round(col("lo") / 1000000.0, 6).as("ci_lo"),
            round(col("hi") / 1000000.0, 6).as("ci_hi"))
      }
    },

    // Theil–Sen robust trend per event_type: the (lower) median of all
    // pairwise hourly slopes. The pair set is census², bounded by the
    // TIME SPAN (720 hours → 259k pairs/type) regardless of corpus
    // size; slopes round to 6 dp before ranking so the order statistic
    // is engine-stable. SPAN CEILING: census² crosses 10⁹ pairs near a
    // 45,000-hour (~5-year) span — past that, use theil_sen_sampled
    // below (index-arithmetic pair draws, O(samples) at any span);
    // threshold recorded in SCALE.md, bounded-mass behavior pinned by
    // the ScaleSmoke theil_sen_sampled stage.
    Q("theil_sen",
      s"""WITH ${duckCents("event_type, ")},
        |i AS (SELECT event_type, epoch_us(hour) // 3600000000 AS t, c FROM h),
        |p AS (SELECT a.event_type,
        |    round(CAST(b.c - a.c AS DOUBLE) / ((b.t - a.t) * 100.0), 6) AS slope,
        |    a.t AS t1, b.t AS t2
        |  FROM i a JOIN i b ON a.event_type = b.event_type AND a.t < b.t),
        |r AS (SELECT event_type, slope,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY slope, t1, t2) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS np FROM p)
        |SELECT event_type, np AS n_pairs, slope AS median_slope
        |FROM r WHERE rn = (np + 1) // 2 ORDER BY event_type""".stripMargin) { (s, dir) =>
      // materialize the 3600-row census once: both join arms feed off
      // it instead of re-running the corpus aggregation
      val i = sparkCents(s, dir, Seq("event_type"))
        .select(col("event_type"), expr("unix_micros(hour) div 3600000000L").as("t"),
          col("c"))
        .localCheckpoint(true)
      val a = i.select(col("event_type"), col("t").as("t1"), col("c").as("c1"))
      val b = i.select(col("event_type").as("et2"), col("t").as("t2"), col("c").as("c2"))
      val p = a.join(b, col("event_type") === col("et2") && col("t1") < col("t2"))
        .select(col("event_type"),
          round((col("c2") - col("c1")).cast("double")
            / ((col("t2") - col("t1")) * 100.0), 6).as("slope"),
          col("t1"), col("t2"))
      // r14: distributed order-statistic selection instead of the
      // row_number window. The window hash-partitioned by event_type,
      // so ONE task sorted a type's ENTIRE pair mass (5 tasks on 32
      // cores here; a one-task straggler near the span ceiling, guide
      // §2.5). Here the pair set range-partitions on the FULL sort key
      // (event_type, slope, t1, t2) — every core sorts a slice; equal
      // keys can't straddle a range bound and the key is unique anyway
      // — a per-(partition, type) run census (par × |types| rows) maps
      // each type's median RANK to one frozen row id, and one filter
      // fetches those rows. np per type = the run-census sum, which
      // equals the analytic C(nb, 2) because the join generates every
      // t1 < t2 pair. monotonically_increasing_id is (pid << 33) +
      // local offset; the eager localCheckpoint freezes it, so the
      // global order ((pid, mid) ascending = full-key ascending) is
      // pinned before anything reads it.
      val pC = p.localCheckpoint(true)
      val srt = pC
        .repartitionByRange(s.sparkContext.defaultParallelism,
          col("event_type"), col("slope"), col("t1"), col("t2"))
        .sortWithinPartitions("event_type", "slope", "t1", "t2")
        .withColumn("mid", monotonically_increasing_id())
        .localCheckpoint(true)
      val runs = srt
        .groupBy(expr("shiftright(mid, 33)").as("pid"), col("event_type"))
        .agg(count(lit(1)).as("n"), min(col("mid")).as("lo"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .sortBy { case (pid, _, _, lo) => (pid, lo) }
      val npByType = runs.groupBy(_._2).map { case (t, rs) => t -> rs.map(_._3).sum }
      // walk each type's runs in global order to the (np+1)/2-th row
      val targets: Seq[Long] = npByType.toSeq.flatMap { case (t, np) =>
        val r0 = (np + 1) / 2 // 1-based lower-median rank; 0 when np == 0
        var cum = 0L
        var hit: Option[Long] = None
        runs.iterator.filter(_._2 == t).foreach { case (_, _, n, lo) =>
          if (hit.isEmpty && r0 > cum && r0 <= cum + n)
            hit = Some(lo + (r0 - cum - 1))
          cum += n
        }
        hit
      }
      import s.implicits._
      val np = npByType.toSeq.toDF("event_type", "np")
      srt.filter(col("mid").isin(targets: _*))
        .join(broadcast(np), "event_type")
        .select(col("event_type"), col("np").as("n_pairs"),
          col("slope").as("median_slope"))
        .orderBy("event_type")
    },

    // THEIL–SEN, SAMPLED — the bounded-pair-mass fallback for spans
    // where the exact estimator's census² explodes (720 hours → 259k
    // pairs per type is fine; a multi-year retention window crosses
    // 10⁹ — see SCALE.md). Instead of gating a self-join (which still
    // GENERATES n² rows before filtering), pairs are drawn by INDEX
    // ARITHMETIC: census rows get within-group ranks, 2000 draws per
    // group pick (h32-derived) rank pairs directly, and two equi-joins
    // fetch the endpoints — O(samples) pair mass at ANY span, fully
    // deterministic (hash draws, rank order, draw-index tie-break), so
    // the oracle replays it bit-for-bit. Duplicated draws stay (with-
    // replacement sampling keeps the estimator honest and the count
    // deterministic); same lower-median convention as theil_sen.
    Q("theil_sen_sampled", {
      val ia = duckH32("event_type || '|' || CAST(s AS VARCHAR)")
      val ib = duckH32("event_type || '#' || CAST(s AS VARCHAR)")
      s"""WITH ${duckCents("event_type, ")},
        |i AS (SELECT event_type, epoch_us(hour) // 3600000000 AS t, c FROM h),
        |r AS (SELECT event_type, t, c,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY t) - 1 AS rk FROM i),
        |nb AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nb FROM i GROUP BY 1),
        |s AS (SELECT event_type, s, $ia % nb AS ia, $ib % nb AS ib
        |  FROM nb, unnest(generate_series(0, 1999)) AS g(s)),
        |sp AS (SELECT event_type, s, least(ia, ib) AS lo, greatest(ia, ib) AS hi
        |  FROM s WHERE ia <> ib),
        |p AS (SELECT sp.event_type, sp.s,
        |    round(CAST(b.c - a.c AS DOUBLE) / ((b.t - a.t) * 100.0), 6) AS slope
        |  FROM sp
        |  JOIN r a ON a.event_type = sp.event_type AND a.rk = sp.lo
        |  JOIN r b ON b.event_type = sp.event_type AND b.rk = sp.hi),
        |rr AS (SELECT event_type, slope,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY slope, s) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS np FROM p)
        |SELECT event_type, np AS n_sampled_pairs, slope AS median_slope
        |FROM rr WHERE rn = (np + 1) // 2 ORDER BY event_type""".stripMargin
    }) { (s, dir) =>
      val i = sparkCents(s, dir, Seq("event_type"))
        .select(col("event_type"),
          expr("unix_micros(hour) div 3600000000L").as("t"), col("c"))
        .localCheckpoint(true)
      val p = graft.ops.RobustTrend.sampledSlopes(i, 2000)
      val rr = p
        .withColumn("rn", row_number().over(
          Window.partitionBy("event_type").orderBy("slope", "s")))
        .withColumn("np", count(lit(1)).over(
          Window.partitionBy("event_type").rowsBetween(Long.MinValue, Long.MaxValue)))
      rr.filter(col("rn") === expr("(np + 1) div 2"))
        .select(col("event_type"), col("np").as("n_sampled_pairs"),
          col("slope").as("median_slope"))
        .orderBy("event_type")
    },

    // iterative proportional fitting (raking) of the (source, lang)
    // census to uniform target margins — the survey-statistics
    // reweighting that makes a skewed corpus representable: two full
    // IPF rounds (4 half-steps) unrolled over the census, each scale
    // factor applied as one double expression and the weight
    // re-quantized to DECIMAL(20,6) so every iterate is engine-exact.
    // The census is |sources|x|langs| regardless of corpus size.
    {
      val steps = Seq(("source", "sn"), ("lang", "ln"),
        ("source", "sn"), ("lang", "ln"))
      val duckSteps = steps.zipWithIndex.map { case ((dim, tgt), i) =>
        val pv = if (i == 0) "w0" else s"w${i}"
        s"""w${i + 1} AS (SELECT source, lang, n, sn, ln,
           |    CAST(round(CAST(w AS DOUBLE) * ((CAST(nt AS DOUBLE) / $tgt)
           |        / CAST(SUM(w) OVER (PARTITION BY $dim) AS DOUBLE)), 6) AS DECIMAL(20,6)) AS w,
           |    nt FROM $pv)""".stripMargin
      }.mkString(",\n")
      Q("ipf_raking",
        s"""WITH c AS (SELECT source, lang, COUNT(*) AS n FROM documents GROUP BY 1, 2),
          |m AS (SELECT CAST(SUM(n) AS BIGINT) AS nt,
          |    CAST(COUNT(DISTINCT source) AS BIGINT) AS sn,
          |    CAST(COUNT(DISTINCT lang) AS BIGINT) AS ln FROM c),
          |w0 AS (SELECT source, lang, n, sn, ln,
          |    CAST(n AS DECIMAL(20,6)) AS w, nt FROM c CROSS JOIN m),
          |$duckSteps
          |SELECT source, lang, n, CAST(w AS DOUBLE) AS raked_weight
          |FROM w4 ORDER BY source, lang""".stripMargin) { (s, dir) =>
        val c = Tables.load(s, dir, "documents")
          .groupBy("source", "lang").agg(count(lit(1)).as("n"))
        val m = c.agg(sum(col("n")).cast("long").as("nt"),
          count_distinct(col("source")).cast("long").as("sn"),
          count_distinct(col("lang")).cast("long").as("ln"))
        var w = c.crossJoin(broadcast(m))
          .withColumn("w", col("n").cast(DecimalType(20, 6)))
        steps.foreach { case (dim, tgt) =>
          val part = Window.partitionBy(dim)
            .rowsBetween(Long.MinValue, Long.MaxValue)
          w = w.withColumn("w",
            round(col("w").cast("double") * ((col("nt").cast("double") / col(tgt))
              / sum(col("w")).over(part).cast("double")), 6)
              .cast(DecimalType(20, 6)))
        }
        w.select(col("source"), col("lang"), col("n"),
            col("w").cast("double").as("raked_weight"))
          .orderBy("source", "lang")
      }
    },

    // Hurst exponent by rescaled-range (R/S) analysis of the hourly
    // total series: for block sizes 16/32/64/128, each full block's
    // range-of-cumulative-deviations over its std (both n-scaled
    // exact integers up to one sqrt), block values rounded then
    // decimal-averaged per size, and H = the least-squares slope of
    // ln(R/S) on ln(n) over the four points (H≈0.5 ⇔ no long
    // memory). Census math throughout — blocks partition the
    // |hours| census, never the corpus.
    Q("hurst_exponent",
      s"""WITH ${duckCents("")},
        |i AS (SELECT c, ROW_NUMBER() OVER (ORDER BY hour) AS t FROM h),
        |b AS (SELECT bn.n AS bn, (t - 1) // bn.n AS blk, t, c
        |  FROM i CROSS JOIN (SELECT unnest([16, 32, 64, 128]) AS n) bn),
        |s AS (SELECT bn, blk, c,
        |    CAST(COUNT(*) OVER w AS BIGINT) AS cnt,
        |    CAST(SUM(c) OVER w AS BIGINT) AS sb,
        |    CAST(SUM(CAST(c AS DECIMAL(18,0)) * c) OVER w AS DECIMAL(20,0)) AS qb,
        |    CAST(SUM(c) OVER wc AS BIGINT) AS cum,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY bn, blk ORDER BY t) AS BIGINT) AS k
        |  FROM b
        |  WINDOW w AS (PARTITION BY bn, blk),
        |         wc AS (PARTITION BY bn, blk ORDER BY t ROWS UNBOUNDED PRECEDING)),
        |r AS (SELECT bn, blk,
        |    MAX(cnt * cum - k * sb) - MIN(cnt * cum - k * sb) AS rng,
        |    MAX(CAST(cnt AS DECIMAL(4,0)) * qb
        |      - CAST(sb AS DECIMAL(12,0)) * CAST(sb AS DECIMAL(12,0))) AS varn
        |  FROM s WHERE cnt = bn GROUP BY 1, 2),
        |rs AS (SELECT bn,
        |    CAST(round(CAST(rng AS DOUBLE) / sqrt(CAST(varn AS DOUBLE)), 6) AS DECIMAL(20,6)) AS rs
        |  FROM r WHERE varn > 0),
        |a AS (SELECT bn, COUNT(*) AS n_blocks,
        |    round(CAST(SUM(rs) AS DOUBLE) / COUNT(*), 6) AS avg_rs FROM rs GROUP BY 1),
        |f AS (SELECT bn, n_blocks, avg_rs,
        |    CAST(round(ln(CAST(bn AS DOUBLE)), 6) AS DECIMAL(12,6)) AS xq,
        |    CAST(round(ln(avg_rs), 6) AS DECIMAL(12,6)) AS yq
        |  FROM a WHERE avg_rs > 0),
        |h2 AS (SELECT bn, n_blocks, avg_rs,
        |    CAST(COUNT(*) OVER () AS DECIMAL(4,0)) AS kk,
        |    CAST(SUM(xq) OVER () AS DECIMAL(14,6)) AS sx,
        |    CAST(SUM(yq) OVER () AS DECIMAL(14,6)) AS sy,
        |    CAST(SUM(xq * yq) OVER () AS DECIMAL(20,12)) AS sxy,
        |    CAST(SUM(xq * xq) OVER () AS DECIMAL(20,12)) AS sxx
        |  FROM f)
        |SELECT bn AS block_n, n_blocks, avg_rs,
        |  CASE WHEN kk * sxx - sx * sx > 0 THEN
        |    round(CAST(kk * sxy - sx * sy AS DOUBLE) / CAST(kk * sxx - sx * sx AS DOUBLE), 6)
        |  END AS hurst
        |FROM h2 ORDER BY block_n""".stripMargin) { (s, dir) =>
      val i = sparkCents(s, dir, Nil)
        .withColumn("t", row_number().over(Window.orderBy("hour")))
        .select("t", "c")
      val b = i.crossJoin(broadcast(
          s.range(0, 4).select(expr("shiftleft(16, cast(id as int))").as("bn"))))
        .select(col("bn"), expr("(t - 1) div bn").as("blk"), col("t"), col("c"))
      val wWhole = Window.partitionBy("bn", "blk")
        .rowsBetween(Long.MinValue, Long.MaxValue)
      val wc = Window.partitionBy("bn", "blk").orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val sdf = b
        .withColumn("cnt", count(lit(1)).over(wWhole).cast("long"))
        .withColumn("sb", sum(col("c")).over(wWhole).cast("long"))
        .withColumn("qb", sum(col("c").cast(DecimalType(18, 0)) * col("c"))
          .over(wWhole).cast(DecimalType(20, 0)))
        .withColumn("cum", sum(col("c")).over(wc).cast("long"))
        .withColumn("k", row_number().over(
          Window.partitionBy("bn", "blk").orderBy("t")).cast("long"))
      val dev = col("cnt") * col("cum") - col("k") * col("sb")
      val r = sdf.filter(col("cnt") === col("bn"))
        .groupBy("bn", "blk")
        .agg((max(dev) - min(dev)).as("rng"),
          max(col("cnt").cast(DecimalType(4, 0)) * col("qb")
            - col("sb").cast(DecimalType(12, 0)) * col("sb").cast(DecimalType(12, 0)))
            .as("varn"))
      val rs = r.filter(col("varn") > 0)
        .select(col("bn"),
          round(col("rng").cast("double") / sqrt(col("varn").cast("double")), 6)
            .cast(DecimalType(20, 6)).as("rs"))
      val a = rs.groupBy("bn")
        .agg(count(lit(1)).as("n_blocks"),
          round(sum(col("rs")).cast("double") / count(lit(1)), 6).as("avg_rs"))
      // order-free slope: decimal-quantized (x, y) cross-multiplied
      // sums — a double AVG/SUM over the 4-point frame would depend
      // on frame traversal order in the last bits
      val f = a.filter(col("avg_rs") > 0)
        .withColumn("xq",
          round(log(col("bn").cast("double")), 6).cast(DecimalType(12, 6)))
        .withColumn("yq", round(log(col("avg_rs")), 6).cast(DecimalType(12, 6)))
      val whole = Window.rowsBetween(Long.MinValue, Long.MaxValue)
      val h2 = f
        .withColumn("kk", count(lit(1)).over(whole).cast(DecimalType(4, 0)))
        .withColumn("sx", sum(col("xq")).over(whole).cast(DecimalType(14, 6)))
        .withColumn("sy", sum(col("yq")).over(whole).cast(DecimalType(14, 6)))
        .withColumn("sxy", sum(col("xq") * col("yq")).over(whole).cast(DecimalType(20, 12)))
        .withColumn("sxx", sum(col("xq") * col("xq")).over(whole).cast(DecimalType(20, 12)))
      h2.select(col("bn").as("block_n"), col("n_blocks"), col("avg_rs"),
          when(col("kk") * col("sxx") - col("sx") * col("sx") > 0,
            round((col("kk") * col("sxy") - col("sx") * col("sy")).cast("double")
              / (col("kk") * col("sxx") - col("sx") * col("sx")).cast("double"), 6))
            .as("hurst"))
        .orderBy("block_n")
    },

    // Welch's t (unequal variances) per source vs the rest of the
    // corpus — the parametric sibling of mann_whitney on the same
    // length census: sample variances come from exact (n, Σx, Σx²)
    // moments, and t plus the Welch–Satterthwaite df are single
    // double expressions. |t| and z (rank-sum) disagreeing flags
    // non-normality — which is why both ship.
    Q("ttest_welch",
      """WITH d AS (SELECT source, len(string_split(text, ' ')) AS x FROM documents),
        |g AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n1,
        |    CAST(SUM(x) AS BIGINT) AS s1, CAST(SUM(x * x) AS BIGINT) AS q1
        |  FROM d GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n1) AS BIGINT) AS nt, CAST(SUM(s1) AS BIGINT) AS st,
        |    CAST(SUM(q1) AS BIGINT) AS qt FROM g),
        |w AS (SELECT source, n1, s1, q1, nt - n1 AS n2, st - s1 AS s2, qt - q1 AS q2
        |  FROM g CROSS JOIN tot),
        |v AS (SELECT source, n1, n2,
        |    CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2 AS md,
        |    (CAST(n1 AS DOUBLE) * q1 - CAST(s1 AS DOUBLE) * s1) / (CAST(n1 AS DOUBLE) * (n1 - 1) * n1) AS vn1,
        |    (CAST(n2 AS DOUBLE) * q2 - CAST(s2 AS DOUBLE) * s2) / (CAST(n2 AS DOUBLE) * (n2 - 1) * n2) AS vn2
        |  FROM w)
        |SELECT source, n1 AS n,
        |  CASE WHEN n1 > 1 AND n2 > 1 THEN round(md / sqrt(vn1 + vn2), 6) END AS t,
        |  CASE WHEN n1 > 1 AND n2 > 1 THEN round((vn1 + vn2) * (vn1 + vn2)
        |    / (vn1 * vn1 / (n1 - 1) + vn2 * vn2 / (n2 - 1)), 6) END AS df
        |FROM v ORDER BY source""".stripMargin) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
        .select(col("source"), size(split(col("text"), " ")).as("x"))
      val g = d.groupBy("source")
        .agg(count(lit(1)).cast("long").as("n1"),
          sum(col("x")).cast("long").as("s1"),
          sum(col("x") * col("x")).cast("long").as("q1"))
      val tot = g.agg(sum(col("n1")).cast("long").as("nt"),
        sum(col("s1")).cast("long").as("st"), sum(col("q1")).cast("long").as("qt"))
      val w = g.crossJoin(broadcast(tot))
        .select(col("source"), col("n1"), col("s1"), col("q1"),
          (col("nt") - col("n1")).as("n2"), (col("st") - col("s1")).as("s2"),
          (col("qt") - col("q1")).as("q2"))
      // degenerate corpora (single source, n<=1 samples) yield NULL
      // stats instead of ANSI divide-by-zero (EdgeCasesSpec sweep)
      val md = when(col("n1") > 0 && col("n2") > 0,
        col("s1").cast("double") / col("n1") - col("s2").cast("double") / col("n2"))
      val vn1 = when(col("n1") > 1,
        (col("n1").cast("double") * col("q1") - col("s1").cast("double") * col("s1")) /
          (col("n1").cast("double") * (col("n1") - 1) * col("n1")))
      val vn2 = when(col("n2") > 1,
        (col("n2").cast("double") * col("q2") - col("s2").cast("double") * col("s2")) /
          (col("n2").cast("double") * (col("n2") - 1) * col("n2")))
      val ok = col("n1") > 1 && col("n2") > 1
      w.select(col("source"), col("n1"), col("n2"),
          md.as("md"), vn1.as("vn1"), vn2.as("vn2"))
        .select(col("source"), col("n1").as("n"),
          when(ok, round(col("md") / sqrt(col("vn1") + col("vn2")), 6)).as("t"),
          when(ok, round((col("vn1") + col("vn2")) * (col("vn1") + col("vn2"))
            / (col("vn1") * col("vn1") / (col("n1") - 1)
              + col("vn2") * col("vn2") / (col("n2") - 1)), 6)).as("df"))
        .orderBy("source")
    },

    // modified-z outlier days by median absolute deviation: two
    // rank-window passes over the |days| census (median, then MAD)
    // replace any corpus sort; the 0.6745·dev/MAD score and the 3.5
    // flag are the Iglewicz–Hoaglin convention. Robust where
    // rolling_anomaly's mean/σ window is not (a single wild day
    // inflates σ and masks neighbors; the median pair shrugs).
    Q("mad_outliers",
      """WITH d AS (SELECT epoch_us(date_trunc('day', ts)) // 86400000000 AS day,
        |    CAST(SUM(CAST(value AS DECIMAL(12,2)) * 100) AS BIGINT) AS c
        |  FROM events GROUP BY 1),
        |r AS (SELECT day, c, ROW_NUMBER() OVER (ORDER BY c, day) AS rn,
        |    COUNT(*) OVER () AS nd FROM d),
        |med AS (SELECT MAX(CASE WHEN rn = (nd + 1) // 2 THEN c END) AS m FROM r),
        |dev AS (SELECT day, c, abs(c - med.m) AS ad, med.m AS m FROM r CROSS JOIN med),
        |r2 AS (SELECT day, c, ad, m, ROW_NUMBER() OVER (ORDER BY ad, day) AS rn,
        |    COUNT(*) OVER () AS nd FROM dev),
        |mad AS (SELECT MAX(CASE WHEN rn = (nd + 1) // 2 THEN ad END) AS mad FROM r2)
        |SELECT day, round(c / 100.0, 6) AS total,
        |  CASE WHEN mad.mad > 0
        |    THEN round(0.6745 * (CAST(c AS DOUBLE) - m) / mad.mad, 6) END AS mz,
        |  CASE WHEN mad.mad > 0 AND abs(0.6745 * (CAST(c AS DOUBLE) - m) / mad.mad) > 3.5
        |    THEN TRUE ELSE FALSE END AS is_outlier
        |FROM r2 CROSS JOIN mad ORDER BY day""".stripMargin) { (s, dir) =>
      val d = Tables.load(s, dir, "events")
        .groupBy(expr("unix_micros(date_trunc('day', ts)) div 86400000000L").as("day"))
        .agg((sum(col("value").cast(DecimalType(12, 2))).cast(DecimalType(18, 2))
          * 100).cast("long").as("c"))
      val r = d
        .withColumn("rn", row_number().over(Window.orderBy("c", "day")))
        .withColumn("nd", count(lit(1)).over(
          Window.rowsBetween(Long.MinValue, Long.MaxValue)))
      val med = r.agg(max(when(col("rn") === expr("(nd + 1) div 2"), col("c"))).as("m"))
      val dev = r.select(col("day"), col("c")).crossJoin(broadcast(med))
        .withColumn("ad", abs(col("c") - col("m")))
      val r2 = dev
        .withColumn("rn", row_number().over(Window.orderBy("ad", "day")))
        .withColumn("nd", count(lit(1)).over(
          Window.rowsBetween(Long.MinValue, Long.MaxValue)))
      val mad = r2.agg(max(when(col("rn") === expr("(nd + 1) div 2"), col("ad"))).as("mad"))
      val mz = lit(0.6745) * (col("c").cast("double") - col("m")) / col("mad")
      r2.crossJoin(broadcast(mad))
        .select(col("day"), round(col("c") / 100.0, 6).as("total"),
          when(col("mad") > 0, round(mz, 6)).as("mz"),
          when(col("mad") > 0 && abs(mz) > 3.5, true).otherwise(false)
            .as("is_outlier"))
        .orderBy("day")
    },

    // binary-segmentation changepoint per event_type: the best single
    // split of the hourly series minimizes SSE_left + SSE_right, and
    // cumulative (Σc, Σc²) windows price EVERY split in one census
    // pass (decision_stump's trick applied to time). Reported as the
    // variance-reduction gain vs the unsplit series — the model-fit
    // counterpart of cusum_changepoint's cumsum argmax.
    Q("binseg_changepoint",
      s"""WITH ${duckCents("event_type, ")},
        |i AS (SELECT event_type, hour, c FROM h),
        |w AS (SELECT event_type, hour, c,
        |    CAST(SUM(c) OVER win AS BIGINT) AS sk,
        |    CAST(SUM(CAST(c AS DECIMAL(18,0)) * c) OVER win AS DECIMAL(20,0)) AS qk,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hour) AS BIGINT) AS k,
        |    CAST(SUM(c) OVER wt AS BIGINT) AS sn,
        |    CAST(SUM(CAST(c AS DECIMAL(18,0)) * c) OVER wt AS DECIMAL(20,0)) AS qn,
        |    CAST(COUNT(*) OVER wt AS BIGINT) AS n
        |  FROM i
        |  WINDOW win AS (PARTITION BY event_type ORDER BY hour ROWS UNBOUNDED PRECEDING),
        |         wt AS (PARTITION BY event_type)),
        |g AS (SELECT event_type, hour, k, n,
        |    (CAST(qn AS DOUBLE) - CAST(sn AS DOUBLE) * sn / n)
        |      - ((CAST(qk AS DOUBLE) - CAST(sk AS DOUBLE) * sk / k)
        |        + (CAST(qn - qk AS DOUBLE) - CAST(sn - sk AS DOUBLE) * (sn - sk) / (n - k))) AS gain
        |  FROM w WHERE k < n),
        |rk AS (SELECT event_type, hour, gain,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY gain DESC, hour) AS r
        |  FROM g)
        |SELECT event_type, hour AS split_hour, round(gain / 10000.0, 6) AS gain
        |FROM rk WHERE r = 1 ORDER BY event_type""".stripMargin) { (s, dir) =>
      val i = sparkCents(s, dir, Seq("event_type"))
      val win = Window.partitionBy("event_type").orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wt = Window.partitionBy("event_type")
        .rowsBetween(Long.MinValue, Long.MaxValue)
      val ord = Window.partitionBy("event_type").orderBy("hour")
      val w = i
        .withColumn("sk", sum(col("c")).over(win).cast("long"))
        .withColumn("qk", sum((col("c").cast(DecimalType(18, 0)) * col("c")))
          .over(win).cast(DecimalType(20, 0)))
        .withColumn("k", row_number().over(ord).cast("long"))
        .withColumn("sn", sum(col("c")).over(wt).cast("long"))
        .withColumn("qn", sum((col("c").cast(DecimalType(18, 0)) * col("c")))
          .over(wt).cast(DecimalType(20, 0)))
        .withColumn("n", count(lit(1)).over(wt).cast("long"))
      val sst = col("qn").cast("double") - col("sn").cast("double") * col("sn") / col("n")
      val sseL = col("qk").cast("double") - col("sk").cast("double") * col("sk") / col("k")
      val sseR = (col("qn") - col("qk")).cast("double") -
        (col("sn") - col("sk")).cast("double") * (col("sn") - col("sk")) / (col("n") - col("k"))
      val g = w.filter(col("k") < col("n"))
        .select(col("event_type"), col("hour"),
          (sst - (sseL + sseR)).as("gain"))
      val rk = Window.partitionBy("event_type").orderBy(col("gain").desc, col("hour"))
      g.withColumn("r", row_number().over(rk))
        .filter(col("r") === 1)
        .select(col("event_type"), col("hour").as("split_hour"),
          round(col("gain") / 10000.0, 6).as("gain"))
        .orderBy("event_type")
    },

    // GROUP-SEQUENTIAL SPRT: Wald's sequential probability ratio test
    // on the daily conversion stream (unit = active user-day,
    // outcome = converted that day), H0 p=0.30 vs H1 p=0.40 at
    // alpha = beta = 0.05. The log-likelihood ratio is NOT a running
    // double sum: LLR_t = K_t·ln(p1/p0) + (N_t-K_t)·ln(q1/q0) is
    // recomputed each day from the exact cumulative integers times
    // Scala-computed literal constants (identical parses in both
    // engines), so the trajectory and every boundary decision are
    // engine-exact. Output: the day-by-day monitoring table with the
    // boundary state and whether a decision has been reached.
    Q("sprt_boundary", {
      val (p0, p1) = (0.30, 0.40)
      val la = math.log(p1 / p0)
      val lb = math.log((1 - p1) / (1 - p0))
      val up = math.log(0.95 / 0.05)
      val lo = math.log(0.05 / 0.95)
      s"""WITH u AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, user_id,
         |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS o
         |  FROM events GROUP BY 1, 2),
         |d AS (SELECT day, COUNT(*) AS n, CAST(SUM(o) AS BIGINT) AS k FROM u GROUP BY 1),
         |c AS (SELECT day,
         |    CAST(SUM(n) OVER w AS BIGINT) AS n_cum,
         |    CAST(SUM(k) OVER w AS BIGINT) AS k_cum
         |  FROM d WINDOW w AS (ORDER BY day ROWS UNBOUNDED PRECEDING)),
         |l AS (SELECT day, n_cum, k_cum,
         |    k_cum * CAST($la AS DOUBLE) + (n_cum - k_cum) * CAST($lb AS DOUBLE) AS llr FROM c),
         |s AS (SELECT day, n_cum, k_cum, llr,
         |    CASE WHEN llr >= CAST($up AS DOUBLE) THEN 'accept_h1'
         |         WHEN llr <= CAST($lo AS DOUBLE) THEN 'accept_h0'
         |         ELSE 'continue' END AS state FROM l)
         |SELECT day, n_cum, k_cum, round(llr, 6) AS llr, state,
         |  MAX(CASE WHEN state <> 'continue' THEN 1 ELSE 0 END)
         |    OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) = 1 AS decided
         |FROM s ORDER BY day""".stripMargin
    }) { (s, dir) =>
      val (p0, p1) = (0.30, 0.40)
      val la = math.log(p1 / p0)
      val lb = math.log((1 - p1) / (1 - p0))
      val up = math.log(0.95 / 0.05)
      val lo = math.log(0.05 / 0.95)
      val u = Tables.load(s, dir, "events")
        .groupBy(date_trunc("day", col("ts")).as("day"), col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1).otherwise(0)).as("o"))
      val d = u.groupBy("day")
        .agg(count(lit(1)).as("n"), sum(col("o")).cast("long").as("k"))
      val w = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val llr = col("k_cum") * lit(la) + (col("n_cum") - col("k_cum")) * lit(lb)
      d.select(col("day"),
          sum(col("n")).over(w).cast("long").as("n_cum"),
          sum(col("k")).over(w).cast("long").as("k_cum"))
        .withColumn("llr", llr)
        .withColumn("state",
          when(col("llr") >= up, "accept_h1")
            .when(col("llr") <= lo, "accept_h0")
            .otherwise("continue"))
        .select(col("day"), col("n_cum"), col("k_cum"),
          round(col("llr"), 6).as("llr"), col("state"),
          (max(when(col("state") =!= "continue", 1).otherwise(0)).over(w)
            === 1).as("decided"))
        .orderBy("day")
    },

    // JARQUE-BERA NORMALITY — the moment-based test the residual
    // diagnostics were missing: are the hourly revenue totals
    // compatible with a normal distribution (skewness 0, excess
    // kurtosis 0)? The raw moments come from EXACT integer deviations
    // about the FLOORED integer mean mb = Σc div n (both engines
    // floor identically on the non-negative operands): r = c − mb is
    // corpus-volume-bounded but — unlike the n-scaled dev = n·c − Σc
    // of autocorrelation — carries NO wasted n-power, so the bound is
    // provable: |r| < 10^8 (the DECIMAL(8,0) narrowing is wrapped in
    // loudCast, so an hourly total deviating by more than $1M in
    // cents raises at the cause in BOTH engines — DuckDB's ANSI cast
    // throws; Spark's non-ANSI cast would have NULLed silently) gives
    // Σr⁴ ≤ n·10^32, inside DECIMAL(38,0) for any series up to 10^6
    // hours (a century). The fractional mean offset
    // δ = (Σc mod n)/n ∈ [0,1) is corrected exactly in the one-row
    // census: m_k about the true mean follows from the binomial shift
    // (m2 = M2/n − δ², m3 = M3/n − 3δM2/n + 2δ³, m4 = M4/n − 4δM3/n +
    // 6δ²M2/n − 3δ⁴), a fixed double expression written with
    // identical association in both engines, so skew/kurt still agree
    // bit-for-bit. JB is computed FROM the 6-dp-rounded skew/kurt,
    // and the 2-dof survival is closed-form exp(−JB/2). Constant
    // series: NULL.
    Q("jarque_bera",
      s"""WITH ${duckCents("")},
        |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS sc FROM h),
        |b AS (SELECT n, sc, sc // n AS mb, sc - n * (sc // n) AS rem FROM s),
        |d AS (SELECT CAST(c - b.mb AS DECIMAL(8,0)) AS r, n, rem FROM h CROSS JOIN b),
        |m AS (SELECT n, rem,
        |    CAST(SUM(r * r) AS DECIMAL(38,0)) AS m2r,
        |    CAST(SUM(CAST(r * r AS DECIMAL(19,0)) * r) AS DECIMAL(38,0)) AS m3r,
        |    CAST(SUM(CAST(r * r AS DECIMAL(19,0)) * CAST(r * r AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS m4r
        |  FROM d GROUP BY n, rem),
        |c2 AS (SELECT n,
        |    CAST(rem AS DOUBLE) / n AS del,
        |    CAST(m2r AS DOUBLE) / n AS a2,
        |    CAST(m3r AS DOUBLE) / n AS a3,
        |    CAST(m4r AS DOUBLE) / n AS a4
        |  FROM m),
        |cm AS (SELECT n,
        |    a2 - del * del AS m2,
        |    a3 - 3.0 * del * a2 + 2.0 * del * del * del AS m3,
        |    a4 - 4.0 * del * a3 + 6.0 * (del * del) * a2
        |      - 3.0 * ((del * del) * (del * del)) AS m4
        |  FROM c2),
        |sk AS (SELECT n,
        |    CASE WHEN m2 > 0 THEN round(m3 / sqrt(m2 * m2 * m2), 6) END AS skewness,
        |    CASE WHEN m2 > 0 THEN round(m4 / (m2 * m2) - 3.0, 6) END AS kurtosis_excess
        |  FROM cm),
        |jb AS (SELECT n, skewness, kurtosis_excess,
        |    CASE WHEN skewness IS NOT NULL THEN round(n / 6.0
        |      * (skewness * skewness + kurtosis_excess * kurtosis_excess / 4.0), 6)
        |    END AS jb_stat FROM sk)
        |SELECT n, skewness, kurtosis_excess, jb_stat,
        |  CASE WHEN jb_stat IS NOT NULL THEN round(exp(-jb_stat / 2.0), 6) END AS p
        |FROM jb""".stripMargin) { (s, dir) =>
      val i = sparkCents(s, dir, Nil)
      val sCensus = i.agg(count(lit(1)).cast("long").as("n"),
        sum(col("c")).cast("long").as("sc"))
        .select(col("n"), expr("sc div n").as("mb"),
          (col("sc") - col("n") * expr("sc div n")).as("rem"))
      val d = i.crossJoin(broadcast(sCensus))
        .select(loudCast(col("c") - col("mb"), DecimalType(8, 0),
            "jarque_bera hourly deviation r").as("r"),
          col("n"), col("rem"))
      val r2 = (col("r") * col("r")).cast(DecimalType(19, 0))
      val m = d.groupBy("n", "rem").agg(
        sum(col("r") * col("r")).cast(DecimalType(38, 0)).as("m2r"),
        sum(r2 * col("r")).cast(DecimalType(38, 0)).as("m3r"),
        sum(r2 * r2).cast(DecimalType(38, 0)).as("m4r"))
      val c2 = m.select(col("n"),
        (col("rem").cast("double") / col("n")).as("del"),
        (col("m2r").cast("double") / col("n")).as("a2"),
        (col("m3r").cast("double") / col("n")).as("a3"),
        (col("m4r").cast("double") / col("n")).as("a4"))
      val cm = c2.select(col("n"),
        (col("a2") - col("del") * col("del")).as("m2"),
        (col("a3") - lit(3.0) * col("del") * col("a2")
          + lit(2.0) * col("del") * col("del") * col("del")).as("m3"),
        (col("a4") - lit(4.0) * col("del") * col("a3")
          + lit(6.0) * (col("del") * col("del")) * col("a2")
          - lit(3.0) * ((col("del") * col("del"))
            * (col("del") * col("del")))).as("m4"))
      val sk = cm.select(col("n"),
        when(col("m2") > 0,
          round(col("m3") / sqrt(col("m2") * col("m2") * col("m2")), 6))
          .as("skewness"),
        when(col("m2") > 0,
          round(col("m4") / (col("m2") * col("m2")) - lit(3.0), 6))
          .as("kurtosis_excess"))
      val jb = sk.select(col("n"), col("skewness"), col("kurtosis_excess"),
        when(col("skewness").isNotNull, round(col("n") / lit(6.0)
          * (col("skewness") * col("skewness")
            + col("kurtosis_excess") * col("kurtosis_excess") / lit(4.0)), 6))
          .as("jb_stat"))
      jb.select(col("n"), col("skewness"), col("kurtosis_excess"),
        col("jb_stat"),
        when(col("jb_stat").isNotNull,
          round(exp(-col("jb_stat") / lit(2.0)), 6)).as("p"))
    },

    // DURBIN-WATSON — first-order serial correlation of the hourly
    // revenue series (the regression-residual diagnostic, here on the
    // mean-removed series): DW = Σ(devₜ − devₜ₋₁)² / Σdevₜ² with the
    // same exact N-scaled integer deviations as autocorrelation (the
    // n² factors cancel). Consecutive hours pair by an equi-join on
    // the hour index — no corpus-wide ordered window. DW ≈ 2(1−ρ₁):
    // both reported. Constant series: NULL.
    Q("durbin_watson",
      s"""WITH ${duckCents("")},
        |i AS (SELECT epoch_us(hour) // 3600000000 AS t, c FROM h),
        |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS sc FROM i),
        |d AS (SELECT t, CAST(c * s.n - s.sc AS DECIMAL(18,0)) AS dev FROM i CROSS JOIN s),
        |num AS (SELECT CAST(SUM((a.dev - b.dev) * (a.dev - b.dev)) AS DECIMAL(38,0)) AS nu,
        |    CAST(COUNT(*) AS BIGINT) AS n_pairs
        |  FROM d a JOIN d b ON a.t = b.t + 1),
        |den AS (SELECT CAST(SUM(dev * dev) AS DECIMAL(38,0)) AS de FROM d)
        |SELECT s.n, n_pairs,
        |  CASE WHEN de > 0 THEN round(CAST(nu AS DOUBLE) / CAST(de AS DOUBLE), 6) END AS dw,
        |  CASE WHEN de > 0 THEN round(1.0 - (CAST(nu AS DOUBLE) / CAST(de AS DOUBLE)) / 2.0, 6) END AS rho1_approx
        |FROM num, den, s""".stripMargin) { (s, dir) =>
      val i = sparkCents(s, dir, Nil)
        .select(expr("unix_micros(hour) div 3600000000L").as("t"), col("c"))
      val sCensus = i.agg(count(lit(1)).cast("long").as("n"),
        sum(col("c")).cast("long").as("sc"))
      val d = i.crossJoin(broadcast(sCensus))
        .select(col("t"),
          (col("c") * col("n") - col("sc")).cast(DecimalType(18, 0)).as("dev"))
        .localCheckpoint(true) // census; feeds the pair join and both sums
      val a = d.toDF("ta", "deva")
      val b = d.toDF("tb", "devb")
      val num = a.join(b, col("ta") === col("tb") + 1)
        .agg(sum((col("deva") - col("devb")) * (col("deva") - col("devb")))
          .cast(DecimalType(38, 0)).as("nu"),
          count(lit(1)).cast("long").as("n_pairs"))
      val den = d.agg(sum(col("dev") * col("dev"))
        .cast(DecimalType(38, 0)).as("de"))
      val dw = col("nu").cast("double") / col("de").cast("double")
      num.crossJoin(den).crossJoin(broadcast(sCensus.select("n")))
        .select(col("n"), col("n_pairs"),
          when(col("de") > 0, round(dw, 6)).as("dw"),
          when(col("de") > 0, round(lit(1.0) - dw / lit(2.0), 6))
            .as("rho1_approx"))
    }
  )
}
