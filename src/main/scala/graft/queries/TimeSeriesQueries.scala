package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Time-series monitoring over the `events` stream table — the ops
  * layer a team points at a pipeline's throughput/value series once
  * the pipeline itself is trusted: rolling-window anomaly scoring,
  * seasonal (hour-of-day) decomposition, and exponentially-weighted
  * smoothing.
  *
  * Reference grounding: the reference's processed topic is exactly such
  * an event stream (`/root/reference/src/main/java/ru/kafka/
  * KafkaStreamApp.java:25-33` consumes/produces record streams); these
  * are the monitoring queries run beside such a topic's sink.
  *
  * Scale shape shared by all three: ONE corpus scan reduces the events
  * table to an hourly (event_type, hour) census — partial aggregation
  * is map-side, the exchange carries only census rows (~720 h × ~5
  * types regardless of corpus size) — and every window/smoothing pass
  * runs on the census. At 100 TB the scan dominates and parallelizes
  * by input split; nothing downstream grows with the corpus.
  *
  * Determinism contract: all sums in DECIMAL with explicit widths so
  * products stay inside precision 38 in BOTH engines (exact, order-
  * free); every double is derived from exact decimals by the same
  * written expression and rounded to 6 dp.
  */
object TimeSeriesQueries {

  /** Shared hourly census, DuckDB side: `h(event_type, hour, n_events,
    * v)` with v = exact DECIMAL(18,2) hourly value sum. */
  private[queries] val duckHourly: String =
    """h AS (SELECT event_type, date_trunc('hour', ts) AS hour,
      |    COUNT(*) AS n_events,
      |    CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS v
      |  FROM events GROUP BY 1, 2)""".stripMargin

  /** Shared hourly census, Spark side (bit-identical to [[duckHourly]]
    * by the Tables.load µs-truncation contract). */
  private[queries] def hourly(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.load(s, dir, "events")
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(12, 2)))
          .cast(DecimalType(18, 2)).as("v"))

  // EWMA weights: dyadic 2^(K-1-k) for lag k — EXACTLY representable
  // integers, so the truncated exponential smoothing is exact integer/
  // decimal arithmetic in both engines (a float alpha^k ladder would
  // accumulate engine-order-dependent rounding).
  private val EwmaK = 12
  private val ewmaWeights: Seq[Long] =
    (0 until EwmaK).map(k => 1L << (EwmaK - 1 - k))

  def all: Seq[Q] = Seq(

    // 24-hour rolling z-score anomaly flag per event_type's hourly
    // value sum. Rolling mean/std come from exact decimal (Σv, Σv²)
    // window sums:  z = (n·v − Σv) / sqrt(n·Σv² − (Σv)²)  — numerator
    // and radicand are exact decimals, the final divide/sqrt is the
    // same double expression in both engines. Flags need a FULL
    // 24-bucket window (no warmup flapping) and positive variance.
    Q("rolling_anomaly",
      s"""WITH $duckHourly,
        |w AS (SELECT event_type, hour, n_events, v,
        |    COUNT(*) OVER win AS n_w,
        |    CAST(SUM(v) OVER win AS DECIMAL(18,2)) AS sv,
        |    CAST(SUM(CAST(v * v AS DECIMAL(37,4))) OVER win AS DECIMAL(20,4)) AS svv
        |  FROM h
        |  WINDOW win AS (PARTITION BY event_type ORDER BY hour
        |                 ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)),
        |z AS (SELECT event_type, hour, n_events, CAST(v AS DOUBLE) AS v,
        |    CASE WHEN n_w >= 24
        |          AND CAST(n_w AS DECIMAL(3,0)) * svv - CAST(sv * sv AS DECIMAL(37,4)) > 0
        |      THEN round(CAST(CAST(n_w AS DECIMAL(3,0)) * v - sv AS DOUBLE)
        |           / sqrt(CAST(CAST(n_w AS DECIMAL(3,0)) * svv - CAST(sv * sv AS DECIMAL(37,4)) AS DOUBLE)), 6)
        |      END AS z
        |  FROM w)
        |SELECT event_type, hour, n_events, v, z,
        |  CASE WHEN z IS NOT NULL AND abs(z) > 3.0 THEN TRUE ELSE FALSE END AS is_anomaly
        |FROM z ORDER BY event_type, hour""".stripMargin) { (s, dir) =>
      val win = Window.partitionBy("event_type").orderBy("hour")
        .rowsBetween(-23, 0)
      val w = hourly(s, dir)
        .withColumn("n_w", count(lit(1)).over(win))
        .withColumn("sv", sum(col("v")).over(win).cast(DecimalType(18, 2)))
        .withColumn("svv",
          sum((col("v") * col("v")).cast(DecimalType(37, 4))).over(win)
            .cast(DecimalType(20, 4)))
      val nDec = col("n_w").cast(DecimalType(3, 0))
      val radicand = nDec * col("svv") -
        (col("sv") * col("sv")).cast(DecimalType(37, 4))
      val z = when(col("n_w") >= 24 && radicand > 0,
        round((nDec * col("v") - col("sv")).cast("double") /
          sqrt(radicand.cast("double")), 6))
      w.select(col("event_type"), col("hour"), col("n_events"),
          col("v").cast("double").as("v"), z.as("z"),
          when(z.isNotNull && abs(z) > 3.0, true).otherwise(false)
            .as("is_anomaly"))
        .orderBy("event_type", "hour")
    },

    // hour-of-day seasonal profile per event_type: per-bucket mean and
    // the seasonal index (bucket mean / overall mean), both as one
    // double expression over exact decimal census sums — the ratio is
    // computed cross-multiplied (sv·Σn vs n·Σv) so no intermediate
    // division ever leaves exact arithmetic.
    Q("seasonal_decompose",
      """WITH s AS (SELECT event_type, CAST(hour(ts) AS INT) AS hod,
        |    COUNT(*) AS n_events,
        |    CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS sv
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT event_type, hod, n_events, sv,
        |    CAST(SUM(n_events) OVER (PARTITION BY event_type) AS DECIMAL(10,0)) AS tc,
        |    CAST(SUM(sv) OVER (PARTITION BY event_type) AS DECIMAL(18,2)) AS tsv
        |  FROM s)
        |SELECT event_type, hod, n_events,
        |  CAST(sv AS DOUBLE) AS sum_value,
        |  round(CAST(sv AS DOUBLE) / n_events, 6) AS avg_value,
        |  CASE WHEN tsv > 0
        |    THEN round(CAST(sv * tc AS DOUBLE) / CAST(CAST(n_events AS DECIMAL(10,0)) * tsv AS DOUBLE), 6)
        |    END AS seasonal_index
        |FROM t ORDER BY event_type, hod""".stripMargin) { (s, dir) =>
      val census = Tables.load(s, dir, "events")
        .groupBy(col("event_type"), hour(col("ts")).cast("int").as("hod"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast(DecimalType(12, 2)))
            .cast(DecimalType(18, 2)).as("sv"))
      val whole = Window.partitionBy("event_type")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      census
        .withColumn("tc", sum(col("n_events")).over(whole).cast(DecimalType(10, 0)))
        .withColumn("tsv", sum(col("sv")).over(whole).cast(DecimalType(18, 2)))
        .select(col("event_type"), col("hod"), col("n_events"),
          col("sv").cast("double").as("sum_value"),
          round(col("sv").cast("double") / col("n_events"), 6).as("avg_value"),
          when(col("tsv") > 0,
            round((col("sv") * col("tc")).cast("double") /
              (col("n_events").cast(DecimalType(10, 0)) * col("tsv")).cast("double"), 6))
            .as("seasonal_index"))
        .orderBy("event_type", "hod")
    },

    // truncated EWMA over each event_type's hourly sums with DYADIC
    // weights 2^(K-1-k), k = 0 (current) .. K-1: numerator and the
    // available-weight denominator are exact (integer weight × decimal
    // lag), warmup rows renormalize over the lags that exist, and the
    // single final divide is the only double op. The unrolled-lag form
    // is generated from ONE Scala weight list for both engines, so the
    // two sides cannot drift.
    {
      val duckNum = ewmaWeights.zipWithIndex.map { case (w, k) =>
        s"COALESCE(CAST(lag(v, $k) OVER win * $w AS DECIMAL(24,2)), CAST(0 AS DECIMAL(24,2)))"
      }.mkString(" + ")
      val duckDen = ewmaWeights.zipWithIndex.map { case (w, k) =>
        s"CASE WHEN lag(v, $k) OVER win IS NOT NULL THEN $w ELSE 0 END"
      }.mkString(" + ")
      Q("ewma_trend",
        s"""WITH $duckHourly,
          |w AS (SELECT event_type, hour, v,
          |    CAST($duckNum AS DECIMAL(30,2)) AS num,
          |    CAST($duckDen AS BIGINT) AS den
          |  FROM h
          |  WINDOW win AS (PARTITION BY event_type ORDER BY hour))
          |SELECT event_type, hour, CAST(v AS DOUBLE) AS v,
          |  round(CAST(num AS DOUBLE) / den, 6) AS ewma
          |FROM w ORDER BY event_type, hour""".stripMargin) { (s, dir) =>
        val win = Window.partitionBy("event_type").orderBy("hour")
        val num = ewmaWeights.zipWithIndex.map { case (w, k) =>
          coalesce((lag(col("v"), k).over(win) * lit(w)).cast(DecimalType(24, 2)),
            lit(0).cast(DecimalType(24, 2)))
        }.reduce(_ + _).cast(DecimalType(30, 2))
        val den = ewmaWeights.zipWithIndex.map { case (w, k) =>
          when(lag(col("v"), k).over(win).isNotNull, lit(w)).otherwise(lit(0L))
        }.reduce(_ + _).cast("long")
        hourly(s, dir)
          .select(col("event_type"), col("hour"), col("v"),
            num.as("num"), den.as("den"))
          .select(col("event_type"), col("hour"),
            col("v").cast("double").as("v"),
            round(col("num").cast("double") / col("den"), 6).as("ewma"))
          .orderBy("event_type", "hour")
      }
    },

    // Kaplan–Meier survival over user lifetimes: lifetime = days from
    // first to last event; a user whose last event precedes the
    // observation horizon minus 1 day is a churn EVENT, later ones
    // are right-censored (the standard end-of-window censoring rule).
    // n-at-risk is a reverse cumulative window over the lifetime
    // census, and the product-limit estimator runs as exp(Σ rounded
    // logs) — the suite's decimal-log convention — so the curve is
    // engine-exact; a (rare) d = n_risk step pins survival to 0 via
    // the cumulative dead flag instead of ln(0).
    Q("kaplan_meier",
      """WITH u AS (SELECT user_id, MIN(epoch_us(ts)) AS first_us,
        |    MAX(epoch_us(ts)) AS last_us FROM events GROUP BY 1),
        |g AS (SELECT MAX(last_us) AS gmax FROM u),
        |l AS (SELECT user_id, (last_us - first_us) // 86400000000 AS lt,
        |    CASE WHEN last_us < g.gmax - 86400000000 THEN 1 ELSE 0 END AS death
        |  FROM u CROSS JOIN g),
        |c AS (SELECT lt, COUNT(*) AS nu, CAST(SUM(death) AS BIGINT) AS d FROM l GROUP BY 1),
        |w AS (SELECT lt, nu, d, nu - d AS censored,
        |    CAST(SUM(nu) OVER (ORDER BY lt ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk
        |  FROM c),
        |t AS (SELECT lt, d, censored, n_risk,
        |    CAST(SUM(CASE WHEN d > 0 AND d < n_risk
        |        THEN CAST(round(ln(1.0 - CAST(d AS DOUBLE) / n_risk), 6) AS DECIMAL(20,6))
        |        ELSE CAST(0 AS DECIMAL(20,6)) END)
        |      OVER (ORDER BY lt ROWS UNBOUNDED PRECEDING) AS DECIMAL(20,6)) AS cumlog,
        |    MAX(CASE WHEN d >= n_risk THEN 1 ELSE 0 END)
        |      OVER (ORDER BY lt ROWS UNBOUNDED PRECEDING) AS dead
        |  FROM w)
        |SELECT lt AS lifetime_days, n_risk, d AS n_events, censored AS n_censored,
        |  CASE WHEN dead = 1 THEN 0.0 ELSE round(exp(CAST(cumlog AS DOUBLE)), 6) END AS survival
        |FROM t ORDER BY lifetime_days""".stripMargin) { (s, dir) =>
      val u = Tables.load(s, dir, "events")
        .groupBy("user_id")
        .agg(min(unix_micros(col("ts"))).as("first_us"),
          max(unix_micros(col("ts"))).as("last_us"))
      val g = u.agg(max(col("last_us")).as("gmax"))
      val l = u.crossJoin(broadcast(g))
        .select(expr("(last_us - first_us) div 86400000000L").as("lt"),
          when(col("last_us") < col("gmax") - lit(86400000000L), 1)
            .otherwise(0).as("death"))
      val c = l.groupBy("lt")
        .agg(count(lit(1)).as("nu"), sum(col("death")).cast("long").as("d"))
      val fwd = Window.orderBy("lt")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val back = Window.orderBy("lt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val w = c.select(col("lt"), col("nu"), col("d"),
        (col("nu") - col("d")).as("censored"),
        sum(col("nu")).over(fwd).cast("long").as("n_risk"))
      val logTerm = when(col("d") > 0 && col("d") < col("n_risk"),
        round(log(lit(1.0) - col("d").cast("double") / col("n_risk")), 6)
          .cast(DecimalType(20, 6)))
        .otherwise(lit(0).cast(DecimalType(20, 6)))
      val t = w.select(col("lt"), col("d"), col("censored"), col("n_risk"),
        sum(logTerm).over(back).cast(DecimalType(20, 6)).as("cumlog"),
        max(when(col("d") >= col("n_risk"), 1).otherwise(0)).over(back).as("dead"))
      t.select(col("lt").as("lifetime_days"), col("n_risk"),
          col("d").as("n_events"), col("censored").as("n_censored"),
          when(col("dead") === 1, 0.0)
            .otherwise(round(exp(col("cumlog").cast("double")), 6)).as("survival"))
        .orderBy("lifetime_days")
    },

    // log-rank test between the even/odd user cohorts' survival curves
    // (kaplan_meier's lifetime/censoring definitions verbatim): at
    // each event time, observed group-1 deaths vs the hypergeometric
    // expectation and variance from the at-risk counts; per-term
    // values follow the rounded-term decimal-sum convention, so O1,
    // E1, V are engine-exact and z is one guarded double.
    Q("logrank_test",
      """WITH u AS (SELECT user_id, MIN(epoch_us(ts)) AS first_us,
        |    MAX(epoch_us(ts)) AS last_us FROM events GROUP BY 1),
        |g AS (SELECT MAX(last_us) AS gmax FROM u),
        |l AS (SELECT user_id, (last_us - first_us) // 86400000000 AS lt,
        |    CASE WHEN last_us < g.gmax - 86400000000 THEN 1 ELSE 0 END AS death,
        |    CAST(user_id % 2 AS INT) AS grp
        |  FROM u CROSS JOIN g),
        |c AS (SELECT lt, COUNT(*) AS nu, CAST(SUM(death) AS BIGINT) AS d,
        |    CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nu1,
        |    CAST(SUM(CASE WHEN grp = 1 THEN death ELSE 0 END) AS BIGINT) AS d1
        |  FROM l GROUP BY 1),
        |w AS (SELECT lt, d, d1,
        |    CAST(SUM(nu) OVER rc AS BIGINT) AS n,
        |    CAST(SUM(nu1) OVER rc AS BIGINT) AS n1
        |  FROM c
        |  WINDOW rc AS (ORDER BY lt ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
        |t AS (SELECT CAST(SUM(d1) AS BIGINT) AS o1,
        |    CAST(SUM(CAST(round(CAST(d AS DOUBLE) * n1 / n, 6) AS DECIMAL(20,6))) AS DECIMAL(20,6)) AS e1,
        |    CAST(SUM(CASE WHEN n > 1 THEN
        |        CAST(round(CAST(d AS DOUBLE) * n1 / n * (1.0 - CAST(n1 AS DOUBLE) / n)
        |          * (n - d) / (n - 1), 6) AS DECIMAL(20,6))
        |      ELSE CAST(0 AS DECIMAL(20,6)) END) AS DECIMAL(20,6)) AS v
        |  FROM w WHERE d > 0)
        |SELECT o1, CAST(e1 AS DOUBLE) AS e1,
        |  CASE WHEN v > 0 THEN
        |    round((CAST(o1 AS DOUBLE) - CAST(e1 AS DOUBLE)) / sqrt(CAST(v AS DOUBLE)), 6)
        |  END AS z
        |FROM t""".stripMargin) { (s, dir) =>
      val u = Tables.load(s, dir, "events")
        .groupBy("user_id")
        .agg(min(unix_micros(col("ts"))).as("first_us"),
          max(unix_micros(col("ts"))).as("last_us"))
      val g = u.agg(max(col("last_us")).as("gmax"))
      val l = u.crossJoin(broadcast(g))
        .select(expr("(last_us - first_us) div 86400000000L").as("lt"),
          when(col("last_us") < col("gmax") - lit(86400000000L), 1)
            .otherwise(0).as("death"),
          (col("user_id") % 2).cast("int").as("grp"))
      val c = l.groupBy("lt")
        .agg(count(lit(1)).as("nu"), sum(col("death")).cast("long").as("d"),
          sum(when(col("grp") === 1, 1).otherwise(0)).cast("long").as("nu1"),
          sum(when(col("grp") === 1, col("death")).otherwise(0)).cast("long").as("d1"))
      val rc = Window.orderBy("lt")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val w = c.select(col("lt"), col("d"), col("d1"),
        sum(col("nu")).over(rc).cast("long").as("n"),
        sum(col("nu1")).over(rc).cast("long").as("n1"))
      val dD = col("d").cast("double")
      val n1D = col("n1").cast("double")
      val eTerm = round(dD * col("n1") / col("n"), 6).cast(DecimalType(20, 6))
      val vTerm = when(col("n") > 1,
        round(dD * col("n1") / col("n") * (lit(1.0) - n1D / col("n"))
          * (col("n") - col("d")) / (col("n") - 1), 6).cast(DecimalType(20, 6)))
        .otherwise(lit(0).cast(DecimalType(20, 6)))
      val t = w.filter(col("d") > 0)
        .agg(sum(col("d1")).cast("long").as("o1"),
          sum(eTerm).cast(DecimalType(20, 6)).as("e1"),
          sum(vTerm).cast(DecimalType(20, 6)).as("v"))
      t.select(col("o1"), col("e1").cast("double").as("e1"),
        when(col("v") > 0,
          round((col("o1").cast("double") - col("e1").cast("double"))
            / sqrt(col("v").cast("double")), 6)).as("z"))
    },

    // seasonal-naive forecast backtest: train on the first 24 days
    // (per-(type, hour-of-day) mean), score the rest. The model is a
    // 120-cell census carried as exact (Σcents, n) pairs; per-hour
    // errors round to 6 dp THEN sum as DECIMAL (the suite convention
    // for cross-row double accumulation), so MAE/MAPE/bias are
    // engine-exact. Test cells whose (type, hod) never occurred in
    // training are excluded by the inner model join (none exist in
    // the fixtures; a production run would left-join and count them).
    Q("forecast_backtest",
      s"""WITH ${duckHourly.replace("h AS", "hh AS")},
        |i AS (SELECT event_type, hour, CAST(hour(hour) AS INT) AS hod,
        |    epoch_us(hour) // 86400000000 AS day, CAST(v * 100 AS BIGINT) AS y
        |  FROM hh),
        |sp AS (SELECT MIN(day) + 24 AS split_day FROM i),
        |m AS (SELECT event_type, hod, CAST(SUM(y) AS BIGINT) AS sv,
        |    CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM i CROSS JOIN sp WHERE day < split_day GROUP BY 1, 2),
        |t AS (SELECT i.event_type, i.y, m.sv, m.cnt
        |  FROM i CROSS JOIN sp JOIN m ON i.event_type = m.event_type AND i.hod = m.hod
        |  WHERE i.day >= split_day),
        |e AS (SELECT event_type,
        |    CAST(round(abs(CAST(y AS DOUBLE) - CAST(sv AS DOUBLE) / cnt) / 100.0, 6) AS DECIMAL(20,6)) AS ae,
        |    CAST(round((CAST(y AS DOUBLE) - CAST(sv AS DOUBLE) / cnt) / 100.0, 6) AS DECIMAL(20,6)) AS err,
        |    CASE WHEN y > 0 THEN CAST(round(abs(CAST(y AS DOUBLE) - CAST(sv AS DOUBLE) / cnt) / CAST(y AS DOUBLE), 6) AS DECIMAL(20,6)) END AS ape
        |  FROM t)
        |SELECT event_type, COUNT(*) AS n_test,
        |  round(CAST(SUM(ae) AS DOUBLE) / COUNT(*), 6) AS mae,
        |  CASE WHEN COUNT(ape) > 0 THEN round(CAST(SUM(ape) AS DOUBLE) / COUNT(ape), 6) END AS mape,
        |  round(CAST(SUM(err) AS DOUBLE) / COUNT(*), 6) AS bias
        |FROM e GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val i = hourly(s, dir).select(col("event_type"), col("hour"),
        hour(col("hour")).cast("int").as("hod"),
        expr("unix_micros(hour) div 86400000000L").as("day"),
        (col("v") * 100).cast("long").as("y"))
      val sp = i.agg((min(col("day")) + 24).as("split_day"))
      val withSplit = i.crossJoin(broadcast(sp))
      val m = withSplit.filter(col("day") < col("split_day"))
        .groupBy("event_type", "hod")
        .agg(sum(col("y")).cast("long").as("sv"), count(lit(1)).cast("long").as("cnt"))
      val t = withSplit.filter(col("day") >= col("split_day"))
        .join(broadcast(m), Seq("event_type", "hod"))
      val yD = col("y").cast("double")
      val pred = col("sv").cast("double") / col("cnt")
      val e = t.select(col("event_type"),
        round(abs(yD - pred) / 100.0, 6).cast(DecimalType(20, 6)).as("ae"),
        round((yD - pred) / 100.0, 6).cast(DecimalType(20, 6)).as("err"),
        when(col("y") > 0, round(abs(yD - pred) / yD, 6).cast(DecimalType(20, 6)))
          .as("ape"))
      e.groupBy("event_type")
        .agg(count(lit(1)).as("n_test"),
          round(sum(col("ae")).cast("double") / count(lit(1)), 6).as("mae"),
          when(count(col("ape")) > 0, // all-zero test hours: NULL MAPE
            round(sum(col("ape")).cast("double") / count(col("ape")), 6)).as("mape"),
          round(sum(col("err")).cast("double") / count(lit(1)), 6).as("bias"))
        .orderBy("event_type")
    },

    // tail risk of the daily value series: nearest-rank 5th-percentile
    // worst day (VaR95) and the exact mean of the days at or below it
    // (expected shortfall) — the census-order-statistic pattern, never
    // a corpus sort: ranks come from one window over the |days| census
    // and ES is an exact decimal mean over the flagged tail.
    Q("var_es",
      """WITH d AS (SELECT epoch_us(date_trunc('day', ts)) // 86400000000 AS day,
        |    CAST(SUM(CAST(value AS DECIMAL(12,2)) * 100) AS BIGINT) AS c
        |  FROM events GROUP BY 1),
        |r AS (SELECT day, c, ROW_NUMBER() OVER (ORDER BY c, day) AS rn,
        |    COUNT(*) OVER () AS nd FROM d),
        |v AS (SELECT MAX(CASE WHEN rn = greatest(1, CAST(ceil(0.05 * nd) AS BIGINT)) THEN c END) AS var_c,
        |    MAX(nd) AS nd FROM r),
        |t AS (SELECT r.c FROM r CROSS JOIN v WHERE r.c <= v.var_c)
        |SELECT v.nd AS n_days, round(v.var_c / 100.0, 6) AS var95,
        |  round(CAST((SELECT SUM(c) FROM t) AS DOUBLE) / (SELECT COUNT(*) FROM t) / 100.0, 6) AS es95
        |FROM v""".stripMargin) { (s, dir) =>
      val d = Tables.load(s, dir, "events")
        .groupBy(expr("unix_micros(date_trunc('day', ts)) div 86400000000L").as("day"))
        .agg((sum(col("value").cast(DecimalType(12, 2))).cast(DecimalType(18, 2))
          * 100).cast("long").as("c"))
      val r = d
        .withColumn("rn", row_number().over(Window.orderBy("c", "day")))
        .withColumn("nd", count(lit(1)).over(
          Window.rowsBetween(Long.MinValue, Long.MaxValue)))
      val v = r.agg(
        max(when(col("rn") === greatest(lit(1L),
          ceil(lit(0.05) * col("nd")).cast("long")), col("c"))).as("var_c"),
        max(col("nd")).as("nd"))
      val t = r.select("c").crossJoin(broadcast(v))
        .filter(col("c") <= col("var_c"))
        .agg(sum(col("c")).as("tc"), count(lit(1)).as("tn"))
      v.crossJoin(broadcast(t))
        .select(col("nd").as("n_days"),
          round(col("var_c") / 100.0, 6).as("var95"),
          round(col("tc").cast("double") / col("tn") / 100.0, 6).as("es95"))
    },

    // ADDITIVE HOLT-WINTERS (triple exponential smoothing, season
    // m=24) over the global hourly cent series: the genuinely
    // SEQUENTIAL recurrence the closed-form queries (ewma_trend's
    // truncated kernel) deliberately avoid. Cross-engine trick: every
    // iterate (level, trend, seasonal) is re-quantized to a 6-dp
    // DECIMAL after each step — the state walk is exact decimal
    // arithmetic under the same away-from-zero rounding rule in both
    // engines, so a 696-step trajectory is bit-identical (no float
    // drift to accumulate). Init is the standard first-two-days
    // recipe; its /24 and /576 divisions can never land on a rounding
    // boundary (terminating expansions stop by the 6th digit). Spark
    // side: the corpus reduces to the ~|hours| census in one scan,
    // then ONE bounded group folds it in memory (the OrderedReplay
    // discipline: census-sized by the time span, never corpus-sized);
    // DuckDB side: a recursive CTE carrying the 24-slot seasonal ring
    // as a list. alpha/beta/gamma = 0.2/0.1/0.3 as exact decimals.
    Q("holt_winters", {
      // lnew appears in three places in the recursive step; ONE
      // Scala string keeps the copies identical
      val lnew = "CAST(round(0.2 * (h.y - r.sl[1]) + 0.8 * (r.l + r.b), 6) AS DECIMAL(24,6))"
      s"""WITH RECURSIVE h0 AS (SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
         |    CAST(SUM(CAST(value AS DECIMAL(12,2)) * 100) AS BIGINT) AS y
         |  FROM events GROUP BY 1),
         |h AS (SELECT hour, y, CAST(row_number() OVER (ORDER BY hour) AS BIGINT) AS t FROM h0),
         |init AS (SELECT
         |    CAST(round(CAST(SUM(CASE WHEN t <= 24 THEN y END) AS DOUBLE) / 24.0, 6) AS DECIMAL(24,6)) AS l0,
         |    CAST(round(CAST(SUM(CASE WHEN t BETWEEN 25 AND 48 THEN y END)
         |      - SUM(CASE WHEN t <= 24 THEN y END) AS DOUBLE) / 576.0, 6) AS DECIMAL(24,6)) AS b0,
         |    CAST(MAX(t) AS BIGINT) AS tmax
         |  FROM h),
         |s0 AS (SELECT t AS i, CAST(h.y - init.l0 AS DECIMAL(24,6)) AS s
         |       FROM h CROSS JOIN init WHERE t <= 24),
         |rec AS (
         |  SELECT CAST(24 AS BIGINT) AS t, CAST(NULL AS BIGINT) AS y,
         |      init.l0 AS l, init.b0 AS b,
         |      (SELECT list(s ORDER BY i) FROM s0) AS sl,
         |      CAST(NULL AS DECIMAL(24,6)) AS fitted,
         |      CAST(NULL AS DECIMAL(24,6)) AS seas
         |    FROM init WHERE init.tmax >= 48
         |  UNION ALL
         |  SELECT h.t, h.y,
         |      $lnew,
         |      CAST(round(0.1 * ($lnew - r.l) + 0.9 * r.b, 6) AS DECIMAL(24,6)),
         |      list_slice(r.sl, 2, 24)
         |        || [CAST(round(0.3 * (h.y - $lnew) + 0.7 * r.sl[1], 6) AS DECIMAL(24,6))],
         |      CAST(r.l + r.b + r.sl[1] AS DECIMAL(24,6)),
         |      CAST(round(0.3 * (h.y - $lnew) + 0.7 * r.sl[1], 6) AS DECIMAL(24,6))
         |    FROM rec r JOIN h ON h.t = r.t + 1)
         |SELECT rec.t, h.hour, CAST(rec.y AS BIGINT) AS y_cents,
         |  CAST(rec.l AS DOUBLE) AS level, CAST(rec.b AS DOUBLE) AS trend,
         |  CAST(rec.seas AS DOUBLE) AS seasonal, CAST(rec.fitted AS DOUBLE) AS fitted
         |FROM rec JOIN h ON rec.t = h.t WHERE rec.t >= 25
         |ORDER BY rec.t""".stripMargin
    }) { (s, dir) =>
      import s.implicits._
      val h = Tables.load(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour"))
        .agg((sum(col("value").cast(DecimalType(12, 2)))
          .cast(DecimalType(18, 2)) * 100).cast("long").as("y"))
        .withColumn("t", row_number().over(Window.orderBy("hour")).cast("long"))
        .select(col("t"), col("hour"), col("y"))
        .as[(Long, java.sql.Timestamp, Long)]
      h.groupByKey(_ => 0)
        .flatMapGroups { (_, it) =>
          val rows = it.toArray.sortBy(_._1)
          if (rows.length < 48) Iterator.empty
          else {
            def q6(x: BigDecimal) =
              x.setScale(6, BigDecimal.RoundingMode.HALF_UP)
            def rd6(x: Double) = BigDecimal(x).setScale(
              6, BigDecimal.RoundingMode.HALF_UP)
            val s1 = rows.take(24).map(_._3).sum
            val s2 = rows.slice(24, 48).map(_._3).sum
            var l = rd6(s1.toDouble / 24.0)
            var b = rd6((s2 - s1).toDouble / 576.0)
            val ring = scala.collection.mutable.Queue(
              rows.take(24).map(r => BigDecimal(r._3) - l): _*)
            rows.drop(24).iterator.map { case (t, hour, y) =>
              val sOld = ring.dequeue()
              val fitted = l + b + sOld
              val lnew = q6(BigDecimal("0.2") * (BigDecimal(y) - sOld)
                + BigDecimal("0.8") * (l + b))
              val bnew = q6(BigDecimal("0.1") * (lnew - l)
                + BigDecimal("0.9") * b)
              val snew = q6(BigDecimal("0.3") * (BigDecimal(y) - lnew)
                + BigDecimal("0.7") * sOld)
              ring.enqueue(snew)
              l = lnew; b = bnew
              (t, hour, y, lnew.toDouble, bnew.toDouble,
                snew.toDouble, fitted.toDouble)
            }
          }
        }
        .toDF("t", "hour", "y_cents", "level", "trend", "seasonal", "fitted")
        .orderBy("t")
    },

    // CROSS-CORRELATION LEAD-LAG — does one event stream LEAD the
    // other? Pearson r between daily click counts and purchase counts
    // shifted by each lag in [-7, 7]: the argmax lag is the
    // lead time a funnel/attribution model should use, and the
    // ccf's decay is the standard prewhitening diagnostic. The corpus
    // reduces to ONE ≤|days| integer census; the lag fan-out is a
    // broadcast 15-row dim; per lag everything is six BIGINT sums and
    // one identically-written final double. Fully-tied or sub-2-day
    // overlaps yield NULL, never a divide-by-zero.
    Q("ccf_leadlag",
      """WITH e AS (SELECT epoch_us(date_trunc('day', ts)) // 86400000000 AS d,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS x,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |l AS (SELECT CAST(unnest(generate_series(-7, 7)) AS BIGINT) AS lag),
        |p AS (SELECT l.lag, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(a.x) AS BIGINT) AS sx, CAST(SUM(b.y) AS BIGINT) AS sy,
        |    CAST(SUM(a.x * b.y) AS BIGINT) AS sxy,
        |    CAST(SUM(a.x * a.x) AS BIGINT) AS sxx,
        |    CAST(SUM(b.y * b.y) AS BIGINT) AS syy
        |  FROM l JOIN e a ON true JOIN e b ON b.d = a.d + l.lag
        |  GROUP BY 1)
        |SELECT lag, n,
        |  CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
        |    THEN round(CAST(n * sxy - sx * sy AS DOUBLE)
        |      / sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * (n * syy - sy * sy)), 6)
        |    END AS r
        |FROM p ORDER BY lag""".stripMargin) { (s, dir) =>
      val e = Tables.load(s, dir, "events")
        .groupBy(expr("unix_micros(date_trunc('day', ts)) div 86400000000L")
          .as("d"))
        .agg(sum(when(col("event_type") === "click", 1).otherwise(0))
            .cast("long").as("x"),
          sum(when(col("event_type") === "purchase", 1).otherwise(0))
            .cast("long").as("y"))
      import s.implicits._
      val lags = (-7L to 7L).toDF("lag")
      val a = e.toDF("da", "x", "ya").crossJoin(broadcast(lags))
      val b = e.toDF("db", "xb", "y")
      val p = a.join(b, col("db") === col("da") + col("lag"))
        .groupBy("lag")
        .agg(count(lit(1)).cast("long").as("n"),
          sum(col("x")).cast("long").as("sx"),
          sum(col("y")).cast("long").as("sy"),
          sum(col("x") * col("y")).cast("long").as("sxy"),
          sum(col("x") * col("x")).cast("long").as("sxx"),
          sum(col("y") * col("y")).cast("long").as("syy"))
      p.select(col("lag"), col("n"),
          when(col("n") * col("sxx") - col("sx") * col("sx") > 0 &&
              col("n") * col("syy") - col("sy") * col("sy") > 0,
            round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
              / sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
                * (col("n") * col("syy") - col("sy") * col("sy"))), 6))
            .as("r"))
        .orderBy("lag")
    },

    // SAX SYMBOLIZATION (Lin et al. '03) — the time-series indexing
    // primitive: each (event_type, day) compresses to an 8-symbol
    // word over a 4-letter alphabet via piecewise aggregate
    // approximation (3-hour segment means) z-scored against the
    // type's global moments and cut at the normal quartile
    // breakpoints ±0.6745. Determinism: the census and the moment
    // sums are exact integers; μ, σ and each segment z are ONE
    // identically-written double expression; symbols are CASE cuts on
    // those doubles, and the word assembles in explicit segment order
    // (sort_array, never collect order). Missing hours shrink a
    // segment's mean (COUNT-present divisor) identically in both
    // engines; a constant series (σ=0) yields NULL words. Scale: one
    // scan to the hourly census; moments are a |types|-row broadcast;
    // words group census rows by (type, day).
    Q("sax_words",
      s"""WITH $duckHourly,
        |i AS (SELECT event_type, epoch_us(hour) // 3600000000 AS t,
        |    CAST(v * 100 AS BIGINT) AS c FROM h),
        |m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(c) AS BIGINT) AS sc,
        |    CAST(SUM(CAST(c AS DECIMAL(19,0)) * c) AS DECIMAL(30,0)) AS sq
        |  FROM i GROUP BY 1),
        |paa AS (SELECT event_type, t // 24 AS day, (t % 24) // 3 AS seg,
        |    CAST(SUM(c) AS DOUBLE) / COUNT(*) AS paa
        |  FROM i GROUP BY 1, 2, 3),
        |z AS (SELECT p.event_type, day, seg,
        |    CASE WHEN CAST(sq AS DOUBLE) / n
        |           - (CAST(sc AS DOUBLE) / n) * (CAST(sc AS DOUBLE) / n) > 0
        |      THEN (paa - CAST(sc AS DOUBLE) / n)
        |        / sqrt(CAST(sq AS DOUBLE) / n
        |           - (CAST(sc AS DOUBLE) / n) * (CAST(sc AS DOUBLE) / n))
        |      END AS z
        |  FROM paa p JOIN m ON p.event_type = m.event_type),
        |sym AS (SELECT event_type, day, seg,
        |    CASE WHEN z IS NULL THEN NULL
        |         WHEN z < -0.6745 THEN 'a' WHEN z < 0.0 THEN 'b'
        |         WHEN z < 0.6745 THEN 'c' ELSE 'd' END AS s
        |  FROM z)
        |SELECT event_type, CAST(day AS BIGINT) AS day,
        |  CASE WHEN COUNT(*) = COUNT(s)
        |    THEN string_agg(s, '' ORDER BY seg) END AS sax_word
        |FROM sym GROUP BY 1, 2 ORDER BY event_type, day""".stripMargin) { (s, dir) =>
      val i = hourly(s, dir)
        .select(col("event_type"),
          expr("unix_micros(hour) div 3600000000L").as("t"),
          (col("v") * 100).cast("long").as("c"))
      val m = i.groupBy("event_type").agg(
        count(lit(1)).cast("long").as("n"),
        sum(col("c")).cast("long").as("sc"),
        sum(col("c").cast(DecimalType(19, 0)) * col("c"))
          .cast(DecimalType(30, 0)).as("sq"))
      val paa = i.groupBy(col("event_type"),
          expr("t div 24").as("day"), expr("(t % 24) div 3").as("seg"))
        .agg((sum(col("c")).cast("double") / count(lit(1))).as("paa"))
      val mu = col("sc").cast("double") / col("n")
      val varExpr = col("sq").cast("double") / col("n") - mu * mu
      val z = paa.join(broadcast(m), "event_type")
        .select(col("event_type"), col("day"), col("seg"),
          when(varExpr > 0, (col("paa") - mu) / sqrt(varExpr)).as("z"))
      val sym = z.select(col("event_type"), col("day"), col("seg"),
        when(col("z").isNull, lit(null).cast("string"))
          .when(col("z") < -0.6745, "a").when(col("z") < 0.0, "b")
          .when(col("z") < 0.6745, "c").otherwise("d").as("s"))
      sym.groupBy("event_type", "day")
        .agg(count(lit(1)).as("nseg"), count(col("s")).as("nsym"),
          array_join(expr("transform(array_sort(collect_list(struct(seg, s))), x -> x.s)"),
            "").as("w"))
        .select(col("event_type"), col("day").cast("long").as("day"),
          when(col("nseg") === col("nsym"), col("w")).as("sax_word"))
        .orderBy("event_type", "day")
    },

    // SPLIT-CONFORMAL FORECAST INTERVAL — distribution-free
    // uncertainty quantification for the seasonal-naive forecaster
    // (predict this hour = same hour last week): calibration
    // residuals on EVEN days give the (1−α) conformal radius as the
    // ⌈(n_cal+1)·0.9⌉-th smallest |residual| (an EXACT integer order
    // statistic — the forecast, the residuals, and the rank selection
    // never touch a double), and the ODD-day half reports empirical
    // coverage at that radius. Guarantees ≥ 90% marginal coverage
    // under exchangeability — the honest error bar a forecast
    // consumer wants. Scale: the residual set is a census self-join
    // on (type, t−168) — span-bounded; the rank window is PARTITIONED
    // by event_type, so no single-partition exchange anywhere.
    Q("conformal_interval",
      s"""WITH $duckHourly,
        |i AS (SELECT event_type, epoch_us(hour) // 3600000000 AS t,
        |    CAST(v * 100 AS BIGINT) AS c FROM h),
        |r AS (SELECT a.event_type, a.t, (a.t // 24) % 2 AS odd,
        |    abs(a.c - b.c) AS ar
        |  FROM i a JOIN i b ON a.event_type = b.event_type AND b.t = a.t - 168),
        |cal AS (SELECT event_type, ar,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ar, ar) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS ncal
        |  FROM r WHERE odd = 0),
        |rad AS (SELECT event_type, ncal, ar AS radius
        |  FROM cal WHERE rn = (9 * (ncal + 1) + 9) // 10),
        |tst AS (SELECT r.event_type,
        |    CAST(COUNT(*) AS BIGINT) AS ntest,
        |    CAST(SUM(CASE WHEN ar <= radius THEN 1 ELSE 0 END) AS BIGINT) AS cov
        |  FROM r JOIN rad ON r.event_type = rad.event_type
        |  WHERE odd = 1 GROUP BY 1)
        |SELECT rad.event_type, CAST(ncal AS BIGINT) AS n_cal, ntest AS n_test,
        |  CAST(radius AS BIGINT) AS radius_cents,
        |  round(CAST(cov AS DOUBLE) / ntest, 6) AS coverage
        |FROM rad JOIN tst ON rad.event_type = tst.event_type
        |ORDER BY rad.event_type""".stripMargin) { (s, dir) =>
      val i = hourly(s, dir)
        .select(col("event_type"),
          expr("unix_micros(hour) div 3600000000L").as("t"),
          (col("v") * 100).cast("long").as("c"))
        .localCheckpoint(true)
      val b = i.select(col("event_type").as("etb"), col("t").as("tb"),
        col("c").as("cb"))
      val r = i.join(b, col("event_type") === col("etb")
          && col("tb") === col("t") - 168)
        .select(col("event_type"), col("t"),
          (expr("t div 24") % 2).as("odd"),
          abs(col("c") - col("cb")).as("ar"))
      val cal = r.filter(col("odd") === 0)
        .withColumn("rn", row_number().over(
          Window.partitionBy("event_type").orderBy("ar")))
        .withColumn("ncal", count(lit(1)).over(
          Window.partitionBy("event_type").rowsBetween(Long.MinValue, Long.MaxValue)))
      val rad = cal
        .filter(col("rn") === expr("(9 * (ncal + 1) + 9) div 10"))
        .select(col("event_type"), col("ncal"), col("ar").as("radius"))
      val tst = r.filter(col("odd") === 1)
        .join(broadcast(rad), "event_type")
        .groupBy("event_type")
        .agg(count(lit(1)).cast("long").as("ntest"),
          sum(when(col("ar") <= col("radius"), 1).otherwise(0))
            .cast("long").as("cov"))
      rad.join(tst, "event_type")
        .select(col("event_type"), col("ncal").cast("long").as("n_cal"),
          col("ntest").as("n_test"), col("radius").cast("long").as("radius_cents"),
          round(col("cov").cast("double") / col("ntest"), 6).as("coverage"))
        .orderBy("event_type")
    }
  )
}
