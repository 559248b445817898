package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Behavioral / product-analytics operators over `events` — the OLAP
  * query family the reference's event stream feeds in practice
  * (reference semantics: per-key ordered event processing,
  * `KafkaStreamApp.java:154-169`; here re-expressed as set-oriented
  * Spark plans instead of per-record state machines).
  *
  * Every query is a single- or two-shuffle plan with an explicit
  * 100 TB story in its comment; none holds per-user state on the
  * driver or collects anything.
  */
object BehaviorQueries {

  /** Running-min window: one shuffle + one sort per user, frame bounded
    * to the current row. All four funnel stages share this spec, so
    * Catalyst plans ONE Exchange + ONE Sort feeding four chained
    * WindowExecs (asserted in BehaviorSpec).
    */
  private def userScan = Window
    .partitionBy("user_id")
    .orderBy(col("ts"), col("event_id"))
    .rowsBetween(Window.unboundedPreceding, Window.currentRow)

  /** 8-bit × 8-bit Morton (Z-order) interleave, bit-parallel-free
    * composed form: disjoint target bits make `+` equal `|`, keeping
    * the whole key inside whole-stage codegen as a 16-term integer
    * expression (no UDF, no array allocation).
    */
  /** Adds the Hilbert xy2d key of (`ux`, `vb`) — 8-bit codes — as
    * column `d`: the classic 8-step rotate-and-accumulate recurrence
    * over bit planes, one withColumn block per step (pure integer
    * expressions, full codegen). The DuckDB oracle unrolls the SAME
    * step list; BehaviorSpec pins the key against an independent
    * Scala walk and full-grid bijectivity. */
  private[graft] def withHilbertKey(in: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    var df = in
      .withColumn("x", col("ux")).withColumn("y", col("vb"))
      .withColumn("d", lit(0L))
    Seq(128, 64, 32, 16, 8, 4, 2, 1).foreach { sz =>
      df = df
        .withColumn("rx",
          when(col("x").bitwiseAND(lit(sz.toLong)) > 0, 1).otherwise(0))
        .withColumn("ry",
          when(col("y").bitwiseAND(lit(sz.toLong)) > 0, 1).otherwise(0))
        .withColumn("xn", when(col("ry") === 0,
          when(col("rx") === 1, lit(255) - col("y")).otherwise(col("y")))
          .otherwise(col("x")))
        .withColumn("yn", when(col("ry") === 0,
          when(col("rx") === 1, lit(255) - col("x")).otherwise(col("x")))
          .otherwise(col("y")))
        .withColumn("d", col("d")
          + lit(sz.toLong * sz) * (lit(3) * col("rx")).bitwiseXOR(col("ry")))
        .withColumn("x", col("xn")).withColumn("y", col("yn"))
        .drop("rx", "ry", "xn", "yn")
    }
    df.drop("x", "y")
  }

  private[graft] def zInterleave(ux: Column, vb: Column): Column =
    (0 until 8).map { i =>
      shiftleft(shiftright(ux, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(vb, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** DuckDB twin of [[zInterleave]] — generated over the same bit
    * positions, never hand-expanded.
    */
  private val zInterleaveSql: String =
    (0 until 8).map { i =>
      s"(((ux >> $i) & 1) << ${2 * i}) + (((vb >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")

  /** One skyline elimination pass: keep a row iff no earlier row in
    * (value DESC, ts DESC, event_id ASC) order within the partition
    * keys has ts >= this row's ts. Earlier rows are exactly the
    * dominators-or-identical-with-smaller-id, so survivors are the
    * partition-local skyline (plus the min-id representative of exact
    * duplicate points).
    */
  private[graft] def skylinePass(df: org.apache.spark.sql.DataFrame,
                          partCols: Seq[String]): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy(partCols.map(col): _*)
      .orderBy(col("value").desc, col("ts").desc, col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__pmax", max(col("ts")).over(w))
      .where(col("__pmax").isNull || col("ts") > col("__pmax"))
      .drop("__pmax")
  }

  private[graft] case class SkyRow(event_type: String, event_id: Long,
                                   value: Double, ts: java.sql.Timestamp)

  /** Genuinely EXCHANGE-FREE local skyline elimination: a
    * partition-local sort (Sort(global=false) — no shuffle) followed
    * by one streaming pass holding a per-event_type running max
    * (|event_type| entries, not O(rows)). A Window keyed on
    * (event_type, spark_partition_id) would NOT be local — the
    * derived partition-id column forces a full-table hash Exchange
    * because Catalyst cannot prove the input is already clustered by
    * it. Timestamps compare at full microsecond precision
    * (Timestamp.getTime alone truncates to ms, which could wrongly
    * eliminate a non-dominated same-millisecond point).
    */
  private[graft] def localSkyline(
      df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val session = df.sparkSession
    import session.implicits._
    // one shared µs conversion guards both precision-critical sites
    // (this elimination scan and OrderedReplay's replay ordering)
    val us = graft.streaming.OrderedReplay.toUs _
    df.select("event_type", "event_id", "value", "ts").as[SkyRow]
      .sortWithinPartitions(col("value").desc, col("ts").desc, col("event_id"))
      .mapPartitions { it =>
        val maxTs = scala.collection.mutable.HashMap.empty[String, Long]
        it.filter { r =>
          val t = us(r.ts)
          val keep = maxTs.get(r.event_type).forall(t > _)
          if (keep) maxTs(r.event_type) = t
          keep
        }
      }
      .toDF()
  }

  def all: Seq[Q] = Seq(

    // RFM SEGMENTATION — the classic recency/frequency/monetary
    // customer grid (direct-marketing lineage, standard in product
    // analytics): per user the days since last event, the event
    // count, and the decimal-exact value sum; each metric scored
    // into quintiles by ntile(5) over a DETERMINISTIC total order
    // (metric, then user_id — both engines put ntile's remainder
    // rows in the leading buckets, so unique ordering makes the
    // bucket assignment identical), then the segment census. The
    // heavy reduction is the per-user aggregate (one shuffle over
    // the event stream); the ntile windows run on the USER census —
    // the key_skew_gini allowlist shape — and the output is at most
    // 125 segment rows at any corpus size.
    Q("rfm_segments",
      """WITH g AS (SELECT MAX(ts) AS gmax FROM events),
        |u AS (SELECT user_id,
        |    CAST(CAST((SELECT gmax FROM g) AS DATE) - CAST(MAX(ts) AS DATE) AS BIGINT) AS r,
        |    COUNT(*) AS f,
        |    SUM(CAST(round(value, 6) AS DECIMAL(18,6))) AS m
        |  FROM events GROUP BY 1),
        |sc AS (SELECT r, f, m,
        |    ntile(5) OVER (ORDER BY r, user_id) AS r_score,
        |    ntile(5) OVER (ORDER BY f DESC, user_id) AS f_score,
        |    ntile(5) OVER (ORDER BY m DESC, user_id) AS m_score FROM u)
        |SELECT r_score, f_score, m_score, COUNT(*) AS n_users,
        |  round(CAST(SUM(r) AS DOUBLE) / COUNT(*), 6) AS avg_recency_days,
        |  CAST(SUM(f) AS BIGINT) AS n_events,
        |  round(CAST(SUM(m) AS DOUBLE), 6) AS monetary
        |FROM sc GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.types.DecimalType
      val ev = Tables.load(s, dir, "events").select("user_id", "ts", "value")
      val g = ev.agg(max("ts").as("gmax"))
      val u = ev.groupBy("user_id")
        .agg(max("ts").as("umax"), count(lit(1)).as("f"),
          sum(round(col("value"), 6).cast(DecimalType(18, 6))).as("m"))
        .crossJoin(broadcast(g))
        .select(col("user_id"),
          datediff(to_date(col("gmax")), to_date(col("umax"))).as("r"),
          col("f"), col("m"))
      val sc = u.select(col("r"), col("f"), col("m"),
        ntile(5).over(Window.orderBy(col("r"), col("user_id"))).as("r_score"),
        ntile(5).over(Window.orderBy(col("f").desc, col("user_id")))
          .as("f_score"),
        ntile(5).over(Window.orderBy(col("m").desc, col("user_id")))
          .as("m_score"))
      sc.groupBy("r_score", "f_score", "m_score")
        .agg(count(lit(1)).as("n_users"),
          round(sum(col("r")).cast("double") / count(lit(1)), 6)
            .as("avg_recency_days"),
          sum(col("f")).as("n_events"),
          round(sum(col("m")).cast("double"), 6).as("monetary"))
        .orderBy("r_score", "f_score", "m_score")
    },

    // EVENT-TYPE ASSOCIATION LIFT — market-basket analysis with the
    // (user, day) pair as the basket (user-lifetime baskets saturate
    // on a 30-day fixture — every user eventually does everything —
    // while daily baskets leave real co-occurrence signal): for every
    // unordered type pair, support counts and
    // lift = P(a ∧ b) / (P(a)·P(b)) = n_ab·N / (n_a·n_b) — the
    // signal that two behaviors co-occur beyond chance. All inputs
    // are exact integer censuses; lift is one fixed-order expression
    // over them. The per-user distinct-type reduction is the only
    // corpus-sized aggregation; the pair expansion happens on the
    // |types|-bounded per-user SET (array combinations, map-side),
    // and the final frame is a type-pair census (≤ C(|types|, 2)
    // rows at any scale).
    Q("event_type_lift",
      """WITH ut AS (SELECT DISTINCT user_id || '#' || CAST(CAST(ts AS DATE) AS VARCHAR) AS basket,
        |      event_type FROM events),
        |n AS (SELECT COUNT(DISTINCT basket) AS nu FROM ut),
        |tc AS (SELECT event_type, COUNT(*) AS c FROM ut GROUP BY 1),
        |pairs AS (SELECT a.basket, a.event_type AS ta, b.event_type AS tb
        |          FROM ut a JOIN ut b ON a.basket = b.basket
        |            AND a.event_type < b.event_type),
        |pc AS (SELECT ta, tb, COUNT(*) AS n_ab FROM pairs GROUP BY 1, 2)
        |SELECT ta AS type_a, tb AS type_b, n_ab,
        |  ca.c AS n_a, cb.c AS n_b,
        |  nu AS n_baskets,
        |  round(CAST(n_ab AS DOUBLE) / nu, 6) AS support,
        |  round(CAST(n_ab AS DOUBLE) * nu / (ca.c * cb.c), 6) AS lift
        |FROM pc JOIN tc ca ON ta = ca.event_type
        |        JOIN tc cb ON tb = cb.event_type CROSS JOIN n
        |ORDER BY type_a, type_b""".stripMargin) { (s, dir) =>
      val ut = Tables.load(s, dir, "events")
        .select(concat(col("user_id").cast("string"), lit("#"),
          to_date(col("ts")).cast("string")).as("basket"),
          col("event_type")).distinct()
        .localCheckpoint(true) // feeds the pair frame and both censuses
      val n = ut.agg(countDistinct(col("basket")).as("nu"))
      val tc = ut.groupBy("event_type").agg(count(lit(1)).as("c"))
      val pc = ut.as("a")
        .join(ut.as("b"), col("a.basket") === col("b.basket") &&
          col("a.event_type") < col("b.event_type"))
        .groupBy(col("a.event_type").as("ta"), col("b.event_type").as("tb"))
        .agg(count(lit(1)).as("n_ab"))
      pc.join(broadcast(tc.toDF("ta", "n_a")), Seq("ta"))
        .join(broadcast(tc.toDF("tb", "n_b")), Seq("tb"))
        .crossJoin(broadcast(n))
        .select(col("ta").as("type_a"), col("tb").as("type_b"), col("n_ab"),
          col("n_a"), col("n_b"), col("nu").as("n_baskets"),
          round(col("n_ab").cast("double") / col("nu"), 6).as("support"),
          round(col("n_ab").cast("double") * col("nu") /
            (col("n_a") * col("n_b")), 6).as("lift"))
        .orderBy("type_a", "type_b")
    },

    // ordered conversion funnel signup -> view -> click -> purchase:
    // cascaded running-mins over ONE sort (stage k's earliest-valid
    // timestamp feeds stage k+1's qualification), then per-user flags,
    // then a global 1-row rollup. 100 TB: one shuffle on user_id, one
    // sort, O(1) state per row; no per-user event list is ever
    // materialized (the collect_list-then-scan shape this replaces).
    Q("funnel_steps",
      """WITH w1 AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    min(CASE WHEN event_type = 'signup' THEN ts END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r1
        |  FROM events),
        |w2 AS (
        |  SELECT *, min(CASE WHEN event_type = 'view' AND r1 IS NOT NULL THEN ts END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r2
        |  FROM w1),
        |w3 AS (
        |  SELECT *, min(CASE WHEN event_type = 'click' AND r2 IS NOT NULL THEN ts END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r3
        |  FROM w2),
        |w4 AS (
        |  SELECT *, min(CASE WHEN event_type = 'purchase' AND r3 IS NOT NULL THEN ts END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r4
        |  FROM w3),
        |u AS (
        |  SELECT user_id,
        |    max(CASE WHEN r1 IS NOT NULL THEN 1 ELSE 0 END) AS f1,
        |    max(CASE WHEN r2 IS NOT NULL THEN 1 ELSE 0 END) AS f2,
        |    max(CASE WHEN r3 IS NOT NULL THEN 1 ELSE 0 END) AS f3,
        |    max(CASE WHEN r4 IS NOT NULL THEN 1 ELSE 0 END) AS f4
        |  FROM w4 GROUP BY user_id)
        |SELECT CAST(SUM(f1) AS BIGINT) AS signup_users,
        |       CAST(SUM(f2) AS BIGINT) AS view_users,
        |       CAST(SUM(f3) AS BIGINT) AS click_users,
        |       CAST(SUM(f4) AS BIGINT) AS purchase_users
        |FROM u""".stripMargin) { (s, dir) =>
      val w = userScan
      Tables.load(s, dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .withColumn("r1",
          min(when(col("event_type") === "signup", col("ts"))).over(w))
        .withColumn("r2",
          min(when(col("event_type") === "view" && col("r1").isNotNull, col("ts"))).over(w))
        .withColumn("r3",
          min(when(col("event_type") === "click" && col("r2").isNotNull, col("ts"))).over(w))
        .withColumn("r4",
          min(when(col("event_type") === "purchase" && col("r3").isNotNull, col("ts"))).over(w))
        .groupBy("user_id")
        .agg(
          max(when(col("r1").isNotNull, 1).otherwise(0)).as("f1"),
          max(when(col("r2").isNotNull, 1).otherwise(0)).as("f2"),
          max(when(col("r3").isNotNull, 1).otherwise(0)).as("f3"),
          max(when(col("r4").isNotNull, 1).otherwise(0)).as("f4"))
        .agg(
          sum(col("f1")).cast("long").as("signup_users"),
          sum(col("f2")).cast("long").as("view_users"),
          sum(col("f3")).cast("long").as("click_users"),
          sum(col("f4")).cast("long").as("purchase_users"))
    },

    // cohort retention: cohort = first-activity day per user as an
    // UNORDERED window min (no groupBy + join-back, no second scan),
    // offsets capped at 7 days to bound output. 100 TB: three hash
    // shuffles — user_id for the window, the distinct's composite
    // key, and the 2-key rollup (hashpartitioning on 3 columns does
    // not satisfy the 2-column clustering, so the rollup re-shuffles
    // the distinct's output; that input is already
    // cohort×offset×user-deduped, far smaller than the event table)
    // — plus the final presentation sort.
    Q("cohort_retention",
      """WITH c AS (
        |  SELECT user_id, ts,
        |    CAST(min(ts) OVER (PARTITION BY user_id) AS DATE) AS cohort_day
        |  FROM events),
        |a AS (
        |  SELECT DISTINCT cohort_day,
        |    CAST(date_diff('day', cohort_day, CAST(ts AS DATE)) AS BIGINT) AS day_offset,
        |    user_id
        |  FROM c
        |  WHERE date_diff('day', cohort_day, CAST(ts AS DATE)) <= 7)
        |SELECT cohort_day, day_offset, COUNT(*) AS active_users
        |FROM a GROUP BY cohort_day, day_offset
        |ORDER BY cohort_day, day_offset""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .select("user_id", "ts")
        .withColumn("cohort_day",
          min(col("ts")).over(Window.partitionBy("user_id")).cast("date"))
        .withColumn("day_offset",
          datediff(col("ts").cast("date"), col("cohort_day")).cast("long"))
        .where(col("day_offset") <= 7)
        .select("cohort_day", "day_offset", "user_id")
        .distinct()
        .groupBy("cohort_day", "day_offset")
        .agg(count(lit(1)).as("active_users"))
        .orderBy("cohort_day", "day_offset")
    },

    // 2-D skyline (pareto frontier) per event_type, maximizing
    // (value, ts): the classic OLAP operator Spark lacks, built as
    // sort + running-max instead of the O(n^2) dominance anti-join the
    // oracle uses. TWO passes: an exchange-free partition-local pass
    // (local sort + streaming per-type running max — see
    // [[localSkyline]]) eliminates locally-dominated rows in
    // parallel, then the global window pass runs over the (skyline-
    // sized) survivors — the only full-table exchange in the plan is
    // the survivors' event_type shuffle, asserted in BehaviorSpec.
    // Dominated-elimination is order-insensitive, so the result is
    // invariant to the physical partitioning (asserted under
    // repartition). Exact-duplicate (value,ts) points keep the min
    // event_id — the oracle's second NOT EXISTS pins the same rule.
    Q("skyline_events",
      """SELECT p.event_type, p.event_id, p.value, p.ts
        |FROM events p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM events q
        |  WHERE q.event_type = p.event_type
        |    AND q.value >= p.value AND q.ts >= p.ts
        |    AND (q.value > p.value OR q.ts > p.ts))
        |AND NOT EXISTS (
        |  SELECT 1 FROM events q
        |  WHERE q.event_type = p.event_type
        |    AND q.value = p.value AND q.ts = p.ts
        |    AND q.event_id < p.event_id)
        |ORDER BY p.event_type, p.event_id""".stripMargin) { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
        .select("event_type", "event_id", "value", "ts")
      skylinePass(localSkyline(ev), Seq("event_type"))
        .select("event_type", "event_id", "value", "ts")
        .orderBy("event_type", "event_id")
    },

    // SCD2 (slowly-changing-dimension type 2) interval construction:
    // collapse each user's event stream into [valid_from, valid_to)
    // state intervals, one row per event_type CHANGE — the standard
    // warehouse history-table build. Both windows share the
    // (user_id)-(ts, event_id) sort, and the change filter preserves
    // ordering, so the plan is ONE shuffle + ONE sort feeding lag,
    // filter, lead. 100 TB: output is bounded by state changes, not
    // events; open intervals carry NULL valid_to.
    Q("scd2_intervals",
      """WITH o AS (SELECT user_id, ts, event_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |  FROM events),
        |c AS (SELECT user_id, ts, event_id, event_type FROM o
        |      WHERE prev_type IS NULL OR event_type <> prev_type),
        |i AS (SELECT user_id, event_type, ts AS valid_from,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        |  FROM c)
        |SELECT user_id, event_type, valid_from, valid_to
        |FROM i ORDER BY user_id, valid_from, event_type""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.load(s, dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .where(col("prev_type").isNull || col("event_type") =!= col("prev_type"))
        .select(col("user_id"), col("event_type"), col("ts").as("valid_from"),
          lead(col("ts"), 1).over(w).as("valid_to"))
        .orderBy("user_id", "valid_from", "event_type")
    },

    // z-score outlier census per event_type — the streaming-metrics
    // data-quality gate (alert when a type's value distribution grows
    // a tail). Moments come from INTEGER cent-unit sums
    // (floor(x*100 + 0.5) — the engines' decimal-cast tie rules
    // differ, integer sums don't), so mean/std are exact identical
    // doubles in both engines; sqrt is IEEE-correctly-rounded
    // everywhere. Two passes over events (moments, then the flag
    // count with the tiny stats table broadcast) — the textbook
    // two-pass variance shape that survives any scale; sxx stays
    // exact under 2^53 up to ~10^15 cent^2 mass per type.
    Q("value_outliers",
      """WITH v AS (SELECT event_type,
        |    CAST(floor(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS vi
        |  FROM events),
        |s AS (SELECT event_type, COUNT(*) AS n,
        |    CAST(SUM(vi) AS DOUBLE) AS sx, CAST(SUM(vi * vi) AS DOUBLE) AS sxx
        |  FROM v GROUP BY event_type),
        |m AS (SELECT event_type, n, sx / n AS mc,
        |    sqrt((sxx - sx * sx / n) / (n - 1)) AS sc FROM s)
        |SELECT v.event_type, m.n,
        |  round(m.mc / 100.0, 6) AS mean_value,
        |  round(m.sc / 100.0, 6) AS std_value,
        |  CAST(SUM(CASE WHEN abs(CAST(vi AS DOUBLE) - m.mc) > m.sc * 3.0
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM v JOIN m USING (event_type)
        |GROUP BY v.event_type, m.n, m.mc, m.sc
        |ORDER BY event_type""".stripMargin) { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
        .select(col("event_type"),
          floor(col("value").cast("double") * 100.0 + 0.5).cast("long").as("vi"))
      val stats = ev.groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("vi")).cast("double").as("sx"),
          sum(col("vi") * col("vi")).cast("double").as("sxx"))
        .select(col("event_type"), col("n"),
          (col("sx") / col("n")).as("mc"),
          sqrt((col("sxx") - col("sx") * col("sx") / col("n"))
            / (col("n") - 1)).as("sc"))
      ev.join(broadcast(stats), "event_type")
        .groupBy("event_type", "n", "mc", "sc")
        .agg(sum(when(abs(col("vi").cast("double") - col("mc")) > col("sc") * 3.0, 1)
          .otherwise(0)).cast("long").as("n_outliers"))
        .select(col("event_type"), col("n"),
          round(col("mc") / 100.0, 6).as("mean_value"),
          round(col("sc") / 100.0, 6).as("std_value"),
          col("n_outliers"))
        .orderBy("event_type")
    },

    // Z-order (Morton) layout audit: interleave 8-bit user and value
    // codes into one clustering key and report per-key-range extents.
    // This is the data-layout primitive for multi-dimensional file
    // skipping: writing sorted by zkey (repartitionByRange +
    // sortWithinPartitions at the writer) makes each file's parquet
    // footer min/max cover a compact (user, value) rectangle — the
    // query materializes exactly those per-range rectangles. The key
    // is a pure 16-term integer expression (codegen, no UDF); the
    // rollup is one shuffle on the 64 coarse ranges.
    Q("zorder_layout",
      s"""WITH c AS (
         |  SELECT (user_id & 255) AS ux,
         |    GREATEST(0, LEAST(255, CAST(FLOOR(value / 3.0) AS BIGINT))) AS vb
         |  FROM events),
         |z AS (SELECT ux, vb, ($zInterleaveSql) AS zkey FROM c)
         |SELECT (zkey >> 10) AS zbucket, COUNT(*) AS n,
         |  MIN(ux) AS u_min, MAX(ux) AS u_max,
         |  MIN(vb) AS v_min, MAX(vb) AS v_max,
         |  MIN(zkey) AS z_min, MAX(zkey) AS z_max
         |FROM z GROUP BY zbucket ORDER BY zbucket""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .select(
          col("user_id").bitwiseAND(lit(255L)).as("ux"),
          greatest(lit(0L),
            least(lit(255L), floor(col("value") / 3.0).cast("long"))).as("vb"))
        .withColumn("zkey", zInterleave(col("ux"), col("vb")))
        .groupBy(shiftright(col("zkey"), 10).as("zbucket"))
        .agg(count(lit(1)).as("n"),
          min(col("ux")).as("u_min"), max(col("ux")).as("u_max"),
          min(col("vb")).as("v_min"), max(col("vb")).as("v_max"),
          min(col("zkey")).as("z_min"), max(col("zkey")).as("z_max"))
        .orderBy("zbucket")
    },

    // HILBERT-CURVE layout audit — zorder_layout's sibling with the
    // better-locality clustering key: xy2d over the same 8-bit
    // (user, value-bucket) codes via the classic 8-step rotate-and-
    // accumulate recurrence (one flip/swap per bit plane), UNROLLED
    // from one Scala step list into identical pure-integer
    // expressions in both engines — no UDF, full codegen, exact.
    // Same per-bucket rectangle report as zorder_layout, so the two
    // layouts' file-skipping extents are directly comparable; a
    // HilbertSpec-style recompute pins the key against an
    // independent JVM walk of the same recurrence.
    Q("hilbert_layout", {
      val steps = Seq(128, 64, 32, 16, 8, 4, 2, 1)
      val ctes = steps.zipWithIndex.map { case (s, i) =>
        val k = i + 1
        s"""r$k AS (SELECT ux, vb, x, y, d,
           |  CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END AS rx,
           |  CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END AS ry FROM g${k - 1}),
           |g$k AS (SELECT ux, vb,
           |  CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN 255 - y ELSE y END) ELSE x END AS x,
           |  CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN 255 - x ELSE x END) ELSE y END AS y,
           |  d + $s * $s * xor(3 * rx, ry) AS d
           | FROM r$k)""".stripMargin
      }.mkString(",\n")
      s"""WITH c AS (
         |  SELECT (user_id & 255) AS ux,
         |    GREATEST(0, LEAST(255, CAST(FLOOR(value / 3.0) AS BIGINT))) AS vb
         |  FROM events),
         |g0 AS (SELECT ux, vb, ux AS x, vb AS y, CAST(0 AS BIGINT) AS d FROM c),
         |$ctes
         |SELECT (d >> 10) AS hbucket, COUNT(*) AS n,
         |  MIN(ux) AS u_min, MAX(ux) AS u_max,
         |  MIN(vb) AS v_min, MAX(vb) AS v_max,
         |  MIN(d) AS h_min, MAX(d) AS h_max
         |FROM g${steps.length} GROUP BY hbucket ORDER BY hbucket""".stripMargin
    }) { (s, dir) =>
      val df = withHilbertKey(Tables.load(s, dir, "events")
        .select(
          col("user_id").bitwiseAND(lit(255L)).as("ux"),
          greatest(lit(0L),
            least(lit(255L), floor(col("value") / 3.0).cast("long"))).as("vb")))
      df.groupBy(shiftright(col("d"), 10).as("hbucket"))
        .agg(count(lit(1)).as("n"),
          min(col("ux")).as("u_min"), max(col("ux")).as("u_max"),
          min(col("vb")).as("v_min"), max(col("vb")).as("v_max"),
          min(col("d")).as("h_min"), max(col("d")).as("h_max"))
        .orderBy("hbucket")
    },

    // Recency-weighted engagement — the time-decay aggregate behind
    // "recent activity" user features (ranking/personalization
    // training labels): score_u = Σ value·exp(-age/τ), τ = 7 days,
    // ages measured back from the corpus max event time. Cross-engine:
    // ages are exact integer microseconds scaled to days (one double
    // division), each row's decayed contribution quantizes to 1e-6
    // integer units IMMEDIATELY after the one libm call (exp — the
    // dsir_select boundary-flip argument, odds ~1e-10/row), so the
    // per-user SUM is order-independent and exact. Scale: the global
    // max-ts is a one-row aggregate broadcast back (allowlisted the
    // same way as unigram_logprob's corpus total); scoring is
    // scan-side math; the only corpus exchange is the user aggregate.
    Q("decayed_engagement",
      """WITH mx AS (SELECT MAX(epoch_us(ts)) AS tmax FROM events),
        |w AS (SELECT user_id,
        |    CAST(floor(value * exp(-((tmax - epoch_us(ts)) / 86400000000.0) / 7.0) * 1e6 + 0.5) AS BIGINT) AS w_u
        |  FROM events CROSS JOIN mx)
        |SELECT user_id, COUNT(*) AS n_events,
        |  CAST(SUM(w_u) AS BIGINT) AS score_u,
        |  SUM(w_u) / 1000000.0 AS score
        |FROM w GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val mx = ev.agg(max(unix_micros(col("ts"))).as("tmax"))
      ev.crossJoin(broadcast(mx))
        .select(col("user_id"),
          floor(col("value") *
            exp(-((col("tmax") - unix_micros(col("ts"))) / 86400000000.0) / 7.0)
            * 1e6 + 0.5).cast("long").as("w_u"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"), sum(col("w_u")).as("score_u"))
        .select(col("user_id"), col("n_events"), col("score_u"),
          (col("score_u") / lit(1000000.0)).as("score"))
        .orderBy("user_id")
    },

    // difference-in-differences: did a mid-window change move purchase
    // value for the exposed half (even user_ids) beyond the control
    // trend? The whole estimate reduces to a FOUR-CELL moment census
    // (treat × period n/Σcents via conditional aggregation in one
    // corpus pass); the DiD contrast and each cell mean are single
    // double expressions over exact integers. The parallel-trends
    // caveat rides in the pre-period means, which ship alongside.
    Q("did_estimate",
      """WITH p AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day,
        |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
        |  FROM events WHERE event_type = 'purchase'),
        |sp AS (SELECT MIN(day) + 15 AS split_day FROM p),
        |m AS (SELECT
        |    CAST(SUM(CASE WHEN user_id % 2 = 0 AND day < split_day THEN 1 ELSE 0 END) AS BIGINT) AS n_t_pre,
        |    CAST(SUM(CASE WHEN user_id % 2 = 0 AND day < split_day THEN c ELSE 0 END) AS BIGINT) AS s_t_pre,
        |    CAST(SUM(CASE WHEN user_id % 2 = 0 AND day >= split_day THEN 1 ELSE 0 END) AS BIGINT) AS n_t_post,
        |    CAST(SUM(CASE WHEN user_id % 2 = 0 AND day >= split_day THEN c ELSE 0 END) AS BIGINT) AS s_t_post,
        |    CAST(SUM(CASE WHEN user_id % 2 = 1 AND day < split_day THEN 1 ELSE 0 END) AS BIGINT) AS n_c_pre,
        |    CAST(SUM(CASE WHEN user_id % 2 = 1 AND day < split_day THEN c ELSE 0 END) AS BIGINT) AS s_c_pre,
        |    CAST(SUM(CASE WHEN user_id % 2 = 1 AND day >= split_day THEN 1 ELSE 0 END) AS BIGINT) AS n_c_post,
        |    CAST(SUM(CASE WHEN user_id % 2 = 1 AND day >= split_day THEN c ELSE 0 END) AS BIGINT) AS s_c_post
        |  FROM p CROSS JOIN sp)
        |SELECT n_t_pre, n_t_post, n_c_pre, n_c_post,
        |  CASE WHEN n_t_pre > 0 THEN round(CAST(s_t_pre AS DOUBLE) / n_t_pre / 100.0, 6) END AS m_t_pre,
        |  CASE WHEN n_t_post > 0 THEN round(CAST(s_t_post AS DOUBLE) / n_t_post / 100.0, 6) END AS m_t_post,
        |  CASE WHEN n_c_pre > 0 THEN round(CAST(s_c_pre AS DOUBLE) / n_c_pre / 100.0, 6) END AS m_c_pre,
        |  CASE WHEN n_c_post > 0 THEN round(CAST(s_c_post AS DOUBLE) / n_c_post / 100.0, 6) END AS m_c_post,
        |  CASE WHEN n_t_pre > 0 AND n_t_post > 0 AND n_c_pre > 0 AND n_c_post > 0 THEN
        |    round((CAST(s_t_post AS DOUBLE) / n_t_post - CAST(s_t_pre AS DOUBLE) / n_t_pre
        |       - (CAST(s_c_post AS DOUBLE) / n_c_post - CAST(s_c_pre AS DOUBLE) / n_c_pre)) / 100.0, 6) END AS did
        |FROM m""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.types.DecimalType
      val p = Tables.load(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), expr("unix_micros(ts) div 86400000000L").as("day"),
          (col("value").cast(DecimalType(12, 2)) * 100).cast("long").as("c"))
      val sp = p.agg((min(col("day")) + 15).as("split_day"))
      def cell(treat: Boolean, post: Boolean) = {
        val cond = (col("user_id") % 2 === (if (treat) 0 else 1)) &&
          (if (post) col("day") >= col("split_day") else col("day") < col("split_day"))
        (sum(when(cond, 1).otherwise(0)).cast("long"),
          sum(when(cond, col("c")).otherwise(0)).cast("long"))
      }
      val withSplit = p.crossJoin(broadcast(sp))
      val ((ntPre, stPre), (ntPost, stPost)) = (cell(true, false), cell(true, true))
      val ((ncPre, scPre), (ncPost, scPost)) = (cell(false, false), cell(false, true))
      val m = withSplit.agg(
        ntPre.as("n_t_pre"), stPre.as("s_t_pre"),
        ntPost.as("n_t_post"), stPost.as("s_t_post"),
        ncPre.as("n_c_pre"), scPre.as("s_c_pre"),
        ncPost.as("n_c_post"), scPost.as("s_c_post"))
      // an empty cell (tiny corpora, one-sided windows) yields NULL
      // means instead of an ANSI divide-by-zero (EdgeCasesSpec sweep)
      def mean(sc: String, n: String) = when(col(n) > 0,
        col(sc).cast("double") / col(n))
      val allCells = col("n_t_pre") > 0 && col("n_t_post") > 0 &&
        col("n_c_pre") > 0 && col("n_c_post") > 0
      m.select(col("n_t_pre"), col("n_t_post"), col("n_c_pre"), col("n_c_post"),
        round(mean("s_t_pre", "n_t_pre") / 100.0, 6).as("m_t_pre"),
        round(mean("s_t_post", "n_t_post") / 100.0, 6).as("m_t_post"),
        round(mean("s_c_pre", "n_c_pre") / 100.0, 6).as("m_c_pre"),
        round(mean("s_c_post", "n_c_post") / 100.0, 6).as("m_c_post"),
        when(allCells,
          round((mean("s_t_post", "n_t_post") - mean("s_t_pre", "n_t_pre")
            - (mean("s_c_post", "n_c_post") - mean("s_c_pre", "n_c_pre"))) / 100.0, 6))
          .as("did"))
    },

    // two-proportion z-test on user-level purchase conversion between
    // the even/odd cohorts — the significance gate an experimenter
    // runs beside did_estimate's effect size. Converts at the USER
    // grain (>=1 purchase), so the whole test reduces to a four-number
    // census; the pooled-variance z is one guarded double expression.
    Q("conversion_ztest",
      """WITH u AS (SELECT user_id, CAST(user_id % 2 AS INT) AS grp,
        |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT
        |    CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(SUM(CASE WHEN grp = 0 THEN conv ELSE 0 END) AS BIGINT) AS x1,
        |    CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |    CAST(SUM(CASE WHEN grp = 1 THEN conv ELSE 0 END) AS BIGINT) AS x2
        |  FROM u)
        |SELECT n1, x1, n2, x2,
        |  CASE WHEN n1 > 0 THEN round(CAST(x1 AS DOUBLE) / n1, 6) END AS p1,
        |  CASE WHEN n2 > 0 THEN round(CAST(x2 AS DOUBLE) / n2, 6) END AS p2,
        |  CASE WHEN n1 > 0 AND n2 > 0 AND x1 + x2 > 0 AND x1 + x2 < n1 + n2 THEN
        |    round((CAST(x1 AS DOUBLE) / n1 - CAST(x2 AS DOUBLE) / n2)
        |      / sqrt(CAST(x1 + x2 AS DOUBLE) / (n1 + n2)
        |          * (1.0 - CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
        |          * (1.0 / n1 + 1.0 / n2)), 6)
        |  END AS z
        |FROM m""".stripMargin) { (s, dir) =>
      val u = Tables.load(s, dir, "events")
        .groupBy(col("user_id"), (col("user_id") % 2).cast("int").as("grp"))
        .agg(max(when(col("event_type") === "purchase", 1).otherwise(0)).as("conv"))
      val m = u.agg(
        sum(when(col("grp") === 0, 1).otherwise(0)).cast("long").as("n1"),
        sum(when(col("grp") === 0, col("conv")).otherwise(0)).cast("long").as("x1"),
        sum(when(col("grp") === 1, 1).otherwise(0)).cast("long").as("n2"),
        sum(when(col("grp") === 1, col("conv")).otherwise(0)).cast("long").as("x2"))
      val (n1, x1, n2, x2) = (col("n1"), col("x1"), col("n2"), col("x2"))
      val pPool = (x1 + x2).cast("double") / (n1 + n2)
      val zOk = n1 > 0 && n2 > 0 && x1 + x2 > 0 && x1 + x2 < n1 + n2
      m.select(n1, x1, n2, x2,
        when(n1 > 0, round(x1.cast("double") / n1, 6)).as("p1"),
        when(n2 > 0, round(x2.cast("double") / n2, 6)).as("p2"),
        when(zOk,
          round((x1.cast("double") / n1 - x2.cast("double") / n2)
            / sqrt(pPool * (lit(1.0) - pPool)
              * (lit(1.0) / n1 + lit(1.0) / n2)), 6)).as("z"))
    },

    // cohort LTV curve: users cohorted by first-event week, cumulative
    // purchase value per cohort member by age-in-weeks. The classic
    // growth-accounting table: one exchange on user_id for the first
    // event, a (cohort, age) census for the value rollup, a cumulative
    // window over census rows, and a FIXED per-cohort denominator
    // (cohort size), so curves are comparable across cohorts.
    Q("ltv_curve",
      """WITH f AS (SELECT user_id, MIN(epoch_us(ts) // 86400000000) AS first_day
        |  FROM events GROUP BY 1),
        |coh AS (SELECT user_id, first_day // 7 AS cohort_week FROM f),
        |cs AS (SELECT cohort_week, COUNT(*) AS n_users FROM coh GROUP BY 1),
        |pv AS (SELECT e.user_id, c.cohort_week,
        |    (epoch_us(e.ts) // 86400000000 - c2.first_day) // 7 AS age_week,
        |    CAST(CAST(e.value AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
        |  FROM events e JOIN coh c ON e.user_id = c.user_id
        |  JOIN f c2 ON e.user_id = c2.user_id
        |  WHERE e.event_type = 'purchase'),
        |a AS (SELECT cohort_week, age_week, CAST(SUM(c) AS BIGINT) AS cents
        |  FROM pv GROUP BY 1, 2),
        |w AS (SELECT cohort_week, age_week, cents,
        |    CAST(SUM(cents) OVER (PARTITION BY cohort_week ORDER BY age_week
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
        |  FROM a)
        |SELECT w.cohort_week, w.age_week, cs.n_users,
        |  round(CAST(w.cum_cents AS DOUBLE) / cs.n_users / 100.0, 6) AS ltv_per_user
        |FROM w JOIN cs ON w.cohort_week = cs.cohort_week
        |ORDER BY w.cohort_week, w.age_week""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.types.DecimalType
      val ev = Tables.load(s, dir, "events")
      val f = ev.groupBy("user_id")
        .agg(min(expr("unix_micros(ts) div 86400000000L")).as("first_day"))
        .withColumn("cohort_week", expr("first_day div 7"))
      val cs = f.groupBy("cohort_week").agg(count(lit(1)).as("n_users"))
      val a = ev.filter(col("event_type") === "purchase")
        .join(f, "user_id")
        .select(col("cohort_week"),
          expr("(unix_micros(ts) div 86400000000L - first_day) div 7").as("age_week"),
          (col("value").cast(DecimalType(12, 2)) * 100).cast("long").as("c"))
        .groupBy("cohort_week", "age_week")
        .agg(sum(col("c")).cast("long").as("cents"))
      val cum = Window.partitionBy("cohort_week").orderBy("age_week")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      a.withColumn("cum_cents", sum(col("cents")).over(cum).cast("long"))
        .join(broadcast(cs), "cohort_week")
        .select(col("cohort_week"), col("age_week"), col("n_users"),
          round(col("cum_cents").cast("double") / col("n_users") / 100.0, 6)
            .as("ltv_per_user"))
        .orderBy("cohort_week", "age_week")
    },

    // last-touch attribution: every purchase credits the user's most
    // recent PRIOR click-or-view (the as-of composition the generic
    // AsOf operator provides), rolled to an attribution census per
    // touch type — 'none' collects purchases with no prior touch. The
    // as-of join is the union-sort trick: one exchange per side, no
    // per-user quadratic interval scan.
    Q("last_touch_attribution",
      """WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
        |t AS (SELECT * FROM events WHERE event_type IN ('click', 'view')),
        |j AS (SELECT p.value AS v, t.event_type AS touch
        |  FROM p ASOF LEFT JOIN t ON p.user_id = t.user_id AND p.ts >= t.ts)
        |SELECT COALESCE(touch, 'none') AS touch_type, COUNT(*) AS n_purchases,
        |  CAST(CAST(SUM(CAST(v AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total_value
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.types.DecimalType
      val ev = Tables.load(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
      val touches = ev.filter(col("event_type").isin("click", "view"))
        .withColumnRenamed("event_type", "touch")
      graft.ops.AsOf.join(purchases, touches, "user_id", "ts", Seq("touch"))
        .groupBy(coalesce(col("right_touch"), lit("none")).as("touch_type"))
        .agg(count(lit(1)).as("n_purchases"),
          sum(col("value").cast(DecimalType(12, 2)))
            .cast(DecimalType(18, 2)).cast("double").as("total_value"))
        .orderBy("touch_type")
    }
  )
}
