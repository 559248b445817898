package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Event-time operators over `events` (SURVEY.md §7 M4 "streaming
  * windows", T3): tumbling/sliding windows via Spark's `window()`
  * (identical semantics batch vs Structured Streaming — the streaming
  * variants run in StreamingSpec), time-range self-join, and
  * gaps-and-islands sessionization (the batch twin of
  * `session_window`).
  *
  * events.ts is ns in parquet, floored to µs by Tables.load exactly as
  * DuckDB floors it, so timestamps agree bit-for-bit cross-engine.
  */
object TimeQueries {

  def all: Seq[Q] = Seq(

    // tumbling 1h windows: Spark window() ≙ epoch-aligned date_trunc
    Q("events_tumbling",
      """SELECT date_trunc('hour', ts) AS w_start, event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(12, 2))).cast("double").as("sum_value"))
        .select(col("window.start").as("w_start"), col("event_type"),
          col("n"), col("sum_value"))
        .orderBy("w_start", "event_type")
    },

    // sliding 10min windows every 5min: each event lands in exactly 2
    // epoch-aligned windows — oracle materializes both starts per event
    Q("events_sliding",
      """SELECT w_start, event_type, COUNT(*) AS n
        |FROM (SELECT event_type, unnest([
        |        make_timestamp((epoch_us(ts) // 300000000) * 300000000),
        |        make_timestamp((epoch_us(ts) // 300000000) * 300000000 - 300000000)
        |      ]) AS w_start FROM events)
        |GROUP BY w_start, event_type ORDER BY w_start, event_type""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("w_start"), col("event_type"), col("n"))
        .orderBy("w_start", "event_type")
    },

    // time-range (interval) pair count: same-user event pairs within 5
    // minutes, WITHOUT materializing the pairs. The self-join form (kept
    // below as range_join_pairs_join) inflates to every qualifying pair
    // before aggregating it away — at 100x a hot user's in-window
    // density makes that quadratic in output rows, where this stays
    // O(n log n): one hash exchange on user_id, a local sort, and a
    // RANGE-frame count. Per event a, the frame
    //   [ts_a, ts_a + 5min]  (unix_micros, so the bound is exact)
    // holds every same-user event in the interval INCLUDING a itself
    // and any ts-ties; subtracting a's row_number within its (user, ts)
    // tie group (ordered by event_id) leaves exactly
    //   #{b : ts_a <= ts_b <= ts_a+5min, event_id_b > event_id_a}
    // PRECONDITION (pinned by SequenceSpec "range_join_pairs
    // window-rewrite precondition", which checks all three fixture
    // SFs): per user, event_id order agrees with ts order for distinct
    // ts — true of any log whose ids are assigned at append time. A
    // dataset violating it must use range_join_pairs_join. Under it the
    // per-event counts sum to the join's per-user pair count; users
    // with zero pairs are filtered to match the inner join's output.
    Q("range_join_pairs",
      """SELECT e1.user_id AS user_id, COUNT(*) AS n_pairs
        |FROM events e1 JOIN events e2
        |  ON e1.user_id = e2.user_id
        | AND e2.ts >= e1.ts AND e2.ts <= e1.ts + INTERVAL 5 MINUTE
        | AND e1.event_id < e2.event_id
        |GROUP BY e1.user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      // RANGE (not hash) spread on user_id: RangePartitioning satisfies
      // the windows' clustering, the per-user aggregate's, AND the final
      // global ORDER BY user_id — the whole query runs on this ONE
      // exchange (sampling the bare scan for range bounds is cheap; cf.
      // Tables.parallelizeByRange).
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"))
        .repartitionByRange(col("user_id"))
      val fiveMinMicros = 300L * 1000 * 1000
      val inWindow = Window.partitionBy("user_id")
        .orderBy(unix_micros(col("ts")))
        .rangeBetween(0, fiveMinMicros)
      val tieRank = Window.partitionBy("user_id", "ts").orderBy("event_id")
      ev.select(col("user_id"),
          (count(lit(1)).over(inWindow) - row_number().over(tieRank))
            .as("fwd"))
        .groupBy("user_id")
        .agg(sum(col("fwd")).as("n_pairs"))
        .filter(col("n_pairs") > 0)
        .orderBy("user_id")
    },

    // the same pair count as an explicit interval self-join — the shape
    // a user writes when the PAIRS themselves are the output (sampling
    // qualifying pairs, joining pair attributes). Kept gated alongside
    // the window form so both stay correct; prefer range_join_pairs
    // when only the aggregate is needed.
    Q("range_join_pairs_join",
      """SELECT e1.user_id AS user_id, COUNT(*) AS n_pairs
        |FROM events e1 JOIN events e2
        |  ON e1.user_id = e2.user_id
        | AND e2.ts >= e1.ts AND e2.ts <= e1.ts + INTERVAL 5 MINUTE
        | AND e1.event_id < e2.event_id
        |GROUP BY e1.user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val e1 = ev.as("e1")
      val e2 = ev.as("e2")
      e1.join(e2,
          col("e1.user_id") === col("e2.user_id")
            && col("e2.ts") >= col("e1.ts")
            && col("e2.ts") <= col("e1.ts") + expr("INTERVAL 5 MINUTES")
            && col("e1.event_id") < col("e2.event_id"))
        .groupBy(col("e1.user_id").as("user_id"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("user_id")
    },

    // as-of join: each error event picks up the most recent click at or
    // before it for the same user (union+window composition; oracle is
    // DuckDB's native ASOF LEFT JOIN)
    Q("asof_join",
      """WITH e AS (SELECT * FROM events WHERE event_type = 'error'),
        |c AS (SELECT * FROM events WHERE event_type = 'click')
        |SELECT e.event_id AS err_id, e.user_id AS user_id,
        |       c.event_id AS click_id, c.value AS click_value
        |FROM e ASOF LEFT JOIN c ON e.user_id = c.user_id AND e.ts >= c.ts
        |ORDER BY err_id""".stripMargin) { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val errors = ev.filter(col("event_type") === "error")
      val clicks = ev.filter(col("event_type") === "click")
      graft.ops.AsOf.join(errors, clicks, "user_id", "ts",
          Seq("event_id", "value"))
        .select(col("event_id").as("err_id"), col("user_id"),
          col("right_event_id").as("click_id"),
          col("right_value").as("click_value"))
        .orderBy("err_id")
    },

    // forward as-of: each error picks up the EARLIEST click at or after
    // it (the time-to-next-action pattern; mirrored window composition)
    Q("asof_join_forward",
      """WITH e AS (SELECT * FROM events WHERE event_type = 'error'),
        |c AS (SELECT * FROM events WHERE event_type = 'click')
        |SELECT e.event_id AS err_id, e.user_id AS user_id,
        |       c.event_id AS click_id, c.value AS click_value
        |FROM e ASOF LEFT JOIN c ON e.user_id = c.user_id AND e.ts <= c.ts
        |ORDER BY err_id""".stripMargin) { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val errors = ev.filter(col("event_type") === "error")
      val clicks = ev.filter(col("event_type") === "click")
      graft.ops.AsOf.joinForward(errors, clicks, "user_id", "ts",
          Seq("event_id", "value"))
        .select(col("event_id").as("err_id"), col("user_id"),
          col("right_event_id").as("click_id"),
          col("right_value").as("click_value"))
        .orderBy("err_id")
    },

    // sessionization (30-minute inactivity gap), gaps-and-islands: the
    // deterministic batch equivalent of session_window
    Q("sessionize",
      """WITH o AS (
        |  SELECT user_id, ts, event_id,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |f AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM o),
        |g AS (
        |  SELECT user_id, ts,
        |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS session_id
        |  FROM f)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |  MIN(ts) AS session_start, MAX(ts) AS session_end
        |FROM g GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.load(s, dir, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("is_new",
          when(col("prev_ts").isNull
            || col("ts") - col("prev_ts") > expr("INTERVAL 30 MINUTES"), 1)
            .otherwise(0))
        .withColumn("session_id", sum(col("is_new")).over(w))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"))
        .orderBy("user_id", "session_id")
    },

    // Temporal (point-in-time) dimension join — THE warehouse lookup:
    // every event joined to the dimension state valid AT ITS
    // TIMESTAMP. The dimension here is each user's most recent
    // PURCHASE value band (floor(value/25)): purchase events open
    // half-open validity intervals [ts, next_purchase_ts), and all
    // events LEFT-join to the covering interval (band -1 = no
    // purchase yet), rolled up to the bounded (band, event_type)
    // matrix. The join is the standard Spark shape for validity
    // intervals: an EQUI-join on user_id (one exchange each side)
    // plus the interval predicate as a post-join filter — per-user
    // interval lists are bounded by dimension CHANGES (purchases),
    // so the filter scans a handful of rows per event, and intervals
    // tile [first_purchase, inf) so each event matches at most one
    // (AsOfTieSpec asserts the exactly-once cover). For a dimension
    // whose per-key history is unbounded, the as-of formulation
    // (asof_join: latest change <= ts via one union-sort pass) is
    // the escape hatch — same semantics, no per-key quadratic term.
    Q("temporal_dim_join",
      """WITH p AS (SELECT user_id, ts, event_id,
        |    CAST(floor(CAST(value AS DOUBLE) / 25.0) AS BIGINT) AS band
        |  FROM events WHERE event_type = 'purchase'),
        |i AS (SELECT user_id, band, ts AS valid_from,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        |  FROM p)
        |SELECT COALESCE(i.band, -1) AS purchase_band, e.event_type,
        |  COUNT(*) AS n, COUNT(DISTINCT e.user_id) AS n_users
        |FROM events e LEFT JOIN i ON e.user_id = i.user_id
        |  AND e.ts >= i.valid_from
        |  AND (i.valid_to IS NULL OR e.ts < i.valid_to)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val intervals = Tables.load(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"),
          floor(col("value").cast("double") / 25.0).cast("long").as("band"))
        .select(col("user_id"), col("band"), col("ts").as("valid_from"),
          lead(col("ts"), 1).over(w).as("valid_to"))
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_type"))
      ev.join(intervals,
          ev("user_id") === intervals("user_id")
            && col("ts") >= col("valid_from")
            && (col("valid_to").isNull || col("ts") < col("valid_to")),
          "left")
        .groupBy(coalesce(col("band"), lit(-1L)).as("purchase_band"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          count_distinct(ev("user_id")).as("n_users"))
        .orderBy("purchase_band", "event_type")
    }
  )
}
