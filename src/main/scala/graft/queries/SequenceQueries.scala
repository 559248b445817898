package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.plans.TopKPerGroup

/** Event-sequence analytics over `events` — the order-sensitive half of
  * behavioral analysis (reference analogue: the per-key ordered
  * processing a Kafka Streams topology gets for free from partition
  * order, cf. `KafkaStreamApp.java:137-172`; here the order is
  * reconstructed per user with ONE window sort and every downstream
  * statistic derives from that single pass).
  *
  * Shared scale shape: all four queries prune to the few columns they
  * need, spend exactly one hash exchange on `user_id` for the per-user
  * ordering (or none at all for the map-side JSON extraction), and
  * aggregate down to type-cardinality-bounded outputs (|event_type| = 5
  * in the driver fixtures, so transition matrices are ≤ 25 rows and
  * path tables ≤ 125) — nothing row-scale ever reaches a second
  * exchange, which is what lets the same plans run at 100 TB.
  */
object SequenceQueries {

  def all: Seq[Q] = Seq(

    // First-order Markov transition matrix over per-user event streams:
    // P(next | prev) with exact counts. One exchange on user_id for the
    // lag; the (prev, next) aggregate is map-side-combined down to at
    // most |types|^2 rows, so the trailing probability window runs on a
    // handful of rows regardless of input scale.
    Q("markov_transitions",
      """WITH o AS (
        |  SELECT event_type AS next_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |  FROM events),
        |t AS (SELECT prev_type, next_type, COUNT(*) AS n FROM o
        |      WHERE prev_type IS NOT NULL GROUP BY 1, 2)
        |SELECT prev_type, next_type, CAST(n AS BIGINT) AS n,
        |  round(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY prev_type), 6) AS p
        |FROM t ORDER BY prev_type, next_type""".stripMargin) { (s, dir) =>
      val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val t = Tables.load(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("next_type"))
        .withColumn("prev_type", lag(col("next_type"), 1).over(byUser))
        .filter(col("prev_type").isNotNull)
        .groupBy("prev_type", "next_type").agg(count(lit(1)).as("n"))
      t.select(col("prev_type"), col("next_type"), col("n"),
          round(col("n").cast("double")
            / sum(col("n")).over(Window.partitionBy("prev_type")), 6).as("p"))
        .orderBy("prev_type", "next_type")
    },

    // Top entry paths: each user's first three events as a ">"-joined
    // path, counted across users. The per-user first-3 runs on the
    // custom TopKPerGroupExec — bounded per-task heaps prune to ≤ 3
    // rows per user BEFORE the exchange-side sort, where the
    // row_number() window form would shuffle-sort every event. The
    // path assembly then folds ≤ 3 structs per user (array_sort on the
    // rank makes collect_list's arrival order irrelevant — same
    // determinism discipline as collect_sources).
    Q("event_paths",
      """WITH r AS (SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |p AS (SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
        |      FROM r WHERE rn <= 3 GROUP BY user_id)
        |SELECT path, COUNT(*) AS n_users FROM p GROUP BY path
        |ORDER BY n_users DESC, path""".stripMargin) { (s, dir) =>
      val first3 = TopKPerGroup(
        Tables.load(s, dir, "events")
          .select("user_id", "ts", "event_id", "event_type"),
        Seq("user_id"), Seq(("ts", false), ("event_id", false)), k = 3)
      first3.groupBy("user_id")
        .agg(array_join(
          transform(array_sort(collect_list(struct(col("rn"), col("event_type")))),
            (x: Column) => x.getField("event_type")), ">").as("path"))
        .groupBy("path").agg(count(lit(1)).as("n_users"))
        .orderBy(col("n_users").desc, col("path"))
    },

    // Inter-arrival gap statistics per event type: the time since the
    // same user's previous event (any type), aggregated by the type of
    // the LATER event. Sums are exact (DECIMAL over integral micros —
    // a double sum would be row-order-dependent); the average divides
    // the exact sum once at the end.
    Q("gap_stats",
      """WITH o AS (SELECT event_type,
        |    epoch_us(ts) - lag(epoch_us(ts))
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        |  FROM events)
        |SELECT event_type, COUNT(*) AS n_gaps,
        |  CAST(SUM(CAST(gap_us AS DECIMAL(20,0))) AS BIGINT) AS total_us,
        |  CAST(MIN(gap_us) AS BIGINT) AS min_us,
        |  CAST(MAX(gap_us) AS BIGINT) AS max_us,
        |  round(CAST(SUM(CAST(gap_us AS DECIMAL(20,0))) AS DOUBLE) / COUNT(*) / 1e6, 6) AS avg_s
        |FROM o WHERE gap_us IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.load(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("gap_us",
          unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(byUser))
        .filter(col("gap_us").isNotNull)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_gaps"),
          sum(col("gap_us").cast(DecimalType(20, 0))).cast("long").as("total_us"),
          min(col("gap_us")).as("min_us"),
          max(col("gap_us")).as("max_us"),
          round(sum(col("gap_us").cast(DecimalType(20, 0))).cast("double")
            / count(lit(1)) / lit(1e6), 6).as("avg_s"))
        .orderBy("event_type")
    },

    // Typed extraction from the semi-structured `props` JSON column —
    // the "sidecar metadata" pattern (every event log carries one).
    // get_json_object is a pure column expression: the whole query is
    // map-side work plus ONE bounded aggregate exchange (10 buckets);
    // no window, no join, no per-user clustering needed.
    // Bucketing is floor(k/10) on BOTH engines (not DuckDB '//' vs
    // Spark 'div', which disagree for negative k: floor vs truncation
    // toward zero), and the ORDER BY pins NULLS FIRST (Spark's asc
    // default; DuckDB defaults NULLS LAST) so a missing '$.k' key
    // cannot reorder the two results.
    Q("props_extract",
      """SELECT CAST(floor(CAST(json_extract_string(props, '$.k') AS BIGINT) / 10) AS BIGINT) AS k_bucket,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .select(col("props"), col("value"))
        .withColumn("k_bucket",
          floor(expr("CAST(get_json_object(props, '$.k') AS BIGINT)") / 10))
        .groupBy("k_bucket")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(12, 2))).cast("double").as("sum_value"))
        .orderBy("k_bucket")
    },

    // HITS HUBS & AUTHORITIES (Kleinberg '99) over the DIRECTED
    // event-transition graph — pagerank_dups' directed sibling on the
    // behavioral side: an event type is a strong HUB when it leads
    // into types users converge on, a strong AUTHORITY when many
    // types funnel into it (markov_transitions gives the local
    // conditional view; HITS gives the global spectral one). Three
    // mutual-reinforcement iterations on the ≤|types|² transition
    // census with the pagerank float discipline: every weighted sum
    // is exact (BIGINT weight × DECIMAL(18,9) score), each iterate is
    // L1-normalized with ONE identically-written double division and
    // re-quantized to 9 dp — aggregation-order-free on both engines.
    // Scale: the corpus collapses to the transition census in one
    // window pass; all iterations run on that census.
    Q("hits_scores", {
      val iterCtes = (1 to 3).map { k =>
        s"""hr$k AS (SELECT e.u AS n, SUM(e.w * a.a) AS s
           |  FROM e JOIN a${k - 1} a ON e.v = a.n GROUP BY 1),
           |hn$k AS (SELECT SUM(s) AS t FROM hr$k),
           |h$k AS (SELECT n, CAST(round(CAST(s AS DOUBLE) / CAST(t AS DOUBLE), 9)
           |    AS DECIMAL(18,9)) AS h FROM hr$k, hn$k),
           |ar$k AS (SELECT e.v AS n, SUM(e.w * h.h) AS s
           |  FROM e JOIN h$k h ON e.u = h.n GROUP BY 1),
           |an$k AS (SELECT SUM(s) AS t FROM ar$k),
           |a$k AS (SELECT n, CAST(round(CAST(s AS DOUBLE) / CAST(t AS DOUBLE), 9)
           |    AS DECIMAL(18,9)) AS a FROM ar$k, an$k)""".stripMargin
      }.mkString(",\n")
      s"""WITH o AS (
         |  SELECT event_type AS next_type,
         |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         |      AS prev_type
         |  FROM events),
         |e AS (SELECT prev_type AS u, next_type AS v, CAST(COUNT(*) AS BIGINT) AS w
         |      FROM o WHERE prev_type IS NOT NULL GROUP BY 1, 2),
         |nodes AS (SELECT u AS n FROM e UNION SELECT v FROM e),
         |a0 AS (SELECT n, CAST(1.0 AS DECIMAL(18,9)) AS a FROM nodes),
         |$iterCtes
         |SELECT nodes.n AS event_type,
         |  COALESCE(CAST(h3.h AS DOUBLE), 0.0) AS hub,
         |  COALESCE(CAST(a3.a AS DOUBLE), 0.0) AS authority
         |FROM nodes LEFT JOIN h3 ON nodes.n = h3.n
         |LEFT JOIN a3 ON nodes.n = a3.n
         |ORDER BY event_type""".stripMargin
    }) { (s, dir) =>
      val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val e = Tables.load(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("v"))
        .withColumn("u", lag(col("v"), 1).over(byUser))
        .filter(col("u").isNotNull)
        .groupBy("u", "v").agg(count(lit(1)).cast("long").as("w"))
        .localCheckpoint(true) // the census feeds all 6 iteration joins
      val nodes = e.select(col("u").as("n"))
        .union(e.select(col("v").as("n"))).distinct()
      var a = nodes.select(col("n"), lit(1.0).cast(DecimalType(18, 9)).as("a"))
      var h: org.apache.spark.sql.DataFrame = null
      for (_ <- 1 to 3) {
        // each iterate is checkpointed: the normalizer agg and the
        // next level both consume it, and an uncheckpointed chain
        // recompiles the whole upstream TWICE per level (2^6 blowup —
        // measured 4.4 s -> sub-second at sf0.1). The iterate is
        // |types| rows, so the materialization is free.
        val hr = e.join(a, e("v") === a("n"))
          .groupBy(e("u").as("n")).agg(sum(col("w") * col("a")).as("s"))
          .localCheckpoint(true)
        val hn = hr.agg(sum(col("s")).as("t"))
        h = hr.crossJoin(broadcast(hn)).select(col("n"),
          round(col("s").cast("double") / col("t").cast("double"), 9)
            .cast(DecimalType(18, 9)).as("h"))
        val ar = e.join(h, e("u") === h("n"))
          .groupBy(e("v").as("n")).agg(sum(col("w") * col("h")).as("s"))
          .localCheckpoint(true)
        val an = ar.agg(sum(col("s")).as("t"))
        a = ar.crossJoin(broadcast(an)).select(col("n"),
          round(col("s").cast("double") / col("t").cast("double"), 9)
            .cast(DecimalType(18, 9)).as("a"))
      }
      nodes.join(h.toDF("n", "h"), Seq("n"), "left")
        .join(a.toDF("n", "a"), Seq("n"), "left")
        .select(col("n").as("event_type"),
          coalesce(col("h").cast("double"), lit(0.0)).as("hub"),
          coalesce(col("a").cast("double"), lit(0.0)).as("authority"))
        .orderBy("event_type")
    }
  )
}
