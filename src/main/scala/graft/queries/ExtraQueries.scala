package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.functions.{CountMinSketchAgg, WeightedMean}
import graft.functions.PortableHash.{duckH32, h32}

/** Remaining extension-point operators: table-generating explode
  * (the UDTF surface, SURVEY §2.7), pivot, exact interpolated
  * percentiles, and a typed `Aggregator`.
  */
object ExtraQueries {

  /** TIE-SAFE two-sided rank check for the sketch tolerance gates
    * (approx_percentiles, kll_windowed): the estimate's rank interval
    * [frac(< est), frac(<= est)] must overlap [p - eps, p + eps].
    * The one-sided |frac(< est) - p| form fails spuriously when a
    * mass of values ties AT the (correct) estimate — frac(<) drops to
    * the tie group's floor; the interval form is the standard fix.
    */
  private def rankWithin(value: org.apache.spark.sql.Column, p: Double,
      estCol: String, eps: org.apache.spark.sql.Column) =
    (avg((value < col(estCol)).cast("int")) <= lit(p) + eps) &&
      (avg((value <= col(estCol)).cast("int")) >= lit(p) - eps)

  def all: Seq[Q] = Seq(

    // Generator / UDTF surface: tokenize via explode, then aggregate —
    // term frequency + document frequency per token
    Q("tokenize_explode",
      """SELECT token, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY token ORDER BY token""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
        .orderBy("token")
    },

    // pivot: order counts by status per priority (explicit value list;
    // na.fill(0) aligns empty cells with DuckDB's FILTER-count 0)
    Q("pivot_status",
      """SELECT o_orderpriority,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0, Seq("F", "O", "P"))
        .orderBy("o_orderpriority")
    },

    // exact interpolated percentiles, computed as ONE sort-based pass:
    // rank every row per group (spillable sort), then pick the floor/
    // ceil rows of each target position pos = p*(n-1) and interpolate
    // with Spark percentile()'s own two-sided formula
    // (higher-pos)*v_lo + (pos-lower)*v_hi — which bit-matches DuckDB
    // quantile_cont (verified empirically on this data). Unlike the
    // builtin percentile() aggregate — whose buffer holds EVERY value
    // of a group in one reducer's memory, three times over for three
    // ps — this sorts once, spills to disk if needed, and aggregates
    // only 9 scalars per group: the shape that survives a 100 TB group.
    Q("percentiles",
      """SELECT l_returnflag,
        |  quantile_cont(l_extendedprice, 0.25) AS p25,
        |  quantile_cont(l_extendedprice, 0.50) AS p50,
        |  quantile_cont(l_extendedprice, 0.75) AS p75
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.Column
      import org.apache.spark.sql.expressions.Window
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_extendedprice"))
      // one exchange: rank and group-count share the same partitioning,
      // so the unordered full-frame count adds no shuffle (and no
      // second scan of the table)
      val w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
      val wAll = Window.partitionBy("l_returnflag")
      val ranked = li
        .withColumn("__i", row_number().over(w).cast("double") - 1)
        .withColumn("__n", count(lit(1)).over(wAll))
      val ps = Seq(0.25 -> "p25", 0.50 -> "p50", 0.75 -> "p75")
      val aggs: Seq[Column] = ps.flatMap { case (p, a) =>
        val pos = lit(p) * (col("__n") - 1).cast("double")
        Seq(
          max(when(col("__i") === floor(pos), col("l_extendedprice"))).as(s"__lo_$a"),
          max(when(col("__i") === ceil(pos), col("l_extendedprice"))).as(s"__hi_$a"),
          max(pos).as(s"__pos_$a"))
      }
      def interp(a: String): Column = {
        val pos = col(s"__pos_$a")
        when(floor(pos) === ceil(pos), col(s"__lo_$a"))
          .otherwise((ceil(pos) - pos) * col(s"__lo_$a")
            + (pos - floor(pos)) * col(s"__hi_$a"))
      }
      ranked.groupBy("l_returnflag")
        .agg(aggs.head, aggs.tail: _*)
        .select(col("l_returnflag") +: ps.map { case (_, a) => interp(a).as(a) }: _*)
        .orderBy("l_returnflag")
    },

    // Mergeable KLL-style quantile sketch — the SCALE twin of the
    // exact `percentiles` query (which needs a full per-group sort) —
    // with a TOLERANCE oracle: the sketch values are engine-specific,
    // so the query OUTPUTS the rank-error contract instead. For each
    // estimate it re-ranks the value against the group (share of
    // values strictly below it, same rule as QuantileSketchSpec) and
    // asserts |rank - p| <= 3% (the k=256 bound the spec proves); the
    // oracle expects TRUE across the board. The re-rank is one extra
    // aggregate over a broadcast of the |groups|-row estimate table —
    // census-sized, scale-safe; the exact `percentiles` query remains
    // the value oracle for the quantity itself.
    Q("approx_percentiles",
      """SELECT l_returnflag,
        |  TRUE AS within_eps_p25, TRUE AS within_eps_p50, TRUE AS within_eps_p75
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      import graft.functions.QuantileSketchAgg
      val li = Tables.load(s, dir, "lineitem")
        .select("l_returnflag", "l_extendedprice")
      val est = Tables.parallelize(li)
        .groupBy("l_returnflag")
        .agg(QuantileSketchAgg(col("l_extendedprice"), 256,
          Seq(0.25, 0.50, 0.75)).as("qs"))
        .select(col("l_returnflag").as("rf"),
          element_at(col("qs"), 1).as("p25_est"),
          element_at(col("qs"), 2).as("p50_est"),
          element_at(col("qs"), 3).as("p75_est"))
      li.join(broadcast(est), col("l_returnflag") === col("rf"))
        .groupBy("l_returnflag")
        .agg(
          rankWithin(col("l_extendedprice"), 0.25, "p25_est", lit(0.03))
            .as("within_eps_p25"),
          rankWithin(col("l_extendedprice"), 0.50, "p50_est", lit(0.03))
            .as("within_eps_p50"),
          rankWithin(col("l_extendedprice"), 0.75, "p75_est", lit(0.03))
            .as("within_eps_p75"))
        .orderBy("l_returnflag")
    },

    // TypedImperativeAggregate: Count-Min sketch with point estimates
    // for fixed probe items — oracle recomputes each probe's d buckets
    // as least() of filtered counts (sketch estimate == min of the
    // probe's counters by construction)
    Q("cms_sketch", {
      val D = 4; val W = 1024
      val probes = Seq("1", "7", "42")
      val ests = probes.map { p =>
        val sums = (0 until D).map { r =>
          s"SUM(CASE WHEN ${duckH32(r, "CAST(l_partkey AS VARCHAR)")} % $W = ${CountMinSketchAgg.bucket(r, p, W)} THEN 1 ELSE 0 END)"
        }
        // DuckDB SUM over integers is HUGEINT; cast back to BIGINT to
        // match Spark's int64 output in the typed hash compare
        s"CAST(least(${sums.mkString(", ")}) AS BIGINT) AS est_$p"
      }
      s"""SELECT l_returnflag, ${ests.mkString(", ")}
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    }) { (s, dir) =>
      val D = 4; val W = 1024
      val probes = Seq("1", "7", "42")
      // the per-row md5 bucket hashing runs map-side before the agg
      // exchange — parallelize the narrow projection
      Tables.parallelize(Tables.load(s, dir, "lineitem")
          .select("l_returnflag", "l_partkey"))
        .groupBy("l_returnflag")
        .agg(CountMinSketchAgg(col("l_partkey").cast("string"), D, W).as("sk"))
        .select(col("l_returnflag") +: probes.map { p =>
          least((0 until D).map(r =>
            element_at(col("sk"), r * W + CountMinSketchAgg.bucket(r, p, W) + 1)): _*)
            .as(s"est_$p")
        }: _*)
        .orderBy("l_returnflag")
    },

    // Corpus SNAPSHOT DIFF — the audit step between two versions of a
    // training corpus: classify every doc as added / removed / changed
    // / unchanged by comparing content hashes across a full-outer join
    // on doc_id. Only (doc_id, md5) pairs shuffle — document bodies
    // never leave their scan. Snapshots are simulated from the fixture
    // by the train_split hash rule: old = bucket < 95, new = bucket >=
    // 5, and buckets [40,45) get edited text in the new snapshot.
    Q("corpus_diff", {
      val h = duckH32("CAST(doc_id AS VARCHAR)")
      s"""WITH s AS (SELECT doc_id, $h % 100 AS bucket, text FROM documents),
         |a AS (SELECT doc_id, md5(text) AS h FROM s WHERE bucket < 95),
         |b AS (SELECT doc_id, md5(CASE WHEN bucket >= 40 AND bucket < 45
         |        THEN text || ' v2' ELSE text END) AS h
         |      FROM s WHERE bucket >= 5),
         |d AS (SELECT CASE WHEN a.doc_id IS NULL THEN 'added'
         |        WHEN b.doc_id IS NULL THEN 'removed'
         |        WHEN a.h <> b.h THEN 'changed'
         |        ELSE 'unchanged' END AS status
         |      FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
         |SELECT status, COUNT(*) AS n FROM d GROUP BY status
         |ORDER BY status""".stripMargin
    }) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text"),
          (h32(col("doc_id").cast("string")) % 100).as("bucket"))
      // presence markers, NOT hash nullness, decide added/removed —
      // md5(NULL text) is null while the doc exists in both snapshots
      // (the oracle branches on doc_id nullness; `ha <> hb` on two
      // nulls is null and falls through to 'unchanged' on both engines)
      val a = docs.filter(col("bucket") < 95)
        .select(col("doc_id"), md5(col("text")).as("ha"), lit(true).as("in_a"))
      val b = docs.filter(col("bucket") >= 5)
        .select(col("doc_id"),
          md5(when(col("bucket") >= 40 && col("bucket") < 45,
            concat(col("text"), lit(" v2"))).otherwise(col("text"))).as("hb"),
          lit(true).as("in_b"))
      a.join(b, Seq("doc_id"), "full_outer")
        .select(when(col("in_a").isNull, "added")
          .when(col("in_b").isNull, "removed")
          .when(col("ha") =!= col("hb"), "changed")
          .otherwise("unchanged").as("status"))
        .groupBy("status").agg(count(lit(1)).as("n"))
        .orderBy("status")
    },

    // CMS heavy-hitter JOIN GUARD per tumbling window: the same sketch
    // as cms_sketch but windowed over the event stream — the shape a
    // streaming pipeline uses to pick next period's salted/broadcast
    // key list without O(distinct keys) state. Shared implementation
    // with the watermarked streaming path (WindowedAggs.windowedCms;
    // StreamingSpec pins streaming==batch parity with late arrivals);
    // oracle recomputes each probe's d bucket counters per hour.
    Q("cms_windowed", {
      val D = 4; val W = 1024
      val probes = Seq("click", "error")
      val ests = probes.map { p =>
        val sums = (0 until D).map { r =>
          s"SUM(CASE WHEN ${duckH32(r, "event_type")} % $W = ${CountMinSketchAgg.bucket(r, p, W)} THEN 1 ELSE 0 END)"
        }
        s"CAST(least(${sums.mkString(", ")}) AS BIGINT) AS est_$p"
      }
      s"""SELECT date_trunc('hour', ts) AS w_start, ${ests.mkString(", ")}
         |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
    }) { (s, dir) =>
      graft.streaming.WindowedAggs.windowedCms(
        Tables.load(s, dir, "events"), "event_type",
        Seq("click", "error"), 4, 1024)
        .orderBy("w_start")
    },

    // Windowed KLL quantiles — the quantile twin of cms_windowed: one
    // mergeable sketch per hour window (the streaming latency-
    // percentile dashboard), shared implementation with the
    // watermarked streaming path (WindowedAggs.windowedQuantiles;
    // StreamingSpec pins streaming==batch estimate parity in the
    // exact sub-k regime). Sketch internals differ per engine, so
    // like approx_percentiles the gate carries the TOLERANCE contract:
    // each estimate re-ranks against its own window and must sit
    // within eps = 3% + 3/n of its target rank (3% is the proven
    // k=256 bound; 3/n covers small-window rank granularity and the
    // fixture's duplicate values) — the oracle expects TRUE across
    // every window. The re-rank joins events to the broadcast
    // 720-row estimate table: census-sized, scale-safe.
    Q("kll_windowed",
      """SELECT date_trunc('hour', ts) AS w_start, COUNT(*) AS n_events,
        |  TRUE AS within_eps_p25, TRUE AS within_eps_p50, TRUE AS within_eps_p75
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val ev = Tables.load(s, dir, "events").select("ts", "value")
      val est = graft.streaming.WindowedAggs.windowedQuantiles(
        ev, "value", 256, Seq(0.25, 0.50, 0.75))
      val withHour = ev.select(date_trunc("hour", col("ts")).as("w_start"),
        col("value"))
      def eps = lit(0.03) + lit(3.0) / count(lit(1))
      withHour.join(broadcast(est), "w_start")
        .groupBy("w_start")
        .agg(count(lit(1)).as("n_events"),
          rankWithin(col("value"), 0.25, "p25_est", eps).as("within_eps_p25"),
          rankWithin(col("value"), 0.50, "p50_est", eps).as("within_eps_p50"),
          rankWithin(col("value"), 0.75, "p75_est", eps).as("within_eps_p75"))
        .orderBy("w_start")
    },

    // Windowed HLL distinct — the third member of the windowed sketch
    // trio (cms_windowed counts, kll_windowed quantiles, this one
    // cardinalities): per-hour approximate distinct users through the
    // SAME implementation as the watermarked streaming path
    // (WindowedAggs.windowedDistinct; StreamingSpec pins EXACT
    // streaming==batch estimate parity — HLL's register-max merge is
    // arrival-order-invariant by algebra). Gate contract as in
    // approx_distinct — exact count + an error-bound boolean, TRUE
    // across all 720 windows — but the windows are TINY (4-30 users),
    // where HLL++'s dense registers carry O(1) ABSOLUTE error that
    // dwarfs 3·rsd·n: the bound is 3·rsd·n + 4 (measured max |err| on
    // the fixture is 3; the relative term takes over as windows grow).
    Q("hll_windowed",
      """SELECT date_trunc('hour', ts) AS w_start,
        |  COUNT(DISTINCT user_id) AS exact_users, TRUE AS within_bound
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val ev = Tables.load(s, dir, "events").select("ts", "user_id")
      val est = graft.streaming.WindowedAggs.windowedDistinct(
        ev, "user_id", 0.05)
      ev.select(date_trunc("hour", col("ts")).as("w_start"), col("user_id"))
        .groupBy("w_start")
        .agg(countDistinct(col("user_id")).as("exact_users"))
        .join(broadcast(est), "w_start")
        .select(col("w_start"), col("exact_users"),
          (abs(col("approx_keys") - col("exact_users"))
            <= lit(3 * 0.05) * col("exact_users") + 4).as("within_bound"))
        .orderBy("w_start")
    },

    // MERGEABLE HLL SOURCE-OVERLAP ESTIMATE — the sketch algebra that
    // makes cross-corpus overlap auditing cheap at 100 TB: build ONE
    // DataSketches HLL per source over its distinct shingle set
    // (|sources| tiny sketches, one corpus pass), then estimate every
    // pairwise overlap by inclusion-exclusion est(A) + est(B) −
    // est(A ∪ B) where the union is a SKETCH MERGE (hll_union) — no
    // re-scan per pair, unlike source_overlap's exact banded join.
    // Tolerance-oracle contract (the approx_distinct pattern): the
    // query outputs the exact counts plus a boolean asserting the
    // I-E estimate landed within 0.25·(|A|+|B|) + 8 of the exact
    // overlap (3σ on the three-sketch difference is ≈0.21·(|A|+|B|)
    // at lgK=12; +8 absorbs small-count promotion effects), and the
    // oracle expects exact + TRUE everywhere.
    Q("hll_overlap_est",
      """WITH arr AS (SELECT doc_id, source, string_split(text, ' ') AS a FROM documents),
        |sh0 AS (SELECT source, unnest(list_transform(generate_series(1, len(a)-2),
        |        i -> a[i] || ' ' || a[i+1] || ' ' || a[i+2])) AS w FROM arr),
        |sh AS (SELECT DISTINCT source, w FROM sh0),
        |cnt AS (SELECT source, COUNT(*) AS n FROM sh GROUP BY 1),
        |ov AS (SELECT x.source AS sa, y.source AS sb, COUNT(*) AS ovl
        |       FROM sh x JOIN sh y ON x.w = y.w AND x.source < y.source
        |       GROUP BY 1, 2)
        |SELECT a.source AS source_a, b.source AS source_b,
        |  a.n AS exact_a, b.n AS exact_b,
        |  COALESCE(ovl, 0) AS exact_overlap, TRUE AS within_bound
        |FROM cnt a JOIN cnt b ON a.source < b.source
        |LEFT JOIN ov ON a.source = ov.sa AND b.source = ov.sb
        |ORDER BY source_a, source_b""".stripMargin) { (s, dir) =>
      val sh = Tables.parallelizeByRange(Tables.load(s, dir, "documents")
          .select("doc_id", "source", "text"), col("doc_id"))
        .select(col("source"),
          explode(graft.ops.Dedup.shingles(col("text"))).as("w"))
        .distinct()
        .localCheckpoint(true) // feeds sketches AND the exact-overlap join
      val sk = sh.groupBy("source")
        .agg(hll_sketch_agg(col("w"), 12).as("sk"), count(lit(1)).as("n"))
      val ov = sh.as("x")
        .join(sh.as("y"),
          col("x.w") === col("y.w") && col("x.source") < col("y.source"))
        .groupBy(col("x.source").as("sa"), col("y.source").as("sb"))
        .agg(count(lit(1)).as("ovl"))
      val estA = hll_sketch_estimate(col("a.sk"))
      val estB = hll_sketch_estimate(col("b.sk"))
      val estU = hll_sketch_estimate(hll_union(col("a.sk"), col("b.sk")))
      sk.as("a").join(sk.as("b"), col("a.source") < col("b.source"))
        .join(ov, col("a.source") === col("sa") && col("b.source") === col("sb"),
          "left")
        .na.fill(0, Seq("ovl"))
        .select(col("a.source").as("source_a"), col("b.source").as("source_b"),
          col("a.n").as("exact_a"), col("b.n").as("exact_b"),
          col("ovl").as("exact_overlap"),
          (abs((estA + estB - estU) - col("ovl")) <=
            lit(0.25) * (col("a.n") + col("b.n")) + 8).as("within_bound"))
        .orderBy("source_a", "source_b")
    },

    // Two-stage salted aggregation (heavy-hitter mitigation): stage 1
    // spreads each key over 16 salt buckets, stage 2 merges partials —
    // a hot key occupies 16 reducers instead of serializing one.
    // Decimal-exact, so the oracle is the plain GROUP BY.
    Q("salted_agg",
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      graft.ops.Skew.saltedSumCount(
          Tables.load(s, dir, "lineitem").select("l_returnflag", "l_quantity"),
          Seq("l_returnflag"),
          col("l_quantity").cast(DecimalType(12, 2)), 16)
        .select(col("l_returnflag"),
          col("sum_value").cast("double").as("sum_value"), col("n"))
        .orderBy("l_returnflag")
    },

    // Data-quality constraint audit (the deequ-style pre-training
    // gate): each rule is ONE aggregate over a scan or a pre-shrunk
    // join — violations counted, not rows materialized. Key uniqueness
    // checks group on the key (count>1 groups); the FK check anti-joins
    // against the broadcast dimension; range/set checks are map-side
    // conditional counts. All rules over one table share a single scan.
    Q("dq_checks",
      """SELECT rule, violations FROM (
        |  SELECT 'orders_pk_unique' AS rule,
        |    (SELECT COUNT(*) FROM (SELECT o_orderkey FROM orders
        |      GROUP BY o_orderkey HAVING COUNT(*) > 1)) AS violations
        |  UNION ALL SELECT 'orders_fk_customer',
        |    (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS
        |      (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        |  UNION ALL SELECT 'lineitem_discount_range',
        |    (SELECT COUNT(*) FROM lineitem
        |     WHERE l_discount < 0.0 OR l_discount > 1.0)
        |  UNION ALL SELECT 'lineitem_returnflag_domain',
        |    (SELECT COUNT(*) FROM lineitem
        |     WHERE l_returnflag NOT IN ('R', 'A', 'N'))
        |  UNION ALL SELECT 'orders_date_not_null',
        |    (SELECT COUNT(*) FROM orders WHERE o_orderdate IS NULL)
        |) ORDER BY rule""".stripMargin) { (s, dir) =>
      val orders = Tables.load(s, dir, "orders")
      val li = Tables.load(s, dir, "lineitem")
      val pkDupes = orders.groupBy("o_orderkey").count()
        .filter(col("count") > 1)
        .agg(count(lit(1)).as("violations"))
        .select(lit("orders_pk_unique").as("rule"), col("violations"))
      val fkOrphans = orders
        .join(broadcast(Tables.load(s, dir, "customer").select("c_custkey")),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("violations"))
        .select(lit("orders_fk_customer").as("rule"), col("violations"))
      // the three lineitem/orders scan rules fold into conditional
      // counts over one pass each
      val range = li.agg(
          count(when(col("l_discount") < 0.0 || col("l_discount") > 1.0, 1))
            .as("violations"))
        .select(lit("lineitem_discount_range").as("rule"), col("violations"))
      val domain = li.agg(
          count(when(!col("l_returnflag").isin("R", "A", "N"), 1)).as("violations"))
        .select(lit("lineitem_returnflag_domain").as("rule"), col("violations"))
      val nn = orders.agg(
          count(when(col("o_orderdate").isNull, 1)).as("violations"))
        .select(lit("orders_date_not_null").as("rule"), col("violations"))
      pkDupes.unionAll(fkOrphans).unionAll(range).unionAll(domain).unionAll(nn)
        .orderBy("rule")
    },

    // NOT IN / IN null semantics — the three-valued-logic trap every
    // engine must agree on: one NULL in a NOT IN subquery empties the
    // result (x <> NULL is UNKNOWN, so no row can prove membership-
    // absence), while IN keeps matching rows. Run as one SQL text on
    // both engines; Spark plans the NOT IN as a null-aware anti join.
    Q("null_semantics", ExtraQueries.nullSemanticsSql) { (s, dir) =>
      Tables.load(s, dir, "customer").createOrReplaceTempView("customer")
      Tables.load(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql(ExtraQueries.nullSemanticsSql)
    },

    // FULL OUTER join modality: daily order counts vs daily ship
    // counts — each side genuinely contributes one-sided rows (first
    // order day precedes first ship day; shipping runs months past the
    // last order). Both sides aggregate BEFORE the join (partial agg
    // shrinks them to |distinct days|), and the USING-style join
    // coalesces the key.
    Q("full_outer_daily",
      """WITH od AS (SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n_orders
        |            FROM orders GROUP BY 1),
        |ld AS (SELECT CAST(l_shipdate AS DATE) AS d, COUNT(*) AS n_ships
        |       FROM lineitem GROUP BY 1)
        |SELECT COALESCE(od.d, ld.d) AS d, COALESCE(n_orders, 0) AS n_orders,
        |  COALESCE(n_ships, 0) AS n_ships
        |FROM od FULL OUTER JOIN ld ON od.d = ld.d ORDER BY d""".stripMargin) { (s, dir) =>
      val od = Tables.load(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(count(lit(1)).as("n_orders"))
      val ld = Tables.load(s, dir, "lineitem")
        .groupBy(to_date(col("l_shipdate")).as("d"))
        .agg(count(lit(1)).as("n_ships"))
      od.join(ld, Seq("d"), "full_outer")
        .select(col("d"), coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          coalesce(col("n_ships"), lit(0L)).as("n_ships"))
        .orderBy("d")
    },

    // Bounded window frames — the two frame kinds window_funcs leaves
    // out: a sliding ROWS frame (moving sum over [-2, +1] neighbors)
    // and a value-based RANGE frame (events within the trailing 7
    // days, membership by VALUE so tie order never matters). Both
    // share one (custkey) partitioning; per-partition state is the
    // frame, not the partition.
    Q("window_frames",
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING) AS DOUBLE) AS moving_sum,
        |  COUNT(*) OVER (PARTITION BY o_custkey
        |    ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
        |    RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW) AS n_last_7d
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val wRows = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey")).rowsBetween(-2, 1)
      val wRange = Window.partitionBy("o_custkey")
        .orderBy(unix_timestamp(col("o_orderdate"))).rangeBetween(-604800L, 0L)
      Tables.load(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          sum(col("o_totalprice").cast(DecimalType(12, 2))).over(wRows)
            .cast("double").as("moving_sum"),
          count(lit(1)).over(wRange).as("n_last_7d"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // Salted JOIN over the same hot-key premise: lineitem (big,
    // orderkey-skewed in the adversarial case) joins orders with the
    // orders side replicated x4 and lineitem salted by row position —
    // output provably identical to the plain join, so the oracle IS
    // the plain join. See Skew.saltedJoin for when to prefer this over
    // AQE's adaptive split.
    Q("salted_join",
      """SELECT o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      val l = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey").as("k"), col("l_extendedprice"), col("l_discount"))
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderkey").as("k"), col("o_orderpriority"))
      graft.ops.Skew.saltedJoin(l, o, "k", 4)
        .groupBy("o_orderpriority")
        .agg(sum(col("l_extendedprice").cast(DecimalType(12, 2))
            * (lit(1) - col("l_discount")).cast(DecimalType(4, 2)))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy("o_orderpriority")
    },

    // Bloom-filter pre-filtered semi join: build a bloom filter over the
    // filtered dimension keys (distributed aggregation under
    // df.stat.bloomFilter), pre-filter the fact table map-side — no
    // shuffle, false positives only — then clear the FPs with an exact
    // semi join. At 100 TB this is the pattern that keeps a selective
    // dim filter from forcing a full fact shuffle: the bloom bits ship
    // to every task (like Spark's own runtime row-group filters) and
    // the residual exact join sees ~fpp extra rows. Result is EXACT, so
    // the oracle is the plain EXISTS.
    Q("bloom_semi_join",
      """SELECT l_returnflag, COUNT(*) AS n_lines,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE EXISTS (SELECT 1 FROM part
        |              WHERE p_partkey = l_partkey AND p_size <= 5)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      val keys = Tables.load(s, dir, "part")
        .filter(col("p_size") <= 5).select("p_partkey")
      val bloom = keys.stat.bloomFilter("p_partkey", 100000L, 0.01)
      // codegen'd native probe (graft.functions.BloomMightContain) —
      // a Scala UDF here would box every fact key and split the
      // whole-stage-codegen span on the hottest scan of the plan
      Tables.load(s, dir, "lineitem")
        .filter(graft.functions.BloomMightContain(col("l_partkey"), bloom))
        .join(keys, col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_lines"),
          sum(col("l_extendedprice").cast(DecimalType(12, 2)))
            .cast("double").as("revenue"))
        .orderBy("l_returnflag")
    },

    // typed Aggregator: exact weighted mean (integer-cents buffer)
    Q("typed_weighted_avg",
      """SELECT l_returnflag,
        |  (CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
        |            * CAST(round(l_quantity) AS BIGINT)) AS DOUBLE) / 100.0)
        |    / CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE) AS wavg_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_extendedprice"), col("l_quantity"))
        .as[(String, Double, Double)]
        .groupByKey(_._1)
        .agg(new WeightedMean().toColumn.name("wavg_price"))
        .toDF("l_returnflag", "wavg_price")
        .orderBy("l_returnflag")
    }
  )

  /** One SQL text, two engines (like q17): NULLIF poisons the NOT IN
    * subquery with one NULL — standard semantics make the first count
    * 0; the filtered variant counts 1 (the customer whose only order
    * key was excluded); IN is unaffected for matching keys.
    */
  val nullSemanticsSql: String =
    """SELECT
      | (SELECT COUNT(*) FROM customer
      |  WHERE c_custkey NOT IN (SELECT NULLIF(o_custkey, 7) FROM orders)) AS n_null_poisoned,
      | (SELECT COUNT(*) FROM customer
      |  WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_custkey <> 7)) AS n_filtered,
      | (SELECT COUNT(*) FROM customer
      |  WHERE c_custkey IN (SELECT NULLIF(o_custkey, 7) FROM orders)) AS n_in_with_null""".stripMargin

}
