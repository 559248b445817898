package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Aggregation / window-function / join / set-op extension operators
  * (SURVEY.md §7 M4 "aggregations", "window functions", "joins beyond
  * J1") over the TPC-H-ish tables.
  *
  * Cross-engine float determinism: every SUM over doubles goes through
  * an exact DECIMAL cast (sums of doubles are order-dependent in the
  * last ulps; decimal sums are exact and associative, so Spark and
  * DuckDB agree bit-for-bit after the final cast back to DOUBLE). The
  * input data is 2-decimal money / integral quantities, so the casts
  * are lossless. Per-row double arithmetic (no reordering) is already
  * deterministic and needs no cast.
  */
object AggQueries {

  private def dec(c: Column, p: Int, s: Int): Column = c.cast(DecimalType(p, s))
  /** Exact decimal sum, surfaced as double. */
  private def sumd(c: Column): Column = sum(c).cast("double")

  def all: Seq[Q] = Seq(

    // TPC-H Q1-style wide aggregation (hash agg with partial/map-side combine)
    Q("q1_agg",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2)) * CAST(1 + l_tax AS DECIMAL(4,2))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      val qty = dec(col("l_quantity"), 12, 2)
      val price = dec(col("l_extendedprice"), 12, 2)
      val oneMinus = dec(lit(1) - col("l_discount"), 4, 2)
      val onePlus = dec(lit(1) + col("l_tax"), 4, 2)
      // the per-row decimal multiplies dominate and sit in the map
      // stage before the agg exchange — parallelize the narrow
      // projection (6 of 16 columns) so they don't run in the one-task
      // scan of the single-row-group fixture
      Tables.parallelize(Tables.load(s, dir, "lineitem")
          .filter(col("l_shipdate") <= lit("2000-09-01").cast("timestamp"))
          .select("l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sumd(qty).as("sum_qty"),
          sumd(price).as("sum_base_price"),
          sumd(price * oneMinus).as("sum_disc_price"),
          sumd(price * oneMinus * onePlus).as("sum_charge"),
          (sumd(qty) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // min/max/exact-distinct aggregates
    Q("agg_stats",
      """SELECT o_orderstatus, COUNT(*) AS n, COUNT(DISTINCT o_custkey) AS n_cust,
        |  MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          countDistinct(col("o_custkey")).as("n_cust"),
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"))
        .orderBy("o_orderstatus")
    },

    // HLL sketch with a TOLERANCE oracle: the raw HLL++ estimate is
    // engine-specific (DuckDB's approx differs by design), so the
    // estimate itself can't be value-compared — instead the query
    // OUTPUTS the error-bound contract: the exact count plus a boolean
    // asserting the estimate landed within 3x the configured rsd
    // (0.05), and the oracle expects exact + TRUE. 3 sigma on the
    // HLL++ standard error — a deterministic pass for these
    // cardinalities, and a genuine cross-engine check of the sketch
    // (a broken HLL would flip the boolean and fail the hash).
    Q("approx_distinct",
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS exact_parts,
        |  TRUE AS within_3rsd
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey"), 0.05).as("approx_parts"),
          countDistinct(col("l_partkey")).as("exact_parts"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("approx_parts") - col("exact_parts"))
            <= lit(3 * 0.05) * col("exact_parts")).as("within_3rsd"))
        .orderBy("l_returnflag")
    },

    // ROLLUP hierarchy totals
    Q("rollup_agg",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, dir) =>
      // rollup triples the map-side rows before the exchange —
      // parallelize the narrow input (see q1_agg)
      Tables.parallelize(Tables.load(s, dir, "lineitem")
          .select("l_returnflag", "l_linestatus", "l_quantity"))
        .rollup("l_returnflag", "l_linestatus")
        .agg(sumd(dec(col("l_quantity"), 12, 2)).as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    },

    // CUBE over two dims
    Q("cube_agg",
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
        |  COUNT(*) AS n
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(sumd(dec(col("o_totalprice"), 12, 2)).as("total"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    },

    // GROUPING SETS with grouping() disambiguation
    Q("grouping_sets",
      """SELECT GROUPING(l_returnflag) AS g_rf, GROUPING(l_linestatus) AS g_ls,
        |  l_returnflag, l_linestatus, COUNT(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem").createOrReplaceTempView("lineitem_gs")
      s.sql(
        """SELECT GROUPING(l_returnflag) AS g_rf, GROUPING(l_linestatus) AS g_ls,
          |  l_returnflag, l_linestatus, COUNT(*) AS n
          |FROM lineitem_gs
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          |ORDER BY g_rf, g_ls, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
    },

    // top-k per group via ranked window (deterministic unique tiebreak)
    Q("topk_per_group",
      """SELECT l_returnflag, rn, l_orderkey, l_linenumber, l_extendedprice
        |FROM (SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
        |        row_number() OVER (PARTITION BY l_returnflag
        |          ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        |      FROM lineitem)
        |WHERE rn <= 3 ORDER BY l_returnflag, rn""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      // Spark's WindowGroupLimit keeps <=3 rows per group map-side, but
      // its Partial pass SORTS the input partition first — parallelize
      // so that sort doesn't run in the one-task scan stage
      Tables.parallelize(Tables.load(s, dir, "lineitem")
          .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("l_returnflag", "rn", "l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy("l_returnflag", "rn")
    },

    // the same top-k through the WHOLE-OPERATOR extension rung: custom
    // LogicalPlan -> planner Strategy -> SparkPlan (TopKPerGroupExec)
    // executing bounded per-group heaps — O(n log k), no partition
    // sort, no WindowExec (TopKPerGroupPlanSpec asserts the plan).
    // Same oracle as the window form: identical semantics, different
    // physical machinery.
    Q("topk_native",
      """SELECT l_returnflag, rn, l_orderkey, l_linenumber, l_extendedprice
        |FROM (SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
        |        row_number() OVER (PARTITION BY l_returnflag
        |          ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        |      FROM lineitem)
        |WHERE rn <= 3 ORDER BY l_returnflag, rn""".stripMargin) { (s, dir) =>
      graft.plans.TopKPerGroup(
          Tables.parallelize(Tables.load(s, dir, "lineitem")
            .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")),
          Seq("l_returnflag"),
          Seq(("l_extendedprice", true), ("l_orderkey", false), ("l_linenumber", false)),
          3)
        .select("l_returnflag", "rn", "l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy("l_returnflag", "rn")
    },

    // the same top-k as a bounded O(k) TypedImperativeAggregate: only
    // k-row buffers shuffle (map-side combine), no group is ever
    // sorted whole — the scale path; topk_per_group above is the
    // window-function form and the shared oracle
    Q("topk_agg",
      """SELECT l_returnflag, rn, l_orderkey, l_linenumber, l_extendedprice
        |FROM (SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
        |        row_number() OVER (PARTITION BY l_returnflag
        |          ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        |      FROM lineitem)
        |WHERE rn <= 3 ORDER BY l_returnflag, rn""".stripMargin) { (s, dir) =>
      import graft.functions.TopKAgg
      Tables.load(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(TopKAgg(col("l_extendedprice"), col("l_orderkey").cast("long"),
          col("l_linenumber").cast("long"), 3).as("tk"))
        .select(col("l_returnflag"), posexplode(col("tk")))
        .select(col("l_returnflag"), (col("pos") + 1).as("rn"),
          col("col.tie1").as("l_orderkey"), col("col.tie2").as("l_linenumber"),
          col("col.value").as("l_extendedprice"))
        .orderBy("l_returnflag", "rn")
    },

    // frame-spec window functions: running sum (exact decimal), lag, rank
    Q("window_funcs",
      // l_quantity closes the ordering: the synthetic lineitem has
      // duplicate (orderkey, linenumber) keys (118k at sf0.1), and one
      // duplicate pair even shares (suppkey, shipdate) with different
      // quantities — without the last key, lag/running_sum are
      // nondeterministic and the oracle hash flaps. Rows still tied
      // after l_quantity are identical in every column this query
      // reads, hence interchangeable.
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) OVER (
        |    PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty,
        |  lag(l_quantity) OVER (PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity) AS prev_qty,
        |  row_number() OVER (PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity) AS seq
        |FROM lineitem ORDER BY l_suppkey, seq""".stripMargin) { (s, dir) =>
      val ord = Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"))
      val w = Window.partitionBy(col("l_suppkey")).orderBy(ord: _*)
      Tables.load(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          sum(dec(col("l_quantity"), 12, 2))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double").as("running_qty"),
          lag(col("l_quantity"), 1).over(w).as("prev_qty"),
          row_number().over(w).as("seq"))
        .orderBy("l_suppkey", "seq")
    },

    // remaining rank-family window functions: rank/dense_rank over a
    // non-unique ordering, ntile, percent_rank, cume_dist (ratios of
    // ints — per-row double division, engine-exact)
    Q("window_ranks",
      """SELECT o_orderkey, o_orderpriority,
        |  rank() OVER w AS rnk, dense_rank() OVER w AS drnk,
        |  ntile(4) OVER w AS quartile,
        |  round(percent_rank() OVER w, 6) AS prank,
        |  round(cume_dist() OVER w, 6) AS cdist
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderstatus, o_orderkey)
        |ORDER BY o_orderpriority, rnk, o_orderkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_orderstatus"), col("o_orderkey"))
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          rank().over(w).as("rnk"), dense_rank().over(w).as("drnk"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("prank"),
          round(cume_dist().over(w), 6).as("cdist"))
        .orderBy("o_orderpriority", "rnk", "o_orderkey")
    },

    // exact Pearson correlation from decimal moment sums: the builtin
    // corr() is a float reduction (order-dependent), so both engines
    // instead compute the five exact moments and do the same double
    // arithmetic once per group
    Q("corr_manual",
      """SELECT l_returnflag,
        |  round((CAST(COUNT(*) AS DOUBLE) * CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
        |      - CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) * CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE))
        |    / (sqrt(CAST(COUNT(*) AS DOUBLE) * CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
        |          - CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) * CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE))
        |     * sqrt(CAST(COUNT(*) AS DOUBLE) * CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
        |          - CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) * CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE))), 6) AS corr_qp
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      val q = dec(col("l_quantity"), 12, 2)
      val p = dec(col("l_extendedprice"), 12, 2)
      Tables.parallelize(Tables.load(s, dir, "lineitem")
          .select("l_returnflag", "l_quantity", "l_extendedprice"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).cast("double").as("n"),
          sumd(q).as("sq"), sumd(p).as("sp"),
          sumd(q * p).as("sqp"), sumd(q * q).as("sqq"), sumd(p * p).as("spp"))
        .select(col("l_returnflag"),
          round((col("n") * col("sqp") - col("sq") * col("sp"))
            / (sqrt(col("n") * col("sqq") - col("sq") * col("sq"))
              * sqrt(col("n") * col("spp") - col("sp") * col("sp"))), 6)
            .as("corr_qp"))
        .orderBy("l_returnflag")
    },

    // array aggregation with deterministic order: per-lang sorted set
    // of sources (collect_set order is undefined on both engines;
    // sorting makes it canonical). The array is serialized to its JSON
    // text form because the driver's comparator sorts rows with pandas,
    // which cannot order raw array cells; the JSON string is a faithful,
    // scalar-sortable encoding of the same value on both engines.
    Q("collect_sources",
      """SELECT lang,
        |  to_json(list_sort(list_distinct(list(source)))) AS sources,
        |  COUNT(DISTINCT source) AS n_sources
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .groupBy("lang")
        .agg(to_json(sort_array(collect_set(col("source")))).as("sources"),
          countDistinct(col("source")).as("n_sources"))
        .orderBy("lang")
    },

    // fixed-width value histogram (the group key is computed, not
    // enumerated — floor division buckets)
    Q("value_histogram",
      """SELECT CAST(floor(value / 10.0) AS BIGINT) AS bucket, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy(floor(col("value") / 10.0).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(12, 2))).cast("double").as("total"))
        .orderBy("bucket")
    },

    // small-dim broadcast hash join + aggregate
    Q("join_broadcast_agg",
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          sumd(dec(col("o_totalprice"), 12, 2)).as("revenue"))
        .orderBy("c_mktsegment")
    },

    // large-large shuffle (sort-merge) join + aggregate
    Q("join_sortmerge_agg",
      """SELECT o_orderpriority, COUNT(*) AS n_lines,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem").hint("merge")
      val o = Tables.load(s, dir, "orders").hint("merge")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_lines"),
          sumd(dec(col("l_extendedprice"), 12, 2)).as("total_price"))
        .orderBy("o_orderpriority")
    },

    // star-schema multi-join (all dims broadcast)
    Q("multi_join_star",
      """SELECT r_name, n_name, COUNT(*) AS n_cust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin) { (s, dir) =>
      val c = Tables.load(s, dir, "customer")
      val n = Tables.load(s, dir, "nation")
      val r = Tables.load(s, dir, "region")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_cust"),
          sumd(dec(col("c_acctbal"), 12, 2)).as("total_bal"))
        .orderBy("r_name", "n_name")
    },

    // unpivot/melt: wide per-status counts back to long form — the
    // inverse of pivot_status (oracle enumerates the UNION ALL, the
    // portable melt)
    Q("unpivot_status",
      """WITH w AS (SELECT o_orderpriority,
        |    COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS F,
        |    COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS O,
        |    COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS P
        |  FROM orders GROUP BY o_orderpriority)
        |SELECT o_orderpriority, status, n FROM (
        |  SELECT o_orderpriority, 'F' AS status, F AS n FROM w
        |  UNION ALL SELECT o_orderpriority, 'O', O FROM w
        |  UNION ALL SELECT o_orderpriority, 'P', P FROM w)
        |ORDER BY o_orderpriority, status""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0, Seq("F", "O", "P"))
        .unpivot(Array(col("o_orderpriority")),
          Array(col("F"), col("O"), col("P")), "status", "n")
        .orderBy("o_orderpriority", "status")
    },

    // timestamp part extraction (year..minute; day-of-week conventions
    // differ between engines, so the portable parts are pinned here)
    Q("time_parts",
      """SELECT event_id, CAST(year(ts) AS INT) AS y, CAST(month(ts) AS INT) AS mo,
        |  CAST(day(ts) AS INT) AS d, CAST(hour(ts) AS INT) AS h,
        |  CAST(minute(ts) AS INT) AS mi,
        |  CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .select(col("event_id"), year(col("ts")).as("y"),
          month(col("ts")).as("mo"), dayofmonth(col("ts")).as("d"),
          hour(col("ts")).as("h"), minute(col("ts")).as("mi"),
          date_trunc("day", col("ts")).as("day_start"))
        .orderBy("event_id")
    },

    // ordered string aggregation (list_agg/string_agg): deterministic
    // via sort of the distinct set before joining
    Q("string_agg_sources",
      """SELECT lang,
        |  array_to_string(list_sort(list_distinct(list(source))), ',') AS srcs
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .groupBy("lang")
        .agg(array_join(sort_array(collect_set(col("source"))), ",").as("srcs"))
        .orderBy("lang")
    },

    // set operators: EXCEPT / UNION (distinct semantics)
    // multiset (ALL) set operations — different algebra from the
    // distinct forms: INTERSECT ALL keeps min(countL, countR) copies
    // per value, EXCEPT ALL keeps max(0, countL - countR). Spark plans
    // both as aggregate-count + generate (no row-pairing join); output
    // is re-aggregated so the gate compares deterministic counts.
    Q("set_ops_all",
      """WITH r AS (SELECT l_suppkey AS s FROM lineitem WHERE l_returnflag = 'R'),
        |a AS (SELECT l_suppkey AS s FROM lineitem WHERE l_returnflag = 'A'),
        |ia AS (SELECT s FROM r INTERSECT ALL SELECT s FROM a),
        |ea AS (SELECT s FROM r EXCEPT ALL SELECT s FROM a)
        |SELECT op, s, n FROM (
        |  SELECT 'intersect_all' AS op, s, COUNT(*) AS n FROM ia GROUP BY 2
        |  UNION ALL SELECT 'except_all', s, COUNT(*) FROM ea GROUP BY 2)
        |ORDER BY op, s""".stripMargin) { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val r = li.filter(col("l_returnflag") === "R").select(col("l_suppkey").as("s"))
      val a = li.filter(col("l_returnflag") === "A").select(col("l_suppkey").as("s"))
      val ia = r.intersectAll(a).groupBy("s").agg(count(lit(1)).as("n"))
        .select(lit("intersect_all").as("op"), col("s"), col("n"))
      val ea = r.exceptAll(a).groupBy("s").agg(count(lit(1)).as("n"))
        .select(lit("except_all").as("op"), col("s"), col("n"))
      ia.unionAll(ea).orderBy("op", "s")
    },

    Q("set_ops",
      """SELECT c_custkey FROM
        |  ((SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        |    EXCEPT
        |    SELECT c_custkey FROM customer WHERE c_acctbal < 0)
        |   UNION
        |   SELECT c_custkey FROM customer
        |   WHERE c_mktsegment = 'MACHINERY' AND c_acctbal > 9000)
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val c = Tables.load(s, dir, "customer")
      val auto = c.filter(col("c_mktsegment") === "AUTOMOBILE").select("c_custkey")
      val neg = c.filter(col("c_acctbal") < 0).select("c_custkey")
      val rich = c.filter(col("c_mktsegment") === "MACHINERY" && col("c_acctbal") > 9000)
        .select("c_custkey")
      auto.except(neg).union(rich).distinct().orderBy("c_custkey")
    }
  )
}
