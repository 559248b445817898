package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** TPC-H-flavored multi-join analytics adapted to the driver schema —
  * the complex-plan coverage (join reordering, selective dim filters,
  * deterministic top-k over aggregated revenue).
  */
object TpchQueries {

  private def dec(c: Column, p: Int, s: Int): Column = c.cast(DecimalType(p, s))
  private def revenue: Column =
    dec(col("l_extendedprice"), 12, 2) * dec(lit(1) - col("l_discount"), 4, 2)

  def all: Seq[Q] = Seq(

    // Q3-style: shipping-priority top-k revenue
    Q("q3_shipping",
      """SELECT l_orderkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
        |  o_orderdate, o_orderpriority
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""".stripMargin) { (s, dir) =>
      val c = Tables.load(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val l = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      broadcast(c).join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(sum(revenue).cast("double").as("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)
    },

    // Q18-style: HAVING over an aggregated fact, then join the
    // survivors back to their order/customer rows — the filter on an
    // aggregate runs BEFORE the join, so only qualifying orderkeys
    // (a tiny set) reach the join
    Q("q18_big_orders",
      """SELECT c_mktsegment, o_orderkey, o_orderdate,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
        |FROM lineitem
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |GROUP BY c_mktsegment, o_orderkey, o_orderdate
        |HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      val bigOrders = Tables.parallelize(Tables.load(s, dir, "lineitem")
          .select("l_orderkey", "l_quantity"))
        .groupBy("l_orderkey")
        .agg(sum(dec(col("l_quantity"), 12, 2)).as("qty"))
        .filter(col("qty") > 150)
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      bigOrders
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment"), col("o_orderkey"), col("o_orderdate"),
          col("qty").cast("double").as("total_qty"))
        .orderBy("o_orderkey")
    },

    // Q5-style: revenue by supplier nation where supplier and customer
    // share a nation (6-way star join)
    Q("q5_local_supplier",
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin) { (s, dir) =>
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
      val l = Tables.load(s, dir, "lineitem")
      val su = Tables.load(s, dir, "supplier")
      val n = Tables.load(s, dir, "nation")
      val r = Tables.load(s, dir, "region")
      // shuffle-hash instead of sort-merge for the one big join, with
      // the SMALLER (customer x orders) side hinted so IT becomes the
      // hash-map build side and lineitem — the probe — is never sorted
      // (measured 2.2s -> 1.5s at sf0.1). Valid whenever a build
      // partition fits executor memory; AQE still splits skewed
      // partitions.
      c.join(o, col("c_custkey") === col("o_custkey")).hint("shuffle_hash")
        .join(l, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey")
          && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(sum(revenue).cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy("r_name", "n_name")
    },

    // Q6-style: single-scan forecast revenue — the pushdown showcase.
    // All three predicates reach the parquet reader (PushedFilters);
    // only 4 columns are read. At 100 TB this is the difference between
    // scanning 4 narrow columns of row groups whose min/max already
    // exclude them, and scanning everything.
    Q("q6_forecast",
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin) { (s, dir) =>
      Tables.parallelize(Tables.load(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
            && col("l_shipdate") < lit("1997-01-01").cast("timestamp")
            && col("l_discount").between(0.05, 0.07)
            && col("l_quantity") < 24)
          .select("l_extendedprice", "l_discount"))
        .agg(
          sum(dec(col("l_extendedprice"), 12, 2) * dec(col("l_discount"), 4, 2))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
    },

    // Q7-style: bilateral trade volume between two nations by ship
    // year. Supplier and customer nations come from the SAME dim table
    // joined twice under different aliases — both broadcast; the only
    // shuffle is the final (nation, nation, year) aggregate.
    Q("q7_nation_volume",
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS volume
        |FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE n1.n_name IN ('NATION_0','NATION_1','NATION_2','NATION_3')
        |  AND n2.n_name IN ('NATION_0','NATION_1','NATION_2','NATION_3')
        |  AND n1.n_name <> n2.n_name
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin) { (s, dir) =>
      val twoNations = Tables.load(s, dir, "nation")
        .filter(col("n_name").isin("NATION_0", "NATION_1", "NATION_2", "NATION_3"))
      val n1 = twoNations.select(
        col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
      val n2 = twoNations.select(
        col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
      // nation filters first: they cut supplier/customer to ~2/25 of
      // rows BEFORE the fact joins, and semi-join pruning follows
      Tables.load(s, dir, "supplier").join(broadcast(n1), col("s_nationkey") === col("n1_key"))
        .join(Tables.load(s, dir, "lineitem"), col("s_suppkey") === col("l_suppkey"))
        .join(Tables.load(s, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
        .join(Tables.load(s, dir, "customer"), col("c_custkey") === col("o_custkey"))
        .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(sum(revenue).cast("double").as("volume"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },

    // Q8-style: one nation's market share of a region's PROMO-part
    // revenue by order year — conditional aggregation as a ratio of two
    // decimal-exact sums over an 8-way star join.
    Q("q8_market_share",
      """SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
        |  CAST(CAST(SUM(CASE WHEN n2.n_name = 'NATION_3' THEN CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2)) ELSE CAST(0 AS DECIMAL(14,4)) END) AS DOUBLE)
        |    / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS DOUBLE) AS mkt_share
        |FROM part JOIN lineitem ON p_partkey = l_partkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN region ON n1.n_regionkey = r_regionkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val p = Tables.load(s, dir, "part").filter(col("p_type") === "PROMO")
        .select("p_partkey")
      val asiaNations = Tables.load(s, dir, "nation")
        .join(broadcast(Tables.load(s, dir, "region").filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("cn_key"))
      val suppNation = Tables.load(s, dir, "nation")
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      val su = Tables.load(s, dir, "supplier")
        .join(broadcast(suppNation), col("s_nationkey") === col("sn_key"))
        .select("s_suppkey", "supp_nation")
      val zero = lit(BigDecimal(0)).cast(DecimalType(14, 4))
      Tables.load(s, dir, "lineitem")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.load(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.load(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(asiaNations), col("c_nationkey") === col("cn_key"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg((sum(when(col("supp_nation") === "NATION_3", revenue).otherwise(zero)).cast("double")
          / sum(revenue).cast("double")).cast("double").as("mkt_share"))
        .orderBy("o_year")
    },

    // Q10-style: top returned-revenue customers in a quarter — the
    // returned-items report. Broadcast dims, one fact shuffle on the
    // (customer) group key, top-k with a deterministic tiebreak.
    Q("q10_returned",
      """SELECT c_custkey, c_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
        |  AND l_returnflag = 'R'
        |GROUP BY 1, 2, 3 ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin) { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp")
          && col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
      val l = Tables.load(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      val c = Tables.load(s, dir, "customer")
      val n = Tables.load(s, dir, "nation")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(sum(revenue).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },

    // Q13-style: distribution of order counts per customer — LEFT OUTER
    // join with an extra non-equi ON predicate (kept in the join, NOT
    // a post-filter: a post-filter would turn outer into inner and
    // lose the zero-order customers), then a second aggregate over the
    // first's output. Two shuffles by construction; the second input is
    // |customer| rows, the third is |distinct counts|.
    Q("q13_cust_distribution",
      """SELECT c_count, COUNT(*) AS custdist FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey
        |) GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin) { (s, dir) =>
      // NOT the literal outer-join-then-count plan the SQL spells:
      // aggregate orders per custkey FIRST (partial agg eats the
      // per-order rows map-side; the join input shrinks from |orders|
      // to |active custkeys|), then LEFT join customer and coalesce
      // missing counts to 0 — algebraically identical to
      // COUNT(o_orderkey) over the outer join, and the only full-width
      // shuffle left is one row per customer.
      val perCust = Tables.load(s, dir, "orders")
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("c_count0"))
      Tables.load(s, dir, "customer").select("c_custkey")
        .join(perCust, col("c_custkey") === col("o_custkey"), "left_outer")
        .select(coalesce(col("c_count0"), lit(0L)).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // Q14-style: promo revenue share in a month — conditional
    // aggregation where numerator and denominator come from ONE pass
    // (no second scan, no self-join).
    Q("q14_promo",
      """SELECT CAST(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2)) ELSE CAST(0 AS DECIMAL(14,4)) END) AS DOUBLE)
        |  / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS DOUBLE) AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-02-01'""".stripMargin) { (s, dir) =>
      val zero = lit(BigDecimal(0)).cast(DecimalType(14, 4))
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1997-02-01").cast("timestamp"))
        .join(broadcast(Tables.load(s, dir, "part").select("p_partkey", "p_type")),
          col("l_partkey") === col("p_partkey"))
        .agg((lit(100.0) * sum(when(col("p_type") === "PROMO", revenue).otherwise(zero)).cast("double")
          / sum(revenue).cast("double")).cast("double").as("promo_revenue"))
    },

    // Q15-style: supplier(s) achieving the maximum quarterly revenue —
    // an UNCORRELATED scalar subquery over an aggregated view,
    // expressed as one SQL text for both engines (the modality under
    // test is the scalar-subquery-over-CTE plan: Spark evaluates the
    // subquery once and broadcasts the scalar, not per-row). The
    // revenue CTE stays DECIMAL so the max-equality is exact; the cast
    // to double happens only at output.
    Q("q15_top_supplier", TpchQueries.q15Sql) { (s, dir) =>
      Tables.load(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      Tables.load(s, dir, "supplier").createOrReplaceTempView("supplier")
      s.sql(TpchQueries.q15Sql)
    },

    // Q16-style: how many distinct suppliers serve each (brand, type,
    // size) bucket — COUNT(DISTINCT) over a join, excluding one brand.
    // Spark plans this as a two-phase distinct-expand aggregate; the
    // first groupBy includes l_suppkey so the distinct is a free
    // second pass over already-grouped data.
    Q("q16_supplier_cnt",
      """SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#1' AND p_size IN (1,5,9,13,17,21,25,29)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin) { (s, dir) =>
      val p = Tables.load(s, dir, "part")
        .filter(col("p_brand") =!= "Brand#1"
          && col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
        .select("p_partkey", "p_brand", "p_type", "p_size")
      Tables.load(s, dir, "lineitem").select("l_partkey", "l_suppkey")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
    },

    // Q19-style: disjunctive join predicates (OR of brand x size x
    // quantity conjuncts). The p_size/p_brand disjunction prunes part
    // BEFORE the join (Catalyst extracts the common-column OR as a
    // pushable filter); the mixed lineitem-x-part residual evaluates
    // post-join inside codegen.
    Q("q19_disjunctive",
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 5 AND 25)
        |   OR (p_brand = 'Brand#9' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 35)
        |   OR (p_brand = 'Brand#15' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 45)""".stripMargin) { (s, dir) =>
      val l = Tables.load(s, dir, "lineitem")
      val p = Tables.load(s, dir, "part")
      l.join(broadcast(p), col("p_partkey") === col("l_partkey"))
        .filter(
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) && col("l_quantity").between(5, 25))
            || (col("p_brand") === "Brand#9" && col("p_size").between(10, 30) && col("l_quantity").between(10, 35))
            || (col("p_brand") === "Brand#15" && col("p_size").between(20, 50) && col("l_quantity").between(20, 45)))
        .agg(sum(revenue).cast("double").as("revenue"), count(lit(1)).as("n_lines"))
    },

    // Q22-style: well-funded customers with no urgent orders — an
    // uncorrelated scalar AVG subquery (evaluated once, broadcast as a
    // literal into the filter) plus a correlated NOT EXISTS that
    // Catalyst turns into a broadcast LEFT ANTI join. SQL text for both
    // engines; the avg is decimal-sum/count so both compare the same
    // double.
    Q("q22_idle_rich", TpchQueries.q22Sql) { (s, dir) =>
      Tables.load(s, dir, "customer").createOrReplaceTempView("customer")
      Tables.load(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql(TpchQueries.q22Sql)
    },

    // Q17-style CORRELATED scalar subquery: lineitems below 0.2x their
    // own part's average quantity. This is the one query deliberately
    // expressed as SQL text on the Spark side too — the modality under
    // test is Catalyst's subquery decorrelation
    // (RewriteCorrelatedScalarSubquery turns the per-part aggregate
    // into an aggregate + join; PlanShapeSpec asserts no scalar
    // subquery survives optimization). A per-row re-execution of the
    // inner aggregate — what a naive engine does — would be O(|part| x
    // |lineitem|) at 100 TB; the decorrelated plan is one partial-agg
    // pass over lineitem plus a join. The threshold avg is written as
    // decimal-sum -> double / count so both engines compare the exact
    // same doubles (see MEMORY float-parity rules).
    Q("q17_small_qty", TpchQueries.q17Sql) { (s, dir) =>
      Tables.load(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      Tables.load(s, dir, "part").createOrReplaceTempView("part")
      s.sql(TpchQueries.q17Sql)
    },

    // Q4-style: order-priority checking — a correlated EXISTS whose
    // predicate references BOTH sides (l_shipdate > o_orderdate + 30d
    // stands in for TPC-H's l_commitdate < l_receiptdate, absent from
    // the driver schema). The DataFrame form is the decorrelated plan
    // spelled directly: a LEFT SEMI join on the order key with the
    // mixed-side lateness residual evaluated inside the hash join —
    // lineitem is never aggregated or deduplicated first, and each
    // order row is emitted at most once no matter how many late lines
    // match. At 100 TB both sides shuffle once on the join key; the
    // date filter cuts orders before the shuffle.
    Q("q4_priority",
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp")
          && col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
      val l = Tables.load(s, dir, "lineitem").select("l_orderkey", "l_shipdate")
      o.join(l,
          col("l_orderkey") === col("o_orderkey")
            && col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAY"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },

    // Q9-style: product-type profit by nation and year. The driver
    // schema has no partsupp, so supply cost is proxied as
    // 0.6 x p_retailprice (decimal-exact: every term stays DECIMAL
    // until the final output cast, so grouping order can't perturb the
    // sum). Plan shape: the two dims that shrink the fact (part-name
    // filter, supplier->nation) broadcast; orders joins shuffle-side;
    // one aggregate on (nation, year).
    Q("q9_profit",
      """SELECT n_name AS nation, CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))
        |    - CAST(p_retailprice AS DECIMAL(12,2)) * 0.6 * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_profit
        |FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
        |JOIN part ON p_partkey = l_partkey
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%blue%'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      val p = Tables.load(s, dir, "part").filter(col("p_name").contains("blue"))
        .select("p_partkey", "p_retailprice")
      val su = Tables.load(s, dir, "supplier")
        .join(broadcast(Tables.load(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("nation"))
      val profit =
        revenue - dec(col("p_retailprice"), 12, 2) * lit(BigDecimal("0.6")) *
          dec(col("l_quantity"), 12, 2)
      Tables.load(s, dir, "lineitem")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.load(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("nation"), year(col("o_orderdate")).as("o_year"))
        .agg(sum(profit).cast("double").as("sum_profit"))
        .orderBy("nation", "o_year")
    },

    // Q12-style: late-shipment counts by return flag split into
    // high/low order priority (l_returnflag stands in for the absent
    // l_shipmode). Conditional COUNT over one fact pass — numerator
    // and denominator classes come from the same shuffle, no second
    // scan, no self-join.
    Q("q12_shipmode",
      """SELECT l_returnflag,
        |  COUNT(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 END) AS high_line_count,
        |  COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 END) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_linestatus = 'F'
        |  AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val l = Tables.load(s, dir, "lineitem")
        .filter(col("l_linestatus") === "F"
          && col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .select("l_orderkey", "l_returnflag")
      val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      l.join(Tables.load(s, dir, "orders").select("o_orderkey", "o_orderpriority"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(
          count(when(high, 1)).as("high_line_count"),
          count(when(!high, 1)).as("low_line_count"))
        .orderBy("l_returnflag")
    },

    // Q11-style: important stock — parts whose value (from EUROPE
    // suppliers' shipments; lineitem stands in for partsupp) exceeds
    // 2x the mean part value. TPC-H's own fraction scales by 1/SF
    // because a FIXED fraction of total empties as the part count
    // grows; comparing against the mean (val x cnt > 2 x total) is
    // the scale-invariant form, and it keeps the compare
    // decimal-exact on BOTH engines — a fractional decimal multiply
    // would overflow Spark's 38-digit precision and round, and a
    // rounded threshold can flip borderline parts (cnt casts to INT:
    // decimal(18,4) x decimal(10,0) stays under the cap). The Spark
    // side evaluates (total, cnt) as a 1-row broadcast joined into
    // the filter (the uncorrelated-scalar plan), so the per-part
    // table streams once.
    Q("q11_important_stock", TpchQueries.q11Sql) { (s, dir) =>
      val su = Tables.load(s, dir, "supplier")
        .join(broadcast(Tables.load(s, dir, "nation")
          .join(broadcast(Tables.load(s, dir, "region")
            .filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey")
      val nval = Tables.load(s, dir, "lineitem")
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(sum(dec(col("l_extendedprice"), 12, 2) * dec(col("l_quantity"), 12, 2))
          .cast(DecimalType(18, 4)).as("val"))
      val total = nval.agg(sum(col("val")).as("total"),
        count(lit(1)).cast("int").as("cnt"))
      nval.join(broadcast(total))
        .filter(col("val") * col("cnt") > col("total") * 2)
        .select(col("l_partkey"), col("val").cast("double").as("part_value"))
        .orderBy(col("part_value").desc, col("l_partkey"))
    },

    // Q20-style: nested-IN chain — suppliers who moved a large total
    // quantity of some PROMO part. Each IN becomes a semi join: the
    // part filter broadcasts into lineitem's scan, the per
    // (supplier, part) HAVING aggregate is map-side-combined before
    // its one shuffle, and the surviving supplier keys (tiny) semi-
    // join supplier. Nothing here materializes the fact table twice.
    Q("q20_excess",
      """SELECT s_name, n_name, s_acctbal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem
        |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
        |  GROUP BY l_suppkey, l_partkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 100)
        |ORDER BY s_name""".stripMargin) { (s, dir) =>
      val promo = Tables.load(s, dir, "part")
        .filter(col("p_type") === "PROMO").select("p_partkey")
      val bigMovers = Tables.load(s, dir, "lineitem")
        .select("l_suppkey", "l_partkey", "l_quantity")
        .join(broadcast(promo), col("l_partkey") === col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(sum(dec(col("l_quantity"), 12, 2)).as("q"))
        .filter(col("q") > 100)
        .select("l_suppkey")
      // the survivor key set is small BY CONSTRUCTION (the HAVING
      // threshold keeps only heavy movers), but that's a post-aggregate
      // fact Catalyst can't see statically — hint the broadcast so the
      // supplier table never shuffles for the semi join
      Tables.load(s, dir, "supplier")
        .join(broadcast(Tables.load(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(bigMovers), col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_name", "n_name", "s_acctbal")
        .orderBy("s_name")
    },

    // Q2-style: minimum-cost supplier — a correlated scalar MIN
    // subquery over the same join tree as the outer query (unit price
    // from lineitem stands in for ps_supplycost). One SQL text for
    // both engines: the modality under test is Catalyst decorrelating
    // the per-part MIN into an aggregate + join instead of re-running
    // the inner query per outer row (which at 100 TB would be
    // O(|part| x |lineitem|)). Division of two stored doubles is
    // bit-deterministic IEEE on both engines, so the equality join on
    // unit_price is exact.
    Q("q2_min_cost", TpchQueries.q2Sql) { (s, dir) =>
      Seq("part", "lineitem", "supplier", "nation", "region")
        .foreach(t => Tables.load(s, dir, t).createOrReplaceTempView(t))
      s.sql(TpchQueries.q2Sql)
    },

    // Q21-style: suppliers who kept orders waiting — the double
    // correlated existential: EXISTS (another supplier on the same
    // order) AND NOT EXISTS (another supplier who shipped LATER).
    // One SQL text for both engines; Spark decorrelates the EXISTS to
    // a semi join and the NOT EXISTS (with its non-equi shipdate
    // correlation) to an anti join — three passes over lineitem's
    // orderkey-hashed shuffle, never a per-row subquery loop.
    Q("q21_waiting", TpchQueries.q21Sql) { (s, dir) =>
      Seq("lineitem", "orders", "supplier", "nation", "region")
        .foreach(t => Tables.load(s, dir, t).createOrReplaceTempView(t))
      s.sql(TpchQueries.q21Sql)
    }
  )

  /** One SQL text, two engines: Spark executes it verbatim and DuckDB
    * oracles it verbatim (the dialect overlap is deliberate).
    */
  val q17Sql: String =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#1'
      |  AND l_quantity < 0.2 * (SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
      |                          FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)""".stripMargin

  /** Q15 (top supplier): uncorrelated scalar subquery over a CTE —
    * exact decimal max-equality, double only at output.
    */
  val q15Sql: String =
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |    SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
      |FROM supplier JOIN revenue ON s_suppkey = supplier_no
      |WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  /** Q11 (important stock): HAVING-against-fraction-of-total with the
    * compare kept decimal-exact via an integer multiply (see the Q
    * comment — a 0.002 decimal multiply would round under Spark's
    * 38-digit cap).
    */
  val q11Sql: String =
    """WITH nval AS (
      |  SELECT l_partkey,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(18,4)) AS val
      |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'EUROPE'
      |  GROUP BY l_partkey),
      |tot AS (SELECT SUM(val) AS total, CAST(COUNT(*) AS INT) AS cnt FROM nval)
      |SELECT l_partkey, CAST(val AS DOUBLE) AS part_value
      |FROM nval, tot
      |WHERE val * cnt > 2 * total
      |ORDER BY part_value DESC, l_partkey""".stripMargin

  /** Q2 (min-cost supplier): correlated scalar MIN over a join tree —
    * one SQL text, decorrelated by Catalyst, oracled verbatim.
    */
  val q2Sql: String =
    """SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_name,
      |  l_extendedprice / l_quantity AS unit_price
      |FROM part JOIN lineitem ON p_partkey = l_partkey
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE p_size = 15 AND r_name = 'EUROPE'
      |  AND l_extendedprice / l_quantity = (
      |    SELECT MIN(l2.l_extendedprice / l2.l_quantity)
      |    FROM lineitem l2 JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
      |    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
      |    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
      |    WHERE l2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin

  /** Q21 (waiting suppliers): double correlated existential with a
    * non-equi correlation in the NOT EXISTS; lateness is
    * l_shipdate > o_orderdate + 30 days (no commit/receipt dates in
    * the driver schema).
    */
  val q21Sql: String =
    """SELECT s_name, COUNT(*) AS numwait
      |FROM supplier
      |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      |JOIN orders ON o_orderkey = l1.l_orderkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE o_orderstatus = 'F' AND r_name = 'ASIA'
      |  AND l1.l_shipdate > o_orderdate + INTERVAL 30 DAY
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > l1.l_shipdate)
      |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin

  /** Q22 (idle rich customers): uncorrelated scalar AVG + correlated
    * NOT EXISTS; avg written as decimal-sum / count for float parity.
    */
  val q22Sql: String =
    """SELECT c_mktsegment, COUNT(*) AS numcust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
      |FROM customer c
      |WHERE c_acctbal > (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
      |                   FROM customer c2 WHERE c2.c_acctbal > 0.0)
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
}
