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
}
