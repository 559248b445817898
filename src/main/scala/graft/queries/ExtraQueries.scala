package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{CountMinSketchAgg, WeightedMean}
import graft.functions.PortableHash.duckH32

/** Remaining extension-point operators: table-generating explode
  * (the UDTF surface, SURVEY §2.7), pivot, exact interpolated
  * percentiles, and a typed `Aggregator`.
  */
object ExtraQueries {

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

    // exact interpolated percentiles (Spark percentile() and DuckDB
    // quantile_cont share the rank = p*(n-1) linear interpolation)
    Q("percentiles",
      """SELECT l_returnflag,
        |  quantile_cont(l_extendedprice, 0.25) AS p25,
        |  quantile_cont(l_extendedprice, 0.50) AS p50,
        |  quantile_cont(l_extendedprice, 0.75) AS p75
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          expr("percentile(l_extendedprice, 0.25)").as("p25"),
          expr("percentile(l_extendedprice, 0.50)").as("p50"),
          expr("percentile(l_extendedprice, 0.75)").as("p75"))
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
      Tables.load(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(CountMinSketchAgg(col("l_partkey").cast("string"), D, W).as("sk"))
        .select(col("l_returnflag") +: probes.map { p =>
          least((0 until D).map(r =>
            element_at(col("sk"), r * W + CountMinSketchAgg.bucket(r, p, W) + 1)): _*)
            .as(s"est_$p")
        }: _*)
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
}
