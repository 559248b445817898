package graft

/** Smoke-level regression: every registered query runs at sf0.001 and
  * yields rows with the declared (aliased) schema. Value-level
  * correctness is pinned by the DuckDB oracle gate
  * (tools/oracle_check.py + the driver's t2 check).
  */
class QueriesSpec extends SparkSpec {

  test("every query has either an oracle or a documented reason") {
    val noOracle = SparkEntry.allQueries.filter(_.oracle.isEmpty).map(_.name)
    // keep this list short and intentional — each entry is a weaker check
    val allowed = Set(
      "approx_distinct", // HLL sketch differs by engine
      "approx_percentiles", // KLL sketch differs by engine; error bound pinned vs the exact `percentiles` in QuantileSketchSpec
      "multimodal_features") // mapPartitions path is not SQL; math pinned by multimodal_meta
    // (percentiles/typed_weighted_avg DO have oracles — exactness engineered)
    assert(noOracle.forall(allowed), s"un-oracled queries: $noOracle")
  }

  test("query names are unique") {
    val names = SparkEntry.allQueries.map(_.name)
    assert(names.distinct.size === names.size)
  }

  for (q <- SparkEntry.allQueries) {
    test(s"${q.name} runs and returns rows at sf0.001") {
      val df = q.run(spark, sf0001)
      assert(df.count() > 0, s"${q.name} returned 0 rows")
    }
  }

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
