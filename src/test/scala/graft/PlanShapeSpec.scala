package graft

/** Physical-plan shape assertions (SURVEY §4): the properties that make
  * these plans scale — pushed-down scans, broadcast (not shuffled)
  * dimension joins, map-side partial aggregation — verified against the
  * compiled plan, not just by the queries' results. A regression that
  * silently turns the anti-join into a sort-merge join or widens a scan
  * would pass the value oracle but fail here.
  */
class PlanShapeSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.allQueries.find(_.name == name).get
      .run(spark, sf0001).queryExecution.executedPlan.toString

  test("source_scan pushes the shipdate filter and prunes columns") {
    val p = plan("source_scan")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate"),
      s"filter not pushed to parquet:\n$p")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_shipdate"))
    assert(!readSchema.contains("l_tax") && !readSchema.contains("l_discount"),
      s"scan reads columns the query never uses:\n$readSchema")
  }

  test("blocked-pair anti-join broadcasts the dimension, never shuffles messages") {
    for (name <- Seq("anti_join_blocked", "moderation_pipeline")) {
      val p = plan(name)
      assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
        s"$name: expected broadcast LEFT ANTI:\n$p")
      assert(!p.contains("SortMergeJoin"), s"$name: dimension join shuffled")
    }
  }

  test("q1_agg combines map-side (partial aggregation before the exchange)") {
    val p = plan("q1_agg")
    assert(p.contains("partial_sum"), s"no map-side combine:\n$p")
  }

  test("topk_agg aggregates bounded buffers, no per-group sort") {
    val p = plan("topk_agg")
    assert(p.contains("partial_top_k"), s"no partial top-k combine:\n$p")
    assert(!p.contains("Window"), "top-k fell back to a window sort")
  }

  test("join_sortmerge_agg honors the merge hint; star dims broadcast") {
    assert(plan("join_sortmerge_agg").contains("SortMergeJoin"))
    val star = plan("multi_join_star")
    assert(star.contains("BroadcastHashJoin"))
    assert(!star.contains("SortMergeJoin"))
  }

  test("percentiles scans lineitem once (rank + count share one exchange)") {
    val p = plan("percentiles")
    val scans = p.linesIterator.count(_.contains("Scan parquet"))
    assert(scans === 1, s"expected a single lineitem scan, got $scans:\n$p")
  }

  test("minhash signature pipeline holds to three exchanges") {
    // repartition (parallelize the explode+hash), signature groupBy,
    // final orderBy — the distinct-shuffle of shingle strings must not
    // reappear
    val p = plan("dedup_minhash_sig")
    val n = "Exchange".r.findAllIn(p).length
    assert(n <= 3, s"minhash pipeline gained exchanges ($n):\n$p")
    assert(p.linesIterator.count(_.contains("Scan parquet")) === 1)
  }

  test("bloom_semi_join pre-filters the fact scan stage before the exact join") {
    val p = plan("bloom_semi_join")
    assert(p.contains("LeftSemi"))
    // the bloom UDF pre-filter must sit in the SCAN stage: between the
    // plan line that evaluates the UDF and the lineitem scan below it
    // there must be no Exchange (a filter after a shuffle would defeat
    // the pre-filtering)
    val lines = p.linesIterator.toVector
    val udfIdx = lines.indexWhere(l => l.contains("Filter") && l.contains("UDF"))
    assert(udfIdx >= 0, s"no bloom UDF filter in plan:\n$p")
    // the filter prints directly above its child subtree, so the first
    // scan below it is the lineitem scan it guards
    val scanIdx = lines.indexWhere(_.contains("Scan parquet"), udfIdx)
    assert(scanIdx > udfIdx, s"no scan under the UDF filter:\n$p")
    assert(!lines.slice(udfIdx, scanIdx).exists(_.contains("Exchange")),
      s"bloom filter applied after a shuffle:\n$p")
  }
}
