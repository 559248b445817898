package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Layout

/** Storage-layout plan proofs: bucketed joins drop the exchange,
  * hive-partitioned reads prune directories. These are the write-once/
  * query-many physical designs SCALE.md leans on for 100 TB facts.
  */
class BucketingSpec extends SparkSpec {

  test("join of two same-bucketed tables runs with NO shuffle exchange") {
    val base = Files.createTempDirectory("graft_bucketed").toString
    val l = Tables.load(spark, sf0001, "lineitem")
      .select("l_orderkey", "l_quantity")
    val o = Tables.load(spark, sf0001, "orders")
      .select("o_orderkey", "o_orderpriority")
    try {
      Layout.writeBucketed(l, "li_b", s"$base/li", 4, "l_orderkey",
        Seq("l_orderkey"))
      Layout.writeBucketed(o, "or_b", s"$base/or", 4, "o_orderkey",
        Seq("o_orderkey"))
      val joined = spark.table("li_b")
        .join(spark.table("or_b").hint("merge"),
          col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "l_quantity", "o_orderpriority")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected merge join:\n$plan")
      assert(plan.contains("Bucketed: true"), s"scan not bucket-aware:\n$plan")
      // and it computes the same answer as the plain-parquet join
      val expect = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "l_quantity", "o_orderpriority")
      assert(joined.exceptAll(expect).isEmpty && expect.exceptAll(joined).isEmpty)
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS or_b")
    }
  }

  test("aggregation on the bucket key reuses bucketing (no exchange before agg)") {
    val base = Files.createTempDirectory("graft_bucketed_agg").toString
    val l = Tables.load(spark, sf0001, "lineitem")
      .select("l_orderkey", "l_quantity")
    try {
      Layout.writeBucketed(l, "li_agg_b", s"$base/li", 4, "l_orderkey")
      val agg = spark.table("li_agg_b")
        .groupBy("l_orderkey").agg(sum("l_quantity").as("q"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"groupBy on bucket key still shuffles:\n$plan")
    } finally spark.sql("DROP TABLE IF EXISTS li_agg_b")
  }

  test("hive-partitioned read prunes to the filtered lang directories") {
    val base = Files.createTempDirectory("graft_part").toString
    val docs = Tables.load(spark, sf0001, "documents")
    Layout.writePartitioned(docs, s"$base/docs", Seq("lang"))
    val read = spark.read.parquet(s"$base/docs")
      .filter(col("lang") === "en").select("doc_id", "lang")
    val scan = read.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scan.contains("lang") && (scan.contains("= en") || scan.contains("equals")),
      s"no partition pruning on lang:\n$scan")
    // pruned read returns exactly the en docs
    val expected = docs.filter(col("lang") === "en").count()
    assert(read.count() === expected)
  }

  test("stored IVFADC index: probe is partition-pruned and equals the inline ann_ivf_pq") {
    import graft.sources.AnnIndex
    val base = Files.createTempDirectory("graft_annidx").toString
    // sf0.001: parity and pruning are plan/row identities, not
    // statistics — the small fixture proves them at 1/10 the runtime
    // (recall statistics run at sf0.01 in PipelineShapesSpec)
    val emb = Tables.load(spark, sf0001, "embeddings")
    val cb = AnnIndex.build(emb, s"$base/idx")
    val probe = AnnIndex.probe(spark, s"$base/idx", emb, cb)
    // the index read must prune to the probed coarse lists at the
    // directory level — `cl` in PartitionFilters, not a post-scan
    // Filter over all partitions
    val scan = probe.queryExecution.executedPlan.toString
      .linesIterator.find(l => l.contains("PartitionFilters") && l.contains("cl"))
    assert(scan.isDefined && "cl#\\d+ IN \\(".r.findFirstIn(scan.get).isDefined,
      s"index scan not partition-pruned on cl:\n${scan.getOrElse("(no scan line)")}")
    // a single query probes exactly Nprobe of the Centroids lists, so
    // the IN-list shrinks and real directories drop out of the scan
    val one = AnnIndex.probe(spark, s"$base/idx", emb, cb, maxQueryId = 1)
    val oneScan = one.queryExecution.executedPlan.toString
      .linesIterator.find(l => l.contains("PartitionFilters") && l.contains("cl")).get
    val inList = "cl#\\d+ IN \\(([0-9,]+)\\)".r.findFirstMatchIn(oneScan).get.group(1)
    assert(inList.split(",").length === graft.queries.SimilarityQueries.Nprobe,
      s"single-query probe should scan Nprobe lists, got IN ($inList)")
    // probe == the inline query, row for row (same codebooks by
    // md5-determinism, same ADC + shortlist + re-rank tie rules)
    val got = probe.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val want = SparkEntry.allQueries.find(_.name == "ann_ivf_pq").get
      .run(spark, sf0001).collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got === want, "stored-index probe diverges from the inline query")
  }

  test("versioned index: atomic pointer swap under an in-flight probe, no mixed state") {
    import graft.sources.AnnIndex
    val root = Files.createTempDirectory("graft_annver").toString
    val emb = Tables.load(spark, sf0001, "embeddings")
    // no pointer yet: probeCurrent must refuse, not guess a directory
    val e0 = intercept[IllegalStateException](
      AnnIndex.probeCurrent(spark, root, emb, null))
    assert(e0.getMessage.contains("CURRENT"))
    // publishing an empty/absent version must refuse (a bad dir can
    // never become current)
    val cb = AnnIndex.buildVersion(emb, root, "v1")
    intercept[IllegalStateException](AnnIndex.publish(spark, root, "v9"))
    assert(AnnIndex.currentVersion(spark, root) === "v1")
    // an in-flight probe resolves the pointer at PLAN time ...
    val inFlight = AnnIndex.probeCurrent(spark, root, emb, cb)
    // ... so a rebuild+publish of v2 (here: half the corpus, so
    // results provably differ) does not disturb it
    AnnIndex.buildVersion(emb.filter(col("vec_id") % 2 === 0), root, "v2")
    assert(AnnIndex.currentVersion(spark, root) === "v2")
    val v1Rows = inFlight.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val v1Again = AnnIndex.probe(spark, AnnIndex.versionPath(root, "v1"),
      emb, cb).collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(v1Rows === v1Again, "in-flight probe saw the swap")
    // new probes resolve the new version: every neighbor is even
    val v2 = AnnIndex.probeCurrent(spark, root, emb, cb)
      .collect().map(_.getLong(2))
    assert(v2.nonEmpty && v2.forall(_ % 2 == 0),
      s"post-swap probe leaked v1 vectors: ${v2.filter(_ % 2 != 0).take(3).mkString(",")}")
    // the recovery path the mix-refusal error message points at:
    // streaming into a NEW version of a batch-rooted index is legal
    // (fresh dir), while streaming into the live v1 still refuses
    intercept[IllegalStateException] {
      AnnIndex.appendStream(emb.limit(1), AnnIndex.versionPath(root, "v1"),
        Files.createTempDirectory("graft_annver_ckpt").toString, cb)
    }
  }
}
