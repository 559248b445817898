package graft

import org.apache.spark.sql.functions._

import graft.functions.{FreqItemsAgg, TopKAgg}
import graft.ops.{Similarity, Skew}
import graft.plans.TopKPerGroup

/** Empty-input and degenerate-shape behavior: operators must return
  * empty/identity results, not throw — at 100 TB a partition-pruned
  * read or an over-selective filter routinely hands an operator zero
  * rows.
  */
class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  private def emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")

  test("FreqItemsAgg over an empty frame yields one row with an empty list") {
    val out = emptyDocs.agg(FreqItemsAgg(col("text"), 8).as("fi"))
      .select(size(col("fi"))).as[Int].collect()
    assert(out.toSeq === Seq(0))
  }

  test("TopKPerGroup over an empty frame yields zero rows") {
    val out = TopKPerGroup(emptyDocs, Seq("doc_id"),
      Seq(("text", false)), 3)
    assert(out.count() === 0)
    assert(out.columns.toSeq === Seq("doc_id", "text", "rn"))
  }

  test("saltedJoin with an empty dim: inner empty, left_outer keeps big side") {
    val big = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    val dim = Seq.empty[(Long, String)].toDF("k", "d")
    assert(Skew.saltedJoin(big, dim, "k", 4, "inner").count() === 0)
    val lo = Skew.saltedJoin(big, dim, "k", 4, "left_outer")
    assert(lo.count() === 2)
    assert(lo.filter(col("d").isNull).count() === 2)
  }

  test("kmeansStep on an empty frame keeps every centroid, zero counts") {
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val init = Similarity.centroidCoefs(3, 4)
    val (next, counts) = Similarity.kmeansStep(empty, "embedding", init)
    assert(counts.toSeq === Seq(0L, 0L, 0L))
    assert(next.map(_.toSeq).toSeq === init.map(_.toSeq).toSeq)
  }

  test("round-7 curation ops on empty frames: empty results, loud NB train") {
    import graft.ops.{Dedup, TextAnalysis}
    val emptyLangDocs = Seq.empty[(Long, String, String)]
      .toDF("doc_id", "lang", "text")
    assert(Dedup.containmentPairs(emptyLangDocs, maxDf = 50).count() === 0)
    assert(TextAnalysis.cdcChunks(emptyDocs).count() === 0)
    val (app, stats) = graft.streaming.StreamDedup.cdcBatch(
      emptyDocs, Seq.empty[(Long, Long, Long, String)]
        .toDF("doc_id", "chunk_idx", "n_tokens", "chunk_md5"))
    assert(app.count() === 0 && stats.count() === 0)
    // empty windowed-quantile input: zero windows, not a crash
    val emptyEv = Seq.empty[(java.sql.Timestamp, Double)].toDF("ts", "value")
    assert(graft.streaming.WindowedAggs.windowedQuantiles(
      emptyEv, "value", 64, Seq(0.5)).count() === 0)
    // an empty NB training set must fail LOUDLY at train time, not as
    // an opaque crash when the first document is scored
    val e = intercept[IllegalArgumentException](
      graft.streaming.StreamClassify.trainNb(
        emptyLangDocs.select("lang", "text")))
    assert(e.getMessage.contains("empty"))
  }

  test("TopKAgg over an empty group set returns no rows (not a crash)") {
    val out = emptyDocs
      .groupBy("doc_id")
      .agg(TopKAgg(col("doc_id").cast("double"), col("doc_id"),
        col("doc_id"), 3).as("t"))
    assert(out.count() === 0)
  }

  test("scoreLabelOf handles empty frames and degenerate texts") {
    import graft.queries.EvalQueries
    assert(EvalQueries.scoreLabelOf(emptyDocs).count() === 0)
    assert(EvalQueries.calibrationBins(
      EvalQueries.scoreLabelOf(emptyDocs)).count() === 0)
    // empty string still splits to one (empty) token; a one-word doc
    // exercises every ratio's n=1 denominator — neither may throw or
    // yield a null score
    val weird = Seq((1L, ""), (2L, "word")).toDF("doc_id", "text")
    val out = EvalQueries.scoreLabelOf(weird).collect()
    assert(out.length === 2)
    assert(out.forall(r => !r.isNullAt(1) && !r.isNullAt(2)))
  }

  test("lpaLabels: empty graph is empty; a two-node component converges to the min label") {
    import graft.queries.DedupQueries
    val noEdges = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(DedupQueries.lpaLabels(noEdges).count() === 0)
    // the self-vote regression guard: synchronous LPA WITHOUT it
    // oscillates on a pair forever and never merges the component
    val pair = Seq((10L, 20L), (20L, 10L)).toDF("a", "b")
    val got = DedupQueries.lpaLabels(pair)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(10L -> 10L, 20L -> 10L),
      s"pair did not converge to the min label: $got")
  }

  test("every round-8 query survives a near-degenerate corpus without throwing") {
    // 1-3 rows per table: over-selective filters, single-cell censuses,
    // zero-variance series, empty train/test splits — the shapes a
    // partition-pruned read hands an operator at 100 TB. The contract
    // is NO EXCEPTION; rows may legitimately be 0 / NULL / NaN.
    import java.sql.Timestamp
    val dir = java.nio.file.Files.createTempDirectory("graft_tiny").toString
    def t(s: String) = Timestamp.valueOf(s)
    Seq(
      (1L, t("2024-01-01 10:00:00"), 7L, "purchase", 20.0, """{"k": 1}"""),
      (2L, t("2024-01-01 11:00:00"), 7L, "click", 5.0, """{"k": 2}"""),
      (3L, t("2024-01-02 10:00:00"), 7L, "view", 1.0, """{"k": 3}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    Seq((0L, "the table scan is a fast row group", "en", "src0", 34L),
      (1L, "a sort and a merge join the data", "en", "src0", 32L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    Seq((0L, Array.tabulate(64)(i => (i % 7 - 3) / 10.0f), 0),
      (1L, Array.tabulate(64)(i => (i % 5 - 2) / 10.0f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    Seq((1L, "c1", 0, 100.0, "BUILDING"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.parquet(s"$dir/customer.parquet")
    Seq((1L, 1L, "O", 50.0, t("2024-01-01 00:00:00"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    Seq((1L, 1L, 1L, 1, 2.0, 10.0, 0.01, 0.02, "N", "O", t("2024-01-05 00:00:00")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.parquet(s"$dir/lineitem.parquet")
    Seq((1L, "p1", "Brand#1")).toDF("p_partkey", "p_name", "p_brand")
      .write.parquet(s"$dir/part.parquet")
    Seq((1L, "s1")).toDF("s_suppkey", "s_name").write.parquet(s"$dir/supplier.parquet")
    Seq((0, "nation0", 0)).toDF("n_nationkey", "n_name", "n_regionkey")
      .write.parquet(s"$dir/nation.parquet")
    val round8 = Seq(
      "rolling_anomaly", "seasonal_decompose", "ewma_trend", "kaplan_meier",
      "forecast_backtest", "var_es", "k_anonymity", "anonymize_sweep",
      "table_stats", "benford_audit", "mv_merge", "file_skipping_audit",
      "dp_histogram", "delete_amplification", "watermark_delay_audit",
      "referential_integrity", "pk_uniqueness", "readability",
      "ngram_diversity", "pca_power_iteration", "rp_project_audit",
      "mann_whitney", "chi_square_independence", "autocorrelation",
      "cusum_changepoint", "bootstrap_ci", "theil_sen", "ttest_welch",
      "mad_outliers", "binseg_changepoint", "roc_auc", "ols_cramer",
      "markov_entropy_rate", "decision_stump", "graph_assortativity",
      "did_estimate", "ltv_curve", "last_touch_attribution",
      "spearman_corr", "mann_kendall", "levene_bf",
      "benjamini_hochberg", "cmh_test", "tfidf_cosine_knn", "ndcg_eval",
      "kcore_peel", "sprt_boundary", "holt_winters",
      "jsd_sources", "propensity_strata", "markov_attribution",
      "hilbert_layout", "auc_by_source", "qini_curve",
      "isotonic_calibration", "l_diversity",
      "overdispersion_fit", "poisson_em",
      "psi_drift", "brier_decomposition", "shapley_attribution",
      "er_jaro_winkler", "er_damerau_census",
      "anova_f", "kruskal_wallis", "cohens_kappa", "mcnemar_test",
      "kendall_tau_daily", "t_closeness", "adamic_adar", "ccf_leadlag",
      "map_mrr_eval", "cochrans_q", "fleiss_kappa", "good_turing",
      "vocab_chao1", "burrows_delta", "snm_blocking", "lmdir_score",
      "hits_scores", "pairwise_welch_bh", "mutual_info_rules", "cramers_v",
      "jarque_bera", "durbin_watson", "w2v_context_pairs",
      "negative_sampling_table",
      // round-10 additions: 1-2 days of events means empty pair sets,
      // all-tied medians, incomplete Friedman blocks, single-member
      // variance groups, and an empty lag join — each must yield
      // 0 rows or a NULL-stat row, never a throw
      "wilcoxon_signed_rank", "runs_test", "friedman_test",
      "bartlett_test", "cohens_d", "granger_causality",
      "jpeg_ac_stats", "table_stats_sketch", "curation_funnel",
      "token_burstiness", "key_skew_gini",
      // round-11 additions: the web-curation gate on a tiny corpus
      // (single-doc domains, blocklist matching nothing)
      "url_host_parse", "domain_blocklist_gate", "domain_caps",
      "url_canonicalize", "domain_quality_profile")
    round8.foreach { name =>
      try SparkEntry.queries(name)(spark, dir).collect()
      catch { case e: Throwable =>
        fail(s"$name threw on the tiny corpus: ${e.getMessage}")
      }
    }
    // degenerate embedding table: identical vectors (zero centered
    // moment matrix) plus an all-zero vector (no energy) — the linear
    // algebra queries must yield zero/NULL rows, not divide by zero
    val dir2 = java.nio.file.Files.createTempDirectory("graft_tiny_emb").toString
    Seq((0L, Array.fill(64)(0.25f), 0), (1L, Array.fill(64)(0.25f), 0),
      (2L, Array.fill(64)(0.0f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir2/embeddings.parquet")
    Seq("pca_power_iteration", "rp_project_audit").foreach { name =>
      try SparkEntry.queries(name)(spark, dir2).collect()
      catch { case e: Throwable =>
        fail(s"$name threw on degenerate embeddings: ${e.getMessage}")
      }
    }
  }
}
