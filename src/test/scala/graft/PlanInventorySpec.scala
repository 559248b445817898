package graft

/** Suite-wide plan-shape net over EVERY registered query (the per-query
  * plan tests pin individual shapes; this pins the invariants that must
  * hold across the whole surface, so a new query that accidentally
  * plans a cartesian product or an unbounded single-partition exchange
  * fails here before it ships). PLANS.md is the human-readable dump of
  * the same compilation pass (graft.PlanAudit).
  */
class PlanInventorySpec extends SparkSpec {

  /** Single-partition exchanges that are CORRECT because the exchanged
    * data is aggregate-bounded at that point: global scalar rollups
    * (one-row answers, corpus totals feeding a broadcast), driver-bound
    * argmax steps, bounded final summaries. A name on this list is a
    * claim someone verified the bound — new entries need the same look.
    */
  private val singlePartitionOk = Set(
    "dup_triangles",      // global triangle census: one output row
    "source_mix",         // global temperature normalization over |sources| rows
    "unigram_logprob",    // corpus token total N: one row, broadcast back
    "perplexity_buckets", // same N derivation as unigram_logprob
    "tfidf_top_terms",    // corpus doc count N for the idf term
    "dq_checks",          // fixed 5-row quality summary
    "null_semantics",     // one-row semantics probe
    "q6_forecast", "q14_promo", "q17_small_qty", "q19_disjunctive",
    "q22_idle_rich",      // TPC-H single-row answers
    "q15_top_supplier",   // global MAX(total_revenue) subquery: one row
    "q11_important_stock",// global value sum for the threshold: one row
    "funnel_steps",       // one-row funnel summary
    "bpe_merges",         // per-round argmax: one row per merge round
    "dsir_select",        // corpus totals (tt, rr): one row, broadcast back
    "mix_temperature",    // weight normalizer Z: one row, broadcast back
    "decayed_engagement", // global max event time: one row, broadcast back
    "curriculum_order",   // bucket-offset cumsum over the |buckets|-row census
    "trigram_backoff",    // train totals (N, V): one row, broadcast back
    "pmi_collocations",   // corpus totals (N, Nb): one row each, broadcast back
    "lang_id_nb",         // vocab size V + train doc total: one row each
    "bm25_score",         // one census row (N, tot_dl, per-term dfs), broadcast back
    "kneser_ney_bigram",  // train totals (Nbt, Vc): one row, broadcast back
    "compaction_plan",    // cumsum window over the manifest-sized file census
    "key_skew_gini",      // ≤64-row bit-length bucket-offset cumsum + two-level top-10 head (≤ 10·B rows) — both CONSTANT-bounded (census cumsum is bl-partitioned since r11)
    "bloom_fpr_audit",    // four one-row censuses cross-joined into the answer
    "join_cardinality_audit", // four one-row profile/count aggregates
    "quantile_normalize", // cumsum window over the VALUE census (distinct lengths)
    "minhash_recall_audit", // one-row recall census rollup
    "winsorize_stats",    // census cumsum + one-row clip-bounds rollup
    "graph_modularity",   // one-row edge census (m) broadcast back
    "rfm_segments",       // ntile windows over the USER census
    "event_type_lift",    // basket total nu: one row, broadcast back
    "token_burstiness",   // two-level top-30: global window sees ≤ 30·B bucket winners, never the vocab
    "table_stats",        // one-row ANALYZE-wide aggregate, unpivoted
    "table_stats_sketch", // two one-row aggregates (sketch + exact audit branch), unpivoted
    "curation_funnel",    // one-row stage/domain censuses + one-row sequence count, unpivoted to 6 rows
    "hash_uniformity_chi2", // one-row rollup of the 256-bucket census
    "benford_audit",      // whole-frame window over the 9-digit census
    "pca_power_iteration",// GramMatrixAgg global agg (exchange carries n_partitions d²+d+1-long buffers) + renormalizer windows over the 64-row iterate
    "mann_whitney",       // rank cumsum over the length census + one-row totals
    "chi_square_independence", // marginal windows over the 120-cell census
    "autocorrelation",    // one-row (n, Σc) and Σdev² censuses
    "bootstrap_ci",       // rank window over the 200-row resample census
    "roc_auc",            // rank cumsum over the score census + one-row totals
    "ols_cramer",         // one-row moment census (min-t, 10 moments)
    "markov_entropy_rate",// whole-frame window over the <=25-cell transition census
    "graph_assortativity",// one-row degree-moment census
    "kaplan_meier",       // risk/product windows over the lifetime-day census
    "forecast_backtest",  // one-row split-day census, broadcast back
    "var_es",             // rank window over the |days| census + one-row tail rollups
    "ttest_welch",        // one-row corpus-moment census, broadcast back
    "mad_outliers",       // median/MAD rank windows over the |days| census
    "watermark_delay_audit", // exclusive-prefix window over the arrival-hour bucket census
    "did_estimate",       // one-row split-day census + one-row 8-moment cell census
    "referential_integrity", // one-row per-edge orphan/childless rollups
    "pk_uniqueness",      // one-row per-table key-census rollups
    "conversion_ztest",   // one-row four-number conversion census
    "logrank_test",       // risk windows over the lifetime census + one-row O/E/V rollup
    "ipf_raking",         // one-row margin census; scaling windows on the |cells| census
    "hurst_exponent",     // rank/slope windows over the hour census and 4-point fit
    "levene_bf",          // one-row F census (20-group rollup), broadcast back
    "benjamini_hochberg", // BH rank/step-up windows over the |sources|-row family
    "cmh_test",           // one-row strata rollup (5 decimal sums)
    "tfidf_cosine_knn",   // one-row doc-count census (the idf N), broadcast back
    "sprt_boundary",      // cumulative windows over the |days| census
    "holt_winters",       // t-index window + single fold group, both |hours|-census-sized
    "jsd_sources",        // one-row corpus-total census, broadcast back
    "propensity_strata",  // ATE windows over the <=4-row stratum census
    "qini_curve",         // cumulative windows over the |distinct activity| census
    "overdispersion_fit", // one-row three-moment rollup of the user census
    "poisson_em",         // one-row param rows per EM round over the count census
    "psi_drift",          // one-row corpus-total census onto the (source x bin) grid
    "brier_decomposition", // one-row moment rollups of the 11-bin census
    "er_damerau_census",  // cumulative window over the <=|name| distance census
    "anova_f",            // one-row moment rollups (k, nt, gx, term sum)
    "kruskal_wallis",     // rank cumsum over the length census + one-row totals
    "cohens_kappa",       // one-row confusion census
    "mcnemar_test",       // one-row discordant-cell census
    "kendall_tau_daily",  // one-row pair rollup of the |days| census
    "t_closeness",        // one-row (nt, m) global census, broadcast back
    "cochrans_q",         // one-row five-integer rater census
    "fleiss_kappa",       // one-row rollup of the 4-cell row-sum census
    "vocab_chao1",        // one-row FoF-census rollup
    "snm_blocking",       // exclusive-prefix window over the 26-bucket census
    "negative_sampling_table", // bucket-offset cumsum over the <=|alphabet|²-row prefix-bucket census
    "lmdir_score",        // one-row (N, tot_dl, ctfs) census, broadcast back
    "hits_scores",        // one-row L1 normalizers per iteration over the type census
    "pairwise_welch_bh",  // BH rank/step-up windows over the 190-row pair family
    "mutual_info_rules",  // one-row confusion census
    "cramers_v",          // one-row marginal-count rollups onto the (lang x source) grid
    "jarque_bera",        // one-row four-moment rollup of the hour census
    "durbin_watson",      // one-row (n, sc) census + one-row num/den rollups
    "wilcoxon_signed_rank", // rank cumsum over the |distinct diffs| census (≤ |days|)
    "runs_test",          // median/lag windows over the |days| census
    "friedman_test",      // one-row k-type rollup (day windows are day-partitioned)
    "bartlett_test",      // one-row k-group moment rollup
    "cohens_d",           // one-row two-group moment census
    "granger_causality")  // one-row ten-moment census of the lag-joined days

  /** Broadcast nested-loop joins that are CORRECT because the
    * broadcast side is tiny by construction: ANN query sets (vec_id <
    * 20 with a non-equi self-exclusion) and one-row corpus totals.
    */
  private val bnljOk = Set(
    "ann_bruteforce", "ann_quantized", "ann_pq",
    "knn_label_noise", // broadcast audited subset (vec_id < 50), like ann_bruteforce
    "dup_triangles",
    "unigram_logprob", "perplexity_buckets", "tfidf_top_terms",
    "q11_important_stock",
    "dsir_select", "mix_temperature", // one-row totals cross-joined back
    "negative_sampling_table", // one-row normalizer Z cross-joined back
    "hard_negatives", // label-inequality join; broadcast side is the <20-vector query set
    "vocab_topk_mass", // |Ks|-row literal k table cross-joined onto the |langs|-row totals
    "decayed_engagement", // one-row max-ts cross-joined back
    "ks_drift", // source-pair cross (a.source < b.source) over the |sources|-row census
    "bitext_mine", // broadcast of the <40-vector query side, like ann_bruteforce
    "semantic_decontamination", // broadcast FIXED eval slice (vec_id % 41 = 0 under a constant id ceiling, ~49 vectors at any SF) + 3-row tau dim
    "trigram_backoff", // one-row (N, V) totals cross-joined back
    "pmi_collocations", // one-row (N, Nb) totals cross-joined back
    "lang_id_nb", // |classes|-row model grid + one-row V/ndocs cross-joined
    "bm25_score", // one-row stats census cross-joined back
    "kneser_ney_bigram", // one-row (Nbt, Vc) totals cross-joined back
    "quality_pr_curve", // 9-row threshold dim cross-joined onto the scan
    "key_skew_gini", // one-row head census cross-joined onto the totals row
    "bloom_fpr_audit", // one-row count censuses cross-joined together
    "ann_probe_recall_curve", // broadcast query side + 4-row nprobe dim, like ann_bruteforce
    "join_cardinality_audit", // one-row profile rows cross-joined together
    "quantile_normalize", // 11-row grid dim x value census cross-joins
    "hll_overlap_est", // |sources|-row sketch census self-paired (a < b)
    "minhash_recall_audit", // one-row doc-count census cross-joined back
    "winsorize_stats", // one-row clip-bounds row cross-joined onto the scan
    "dedup_threshold_sweep", // 5-row threshold dim cross-joined onto the pair frame
    "graph_modularity", // one-row edge census cross-joined back
    "rfm_segments", // one-row global-max-ts census cross-joined back
    "event_type_lift", // one-row basket total cross-joined back
    "token_burstiness", // one-row doc-count census cross-joined back
    "mann_whitney", // one-row (nt, ties) totals cross-joined back
    "autocorrelation", // hour-census lag self-join (time-span-bounded) + one-row censuses
    "bootstrap_ci", // one-row full-mean census cross-joined back
    "file_skipping_audit", // month-dim x file-census interval join, both census-sized
    "roc_auc",  // one-row doc-count census cross-joined back
    "ols_cramer", // one-row min-t census cross-joined onto the hour census
    "kaplan_meier", // one-row horizon census cross-joined onto the user census
    "forecast_backtest", // one-row split-day census cross-joined onto the hour census
    "var_es", // one-row VaR/tail censuses cross-joined together
    "ttest_welch", // one-row corpus-moment census cross-joined back
    "mad_outliers", // one-row median/MAD censuses cross-joined back
    "runs_test", // one-row median census cross-joined onto the |days| census
    "curation_funnel", // one-row stage census x one-row domain census x one-row sequence count
    "did_estimate", // one-row split-day census cross-joined onto the purchase scan
    "referential_integrity", // one-row orphan/childless rollups cross-joined per edge
    "logrank_test", // one-row horizon census cross-joined onto the user census
    "ipf_raking", // one-row margin census cross-joined onto the cell census
    "hurst_exponent", // 4-row block-size dim cross-joined onto the hour census
    "levene_bf", // one-row F census cross-joined onto the group census
    "benjamini_hochberg", // one-row (nt, ties) totals, like mann_whitney
    "tfidf_cosine_knn", // one-row doc-count census cross-joined onto the postings
    "ndcg_eval", // broadcast query side (vec_id < 20), like ann_bruteforce
    "jsd_sources", // one-row corpus-total census cross-joined onto the vocab rows
    "poisson_em", // one-row param row cross-joined onto the count census per EM round
    "psi_drift", // 11-row bin grid + one-row corpus total onto the source census
    "brier_decomposition", // one-row global moments onto the 11-bin census
    "shapley_attribution", // 16-row coalition-value table self-paired per channel
    "anova_f",            // one-row moment rollups cross-joined together
    "kruskal_wallis",     // one-row (k, ssum) x (nt, ties) rollups cross-joined
    "kendall_tau_daily",  // |days|-row census self-paired (a.d < b.d)
    "t_closeness",        // |values|-row (≤5) sensitive census + one-row (nt, m) cross-joined
    "ccf_leadlag",        // 15-row literal lag dim cross-joined onto the day census
    "map_mrr_eval",       // broadcast query side (vec_id < 20), like ann_bruteforce
    "burrows_delta",      // 20-row top-token dim cross-joined onto the source census
    "lmdir_score",        // one-row stats census cross-joined back, like bm25_score
    "hits_scores",        // one-row normalizer cross-joined onto the type census per iteration
    "pairwise_welch_bh",  // |sources|-row moment census self-paired (a.source < b.source)
    "cramers_v",          // |langs|x|sources| marginal grid + one-row totals cross-joined
    "jarque_bera",        // one-row (n, sc) census cross-joined onto the hour census
    "durbin_watson")      // one-row num/den/(n, sc) rollups cross-joined together
  // (mmr_rerank's retrieval BNLJ — broadcast query side, like
  // ann_bruteforce — executes EAGERLY at localCheckpoint time, so the
  // final plan the inventory sees starts from the materialized
  // shortlist and contains no BNLJ.)

  test("no query plans a cartesian product; single-partition exchanges and BNLJs stay allowlisted") {
    val offenders = SparkEntry.allQueries.map { q =>
      val plan = q.run(spark, sf0001).queryExecution.executedPlan.toString
      val cart = "CartesianProduct".r.findAllMatchIn(plan).size
      val single = "Exchange SinglePartition".r.findAllMatchIn(plan).size
      val bnlj = "BroadcastNestedLoopJoin".r.findAllMatchIn(plan).size
      (q.name, cart, single, bnlj)
    }
    val carts = offenders.filter(_._2 > 0).map(_._1)
    assert(carts.isEmpty, s"cartesian products in: $carts")
    val badSingle = offenders.filter(o => o._3 > 0 && !singlePartitionOk(o._1)).map(_._1)
    assert(badSingle.isEmpty,
      s"unreviewed single-partition exchanges in: $badSingle — verify the " +
        "exchanged data is aggregate-bounded, then extend the allowlist")
    val badBnlj = offenders.filter(o => o._4 > 0 && !bnljOk(o._1)).map(_._1)
    assert(badBnlj.isEmpty,
      s"unreviewed broadcast nested-loop joins in: $badBnlj — verify the " +
        "broadcast side is bounded, then extend the allowlist")
    // the allowlists must not drift stale: every listed name still
    // exists and still exhibits the shape it excuses
    val byName = offenders.map(o => o._1 -> o).toMap
    singlePartitionOk.foreach { n =>
      assert(byName.contains(n), s"allowlisted query $n no longer exists")
      assert(byName(n)._3 > 0, s"$n no longer plans a single-partition exchange — drop it from the allowlist")
    }
    bnljOk.foreach { n =>
      assert(byName(n)._4 > 0, s"$n no longer plans a BNLJ — drop it from the allowlist")
    }
  }
}
