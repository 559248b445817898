package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the round-8 closing wave (k-group inference,
  * rater agreement, privacy EMD, link prediction, SNM blocking,
  * vocabulary estimators, stylometry, retrieval eval). The DuckDB
  * oracle gate owns value-level correctness; these pin what a hash
  * compare can't: range/sign invariants, detection on constructed
  * fixtures, sweep monotonicity, and structural exclusions.
  */
class InferenceSpec extends SparkSpec {

  private def run(name: String, dir: String = sf0001) =
    SparkEntry.queries(name)(spark, dir)

  // ---- constructed documents fixtures ------------------------------

  /** Write a documents.parquet of (doc_id, text, lang, source,
    * n_chars) rows and return the dir. */
  private def docsDir(rows: Seq[(Long, String, String, String, Long)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_inf").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("anova_f and kruskal_wallis: nonnegative statistics, exact dof, and a constructed separation") {
    val r = run("anova_f", sf001).first()
    assert(r.getAs[Long]("k") === 20 && r.getAs[Long]("df_between") === 19)
    assert(r.getAs[Double]("ssb") >= 0 && r.getAs[Double]("ssw") >= 0)
    assert(r.getAs[Double]("f") >= 0)
    val kw = run("kruskal_wallis", sf001).first()
    assert(kw.getAs[Long]("df") === 19)
    assert(kw.getAs[Double]("h") >= 0)
    // tie correction can only GROW H (divides by 1 - ties-term <= 1)
    assert(kw.getAs[Double]("h_tie_corrected") >= kw.getAs[Double]("h"))
    // two sources with disjoint length ranges: KW's H approaches its
    // k=2 maximum (n-1)·(clear separation), F is large
    val sep = docsDir(
      (0L until 12L).map(i => (i, "a b", "en", "lo", 50L + i)) ++
        (12L until 24L).map(i => (i, "a b c", "en", "hi", 500L + i)))
    val f2 = run("anova_f", sep).first().getAs[Double]("f")
    assert(f2 > 100.0, s"separated sources produced small F: $f2")
    val h2 = run("kruskal_wallis", sep).first().getAs[Double]("h")
    assert(h2 > 15.0, s"separated sources produced small H: $h2 (max 23)")
  }

  test("agreement family: ranges, unanimity degeneracy, and McNemar symmetry") {
    val ck = run("cohens_kappa", sf001).first()
    assert(ck.getAs[Double]("kappa") >= -1.0 && ck.getAs[Double]("kappa") <= 1.0)
    assert(ck.getAs[Double]("po") >= 0.0 && ck.getAs[Double]("po") <= 1.0)
    val fk = run("fleiss_kappa", sf001).first()
    assert(fk.getAs[Double]("kappa") >= -1.0 && fk.getAs[Double]("kappa") <= 1.0)
    val cq = run("cochrans_q", sf001).first()
    assert(cq.getAs[Double]("q_stat") >= 0.0)
    assert(cq.getAs[Double]("p") >= 0.0 && cq.getAs[Double]("p") <= 1.0)
    // every rule votes 1 on every doc -> all three raters unanimous:
    // kappas and Q undefined (NULL), never a throw. Text chosen so
    // a (n_chars>=300), b (mean word len>=5.4), c (TTR>=0.7) all fire.
    val unanimous = docsDir(Seq(
      (0L, "abcdefgh ijklmnop qrstuvwx yzabcdef", "en", "s", 400L),
      (1L, "abcdefgi jklmnopq rstuvwxy zabcdefg", "en", "s", 400L)))
    val ck2 = run("cohens_kappa", unanimous).first()
    assert(ck2.isNullAt(ck2.fieldIndex("kappa")), "pe=1 kappa must be NULL")
    val fk2 = run("fleiss_kappa", unanimous).first()
    assert(fk2.isNullAt(fk2.fieldIndex("kappa")), "pe=1 kappa must be NULL")
    val cq2 = run("cochrans_q", unanimous).first()
    assert(cq2.isNullAt(cq2.fieldIndex("q_stat")), "unanimous Q must be NULL")
    val mn2 = run("mcnemar_test", unanimous).first()
    assert(mn2.isNullAt(mn2.fieldIndex("chi2")), "b+c=0 chi2 must be NULL")
    // McNemar depends on the discordant PAIR symmetrically: (b,c) on
    // the fixture vs the rater-swapped corpus give the same statistic
    val mn = run("mcnemar_test", sf001).first()
    val sym = (mn.getAs[Long]("b") - mn.getAs[Long]("c")).toDouble
    val chi = mn.getAs[Double]("chi2")
    assert(math.abs(chi * (mn.getAs[Long]("b") + mn.getAs[Long]("c")) -
      sym * sym) < 1e-4, "chi2 != (b-c)^2/(b+c) identity")
  }

  test("kendall_tau_daily is in [-1,1]; constructed concordant series hits +1") {
    val r = run("kendall_tau_daily", sf001).first()
    val t = r.getAs[Double]("tau_b")
    assert(t >= -1.0 && t <= 1.0)
    // events where clicks and purchases both strictly grow by day:
    // every pair concordant, no ties -> tau_b = 1 exactly
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_tau").toString
    val base = java.sql.Timestamp.valueOf("2024-01-01 01:00:00").getTime
    val rows = (0 until 6).flatMap { d =>
      val t0 = base + d * 86400000L
      (0 to d).flatMap(i => Seq(
        (d * 100L + i * 2, new java.sql.Timestamp(t0 + i * 1000), 1L, "click", 1.0, "{}"),
        (d * 100L + i * 2 + 1, new java.sql.Timestamp(t0 + i * 1000 + 1), 1L, "purchase", 1.0, "{}")))
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val one = run("kendall_tau_daily", dir).first()
    assert(one.getAs[Double]("tau_b") === 1.0,
      s"strictly concordant series gave ${one.getAs[Double]("tau_b")}")
  }

  test("t_closeness verdicts are monotone non-increasing in t and bounded by group count") {
    val rows = run("t_closeness", sf001).collect()
    val over = rows.map(_.getAs[Long]("groups_over"))
    assert(over.toSeq === over.sortBy(-_).toSeq, "groups_over must fall as t rises")
    val ng = rows.map(_.getAs[Long]("n_groups")).distinct
    assert(ng.length === 1 && over.forall(_ <= ng.head))
  }

  test("adamic_adar predicts only NON-edges with positive scores; snm_blocking finds the adjacent typo") {
    val aa = run("adamic_adar", sf001).collect()
    aa.foreach { r =>
      assert(r.getAs[Double]("aa_score") > 0.0)
      assert(r.getAs[Long]("n_common") >= 1L)
      assert(r.getAs[Long]("d1") < r.getAs[Long]("d2"))
    }
    // SNM on a constructed part table: a typo pair is adjacent in
    // name order and must surface; an unrelated name must not pair
    // with anything above the band
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_snm").toString
    Seq((1L, "turquoise anvil", "Brand#1"),
        (2L, "turquoise anvjl", "Brand#2"),   // typo twin of 1
        (3L, "zzzz unrelated widget", "Brand#3"))
      .toDF("p_partkey", "p_name", "p_brand")
      .write.parquet(s"$dir/part.parquet")
    val pairs = run("snm_blocking", dir)
      .select("key_a", "key_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), s"typo twin not found: $pairs")
    assert(pairs.forall(p => p._1 != 3L && p._2 != 3L),
      s"unrelated name matched: $pairs")
  }

  test("good_turing mass shifts down and chao1 >= observed richness") {
    val gt = run("good_turing", sf001).collect()
    // singleton adjustment always exists when doubletons do, and the
    // GT identity r* = (r+1)N_{r+1}/N_r holds per row
    gt.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("r_star"))) {
        assert(r.getAs[Double]("r_star") >= 0.0)
      }
      assert(r.getAs[Long]("n_r") > 0)
    }
    val c = run("vocab_chao1", sf001).first()
    assert(c.getAs[Long]("n1") >= 0 && c.getAs[Long]("v") > 0)
    if (!c.isNullAt(c.fieldIndex("chao1")))
      assert(c.getAs[Double]("chao1") >= c.getAs[Long]("v").toDouble,
        "chao1 is a lower bound on TRUE richness, >= observed V")
    val cov = c.getAs[Double]("coverage")
    assert(cov >= 0.0 && cov <= 1.0)
  }

  test("burrows_delta is a symmetric-by-construction nonnegative matrix over all source pairs") {
    val d = run("burrows_delta", sf001).collect()
    val srcs = Tables.load(spark, sf0001, "documents")
      .select("source").distinct().count()
    assert(d.length === (srcs * (srcs - 1) / 2).toInt)
    d.foreach(r => assert(r.getAs[Double]("delta") >= 0.0))
    // identical style twin: duplicate one source's docs under a new
    // name -> delta(clone pair) must be the matrix minimum (0)
    import spark.implicits._
    val base = Tables.load(spark, sf0001, "documents")
      .as[(Long, String, String, String, Long)].collect()
    val clone = base.filter(_._4 == "src0")
      .map(r => (r._1 + 100000L, r._2, r._3, "zzclone", r._5))
    val dir = docsDir((base ++ clone).toSeq)
    val d2 = run("burrows_delta", dir).collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b"),
        r.getAs[Double]("delta")))
    val cloneDelta = d2.find(p => p._1 == "src0" && p._2 == "zzclone").get._3
    assert(cloneDelta === 0.0, s"style clone delta nonzero: $cloneDelta")
  }

  test("map_mrr_eval: metrics bounded, rr consistent with a relevant-hit count of zero") {
    val rows = run("map_mrr_eval", sf001).collect()
    rows.foreach { r =>
      val rr = r.getAs[Double]("rr")
      assert(rr >= 0.0 && rr <= 1.0)
      if (r.getAs[Long]("n_rel_at10") == 0L) assert(rr === 0.0)
      if (!r.isNullAt(r.fieldIndex("ap10"))) {
        val ap = r.getAs[Double]("ap10")
        assert(ap >= 0.0 && ap <= 1.0)
        // AP can only be positive if something relevant ranked
        if (r.getAs[Long]("n_rel_at10") == 0L) assert(ap === 0.0)
      }
    }
  }

  test("hits_scores: L1-normalized nonnegative iterates; MI/V effect sizes bounded; post-hoc family complete") {
    val h = run("hits_scores", sf001).collect()
    h.foreach { r =>
      assert(r.getAs[Double]("hub") >= 0.0 && r.getAs[Double]("authority") >= 0.0)
    }
    // each side was L1-normalized then 9-dp-rounded: sums land within
    // n·5e-10 of 1
    assert(math.abs(h.map(_.getAs[Double]("hub")).sum - 1.0) < 1e-6)
    assert(math.abs(h.map(_.getAs[Double]("authority")).sum - 1.0) < 1e-6)
    val mi = run("mutual_info_rules", sf001).first()
    assert(mi.getAs[Double]("mi_nats") >= 0.0, "MI is nonnegative")
    assert(mi.getAs[Double]("nmi") >= 0.0 && mi.getAs[Double]("nmi") <= 1.0)
    // MI <= min(H(a), H(b))
    assert(mi.getAs[Double]("mi_nats") <=
      math.min(mi.getAs[Double]("h_a"), mi.getAs[Double]("h_b")) + 1e-9)
    val v = run("cramers_v", sf001).first()
    assert(v.getAs[Double]("v") >= 0.0 && v.getAs[Double]("v") <= 1.0)
    assert(v.getAs[Long]("df") ===
      (v.getAs[Long]("n_rows") - 1) * (v.getAs[Long]("n_cols") - 1))
    // the post-hoc family covers every source pair, and on this
    // uniform-generator fixture agrees with the non-significant
    // omnibus F: zero BH discoveries
    val pw = run("pairwise_welch_bh", sf001).collect()
    assert(pw.length === 190)
    assert(!pw.exists(_.getAs[Boolean]("significant")),
      "uniform sources must yield no BH discovery (omnibus F ~ 0.84)")
  }

  test("ccf_leadlag: r in [-1,1] on every lag; lag 0 row present with the full day overlap") {
    val rows = run("ccf_leadlag", sf001).collect()
    rows.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("r"))) {
        val v = r.getAs[Double]("r")
        assert(v >= -1.0 && v <= 1.0, s"lag ${r.getAs[Long]("lag")}: $v")
      }
    }
    val zero = rows.find(_.getAs[Long]("lag") == 0L).get
    val span = rows.map(_.getAs[Long]("n")).max
    assert(zero.getAs[Long]("n") === span, "lag 0 must see every day")
  }
}
