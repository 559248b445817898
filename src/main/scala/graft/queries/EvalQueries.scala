package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.functions.PortableHash.{duckH32, h32}

/** Pipeline-evaluation + table-maintenance operators — the audit layer
  * a production curation run wraps around the scoring/dedup passes:
  * a properly smoothed LM (interpolated Kneser-Ney), classifier
  * calibration and PR sweeps for the heuristic quality scorers, class-
  * conditional embedding drift, and size-based compaction planning for
  * the output file layout.
  *
  * Reference grounding: the reference's transform stage is a per-record
  * value rewrite gated on dimension state
  * (`/root/reference/src/main/java/ru/kafka/KafkaStreamApp.java:103-126`);
  * these queries are the batch QA counterparts a team runs before
  * trusting such a pipeline's output at corpus scale.
  *
  * Determinism contract (same as the rest of the suite): every double
  * that crosses an ORDER-OF-SUMMATION boundary is pre-rounded to 6 dp
  * and summed as DECIMAL, so Spark's partition-order-dependent sums and
  * DuckDB's sequential sums are bit-identical.
  */
object EvalQueries {

  // ---- shared per-doc quality features -------------------------------
  //
  // quality_pr_curve and score_calibration both need (score, label)
  // per document, where score is EXACTLY quality_logit's integer-unit
  // sigmoid and label is EXACTLY gopher_rules' `keep` conjunction.
  // They are defined once here (both the Spark exprs and the DuckDB
  // CTE) so the two queries cannot drift from each other; the
  // duplication with quality_logit/gopher_rules themselves is pinned
  // by EvalSpec's cross-query consistency test.

  /** DuckDB CTE `sl(doc_id, score_u, label)` over `documents`. */
  private[queries] val duckScoreLabel: String =
    """f AS (SELECT doc_id,
      |    len(string_split(text, ' ')) AS n_toks,
      |    len(list_distinct(string_split(text, ' '))) AS n_types,
      |    len(list_filter(string_split(text, ' '), t -> t = 'the' OR t = 'a')) AS n_stop,
      |    length(text) AS n_ch FROM documents),
      |z AS (SELECT doc_id, n_toks, n_stop, n_ch,
      |    -1.0 + 2.0 * least(1.0, n_toks / 100.0)
      |         + 1.5 * (CAST(n_types AS DOUBLE) / n_toks)
      |         - 2.0 * (CAST(n_stop AS DOUBLE) / n_toks)
      |         + 0.3 * (CAST(n_ch - n_toks + 1 AS DOUBLE) / n_toks) AS z
      |  FROM f WHERE n_toks > 0),
      |g AS (SELECT doc_id, string_split(text, ' ') AS a, length(text) AS nch FROM documents),
      |gl AS (SELECT doc_id,
      |    len(a) BETWEEN 20 AND 90
      |      AND (nch - (len(a) - 1)) * 1.0 / len(a) >= 4.0
      |      AND len(list_filter(a, t -> t = 'the')) + len(list_filter(a, t -> t = 'a')) >= 2
      |      AND list_max(list_transform(list_distinct(a), w -> len(list_filter(a, t -> t = w)))) * 1.0 / len(a) <= 0.125
      |    AS label FROM g WHERE len(a) > 0),
      |sl AS (SELECT z.doc_id,
      |    CAST(floor(1e6 / (1.0 + exp(-z)) + 0.5) AS BIGINT) AS score_u,
      |    CASE WHEN gl.label THEN 1 ELSE 0 END AS label
      |  FROM z JOIN gl ON z.doc_id = gl.doc_id)""".stripMargin

  /** Spark side of [[duckScoreLabel]] over ANY (doc_id, text) frame —
    * batch or streaming (the expressions are stateless row-local, so
    * [[graft.streaming.StreamCalibration]] reuses this verbatim and
    * parity with the batch queries holds by construction): one fused
    * scan-side projection producing (doc_id, score_u, label) — zero
    * shuffle; at 100 TB this is a single pass over the corpus with
    * everything in whole-stage codegen (array higher-order functions,
    * no UDFs).
    */
  private[graft] def scoreLabelOf(docs: org.apache.spark.sql.DataFrame) = {
    val a = split(col("text"), " ")
    val f = docs
      .select(col("doc_id"),
        size(a).as("n_toks"),
        size(array_distinct(a)).as("n_types"),
        size(filter(a, t => t === "the" || t === "a")).as("n_stop"),
        length(col("text")).as("n_ch"),
        ((length(col("text")) - (size(a) - 1)) * lit(1.0) / size(a)).as("mwl"),
        (graft.ops.TextAnalysis.maxTokenCount(a) * lit(1.0) / size(a))
          .as("topf"))
      .filter(col("n_toks") > 0)
    val z = lit(-1.0) +
      lit(2.0) * least(lit(1.0), col("n_toks") / 100.0) +
      lit(1.5) * (col("n_types").cast("double") / col("n_toks")) -
      lit(2.0) * (col("n_stop").cast("double") / col("n_toks")) +
      lit(0.3) * ((col("n_ch") - col("n_toks") + 1).cast("double") / col("n_toks"))
    f.select(col("doc_id"),
      floor(lit(1e6) / (lit(1.0) + exp(-z)) + 0.5).cast("long").as("score_u"),
      when(col("n_toks").between(20, 90) && col("mwl") >= 4.0 &&
        col("n_stop") >= 2 && col("topf") <= 0.125, 1).otherwise(0)
        .as("label"))
  }

  private def scoreLabel(s: org.apache.spark.sql.SparkSession, dir: String) =
    scoreLabelOf(Tables.parallelize(
      Tables.load(s, dir, "documents").select("doc_id", "text")))

  /** The calibration-bin aggregation shared by the batch query and its
    * streaming twin: quality_logit's integer bucketing with exact
    * integer sums, then the two derived doubles. On an unbounded
    * stream this is a standard streaming aggregation (11 bins of
    * state); the snapshot after any prefix equals the batch query on
    * that prefix — pinned in StreamingSpec.
    */
  private[graft] def calibrationBins(sl: org.apache.spark.sql.DataFrame) =
    sl.groupBy(expr("score_u div 100000").as("bin"))
      .agg(count(lit(1)).as("n"), sum("score_u").as("su"),
        sum("label").as("n_pos"))
      .select(col("bin"), col("n"), col("su"), col("n_pos"),
        round(col("su") / col("n") / lit(1000000.0), 6).as("avg_conf"),
        round(col("n_pos").cast("double") / col("n"), 6).as("pos_rate"),
        round(abs(col("su") / col("n") / lit(1000000.0) -
          col("n_pos").cast("double") / col("n")), 6).as("gap"))

  val Dim = 64 // embeddings fixture dimension (SimilarityQueries.Dim)

  // ---- census-derived exact order statistics --------------------------
  //
  // Shared by quantile_normalize and winsorize_stats: exact global
  // quantiles of an integer metric WITHOUT a corpus-wide sort — the
  // value at 0-based rank i is the value-census row whose cumulative
  // range covers i (one census cumsum, the StreamDrift ECDF trick),
  // interpolated with the exact `percentiles` two-sided formula.

  /** DuckDB CTEs `vc, cm, nn, gq, g, q` with `q(k, qv)` = the exact
    * quantile at position ps(k) of `documents.n_chars`. Callers
    * append their tail after a trailing comma.
    */
  private def duckCensusQuantiles(ps: Seq[Double]): String = {
    val ks = ps.zipWithIndex
      .map { case (p, k) => s"($k, $p)" }.mkString(", ")
    s"""vc AS (SELECT n_chars AS v, COUNT(*) AS c FROM documents GROUP BY 1),
       |cm AS (SELECT v, c, SUM(c) OVER (ORDER BY v
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM vc),
       |nn AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM vc),
       |gq AS (SELECT k, p * (n - 1) AS pos
       |       FROM (SELECT * FROM (VALUES $ks) AS t(k, p)) CROSS JOIN nn),
       |g AS (SELECT k, pos,
       |    MIN(CASE WHEN cum - 1 >= CAST(floor(pos) AS BIGINT) THEN v END) AS vlo,
       |    MIN(CASE WHEN cum - 1 >= CAST(ceil(pos) AS BIGINT) THEN v END) AS vhi
       |  FROM gq CROSS JOIN cm GROUP BY k, pos),
       |q AS (SELECT k, CASE WHEN floor(pos) = ceil(pos) THEN CAST(vlo AS DOUBLE)
       |        ELSE (ceil(pos) - pos) * vlo + (pos - floor(pos)) * vhi END AS qv FROM g)"""
      .stripMargin
  }

  /** Spark twin of [[duckCensusQuantiles]]: (k, qv) rows for the
    * requested quantile positions over `d`'s `n_chars`. `d` must be
    * the documents frame; the census and the grid are census-sized,
    * so every join against the result broadcasts.
    */
  private[graft] def censusQuantiles(d: org.apache.spark.sql.DataFrame,
                                     ps: Seq[Double]) = {
    import org.apache.spark.sql.expressions.Window
    val s = d.sparkSession
    val vc = d.groupBy(col("n_chars").as("v")).agg(count(lit(1)).as("c"))
    val cm = vc.withColumn("cum", sum(col("c")).over(Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val nn = vc.agg(sum("c").as("n"))
    import s.implicits._
    val gq = ps.zipWithIndex.map { case (p, k) => (k, p) }
      .toDF("k", "p")
      .crossJoin(broadcast(nn))
      .select(col("k"), (col("p") * (col("n") - 1)).as("pos"))
    gq.crossJoin(broadcast(cm))
      .groupBy("k", "pos")
      .agg(min(when(col("cum") - 1 >= floor(col("pos")).cast("long"), col("v")))
          .as("vlo"),
        min(when(col("cum") - 1 >= ceil(col("pos")).cast("long"), col("v")))
          .as("vhi"))
      .select(col("k"),
        when(floor(col("pos")) === ceil(col("pos")), col("vlo").cast("double"))
          .otherwise((ceil(col("pos")) - col("pos")) * col("vlo") +
            (col("pos") - floor(col("pos"))) * col("vhi")).as("qv"))
  }

  def all: Seq[Q] = Seq(

    // INTERPOLATED KNESER-NEY BIGRAM LM (Kneser & Ney, ICASSP '95;
    // Chen & Goodman '98 eq. 4.2) — the properly-smoothed step up
    // from bigram_logprob's MLE and trigram_backoff's stupid backoff:
    // absolute discounting D=0.75 with the discounted mass
    // redistributed over the CONTINUATION distribution
    // Pcont(w2) = N1+(.w2) / N1+(..), which is what makes KN the
    // default smoothing for count-based LMs. Counts train on the
    // even-doc_id half so odd documents genuinely exercise the
    // unseen-bigram and unseen-history paths; Pcont is add-one
    // smoothed over the continuation vocabulary so unseen w2 stays
    // finite. All count tables are marginals of ONE per-doc bigram
    // count (tokenize once, derive the rest) and are
    // vocabulary-bounded — at 100 TB they broadcast while the per-doc
    // bigram stream joins map-side, exactly the trigram_backoff
    // layout. Per-term logs round to 6 dp and sum as DECIMAL(20,6):
    // bit-identical across engines and summation orders.
    Q("kneser_ney_bigram",
      """WITH arr AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
        |bg AS (SELECT doc_id, unnest(list_zip(a[1:len(a)-1], a[2:len(a)])) AS p
        |       FROM arr WHERE len(a) >= 2),
        |bi AS (SELECT doc_id, p[1] AS w1, p[2] AS w2 FROM bg),
        |dbc AS (SELECT doc_id, w1, w2, COUNT(*) AS dc FROM bi GROUP BY 1, 2, 3),
        |b AS (SELECT w1, w2, CAST(SUM(dc) AS BIGINT) AS cb FROM dbc WHERE doc_id % 2 = 0 GROUP BY 1, 2),
        |fw AS (SELECT w1, CAST(SUM(cb) AS BIGINT) AS cu, COUNT(*) AS n1fw FROM b GROUP BY 1),
        |bw AS (SELECT w2, COUNT(*) AS n1bw FROM b GROUP BY 1),
        |tot AS (SELECT COUNT(*) AS nbt, COUNT(DISTINCT w2) AS vc FROM b)
        |SELECT dbc.doc_id AS doc_id, CAST(SUM(dc) AS BIGINT) AS n_bigrams,
        |  CAST(SUM(CASE WHEN cb IS NULL THEN dc ELSE 0 END) AS BIGINT) AS n_unseen,
        |  CAST(SUM(dc * CAST(round(ln(CASE
        |    WHEN cu IS NOT NULL THEN
        |      (CASE WHEN cb IS NOT NULL AND cb > 0.75 THEN (cb - 0.75) / cu ELSE 0.0 END)
        |      + 0.75 * n1fw / cu * ((COALESCE(n1bw, 0) + 1.0) / (nbt + vc))
        |    ELSE (COALESCE(n1bw, 0) + 1.0) / (nbt + vc) END), 6) AS DECIMAL(20,6))) AS DOUBLE) AS logprob
        |FROM dbc LEFT JOIN b USING (w1, w2) LEFT JOIN fw USING (w1)
        |  LEFT JOIN bw USING (w2) CROSS JOIN tot
        |GROUP BY 1 ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val arr = Tables.parallelize(Tables.load(s, dir, "documents")
          .select("doc_id", "text"))
        .select(col("doc_id"), col("text"), split(col("text"), " ").as("a"))
      val n = size(col("a"))
      val blen = greatest(n - 1, lit(0)) // <2 tokens -> no bigrams
      val bi = arr
        .select(col("doc_id"), explode(arrays_zip(
          slice(col("a"), lit(1), blen),
          slice(col("a"), lit(2), blen))).as("p"))
        .select(col("doc_id"), col("p.0").as("w1"), col("p.1").as("w2"))
      // score-side per-(doc, bigram) counts as a MAP-SIDE histogram
      // over the 2-shingle strings (same rationale and equivalence as
      // trigram_backoff's dtc: the corpus-wide (doc, bigram) exchange
      // never exists)
      val dbc = arr
        .select(col("doc_id"),
          explode(graft.ops.TextAnalysis.histogram(
            graft.ops.Dedup.shingles(col("text"), 2))).as("e"))
        .select(col("doc_id"),
          element_at(split(col("e.tok"), " "), 1).as("w1"),
          element_at(split(col("e.tok"), " "), 2).as("w2"),
          col("e.cnt").as("dc"))
      // trained counts artifact: materialized once (same measured
      // rationale as trigram_backoff's t3) — counted DIRECTLY from the
      // bigram occurrence stream, skipping the per-(doc, bigram)
      // intermediate the old derivation grouped by
      val b = bi.filter(col("doc_id") % 2 === 0)
        .groupBy("w1", "w2").agg(count(lit(1)).cast("long").as("cb"))
        .localCheckpoint(true)
      val fw = b.groupBy("w1")
        .agg(sum(col("cb")).as("cu"), count(lit(1)).as("n1fw"))
      val bw = b.groupBy("w2").agg(count(lit(1)).as("n1bw"))
      val tot = b.agg(count(lit(1)).as("nbt"),
        countDistinct(col("w2")).as("vc"))
      val pcont = (coalesce(col("n1bw"), lit(0)) + 1.0) /
        (col("nbt") + col("vc"))
      val p = when(col("cu").isNotNull,
          when(col("cb").isNotNull && col("cb") > 0.75,
            (col("cb") - 0.75) / col("cu")).otherwise(lit(0.0)) +
            lit(0.75) * col("n1fw") / col("cu") * pcont)
        .otherwise(pcont)
      val term = round(log(p), 6).cast(DecimalType(20, 6))
      dbc.join(broadcast(b), Seq("w1", "w2"), "left")
        .join(broadcast(fw), Seq("w1"), "left")
        .join(broadcast(bw), Seq("w2"), "left")
        .crossJoin(broadcast(tot))
        .groupBy("doc_id")
        .agg(sum(col("dc")).as("n_bigrams"),
          sum(when(col("cb").isNull, col("dc")).otherwise(lit(0)))
            .as("n_unseen"),
          sum(col("dc") * term).cast("double").as("logprob"))
        .orderBy("doc_id")
    },

    // PRECISION/RECALL THRESHOLD SWEEP — the operating-point curve for
    // the quality_logit scorer against the gopher_rules keep-label:
    // before a team picks the score cutoff for a 100 TB filter run,
    // this is the table they read. One scan computes (score, label)
    // per doc, a broadcast 9-row threshold dim fans each doc into its
    // 9 (threshold, prediction) cells, and one aggregation yields the
    // full confusion census per threshold — corpus is read ONCE for
    // all operating points, never once per threshold. P/R/F1 are
    // ratios of exact integer counts: deterministic doubles.
    Q("quality_pr_curve",
      s"""WITH $duckScoreLabel,
         |th AS (SELECT unnest(generate_series(1, 9)) AS k),
         |cell AS (SELECT k, CASE WHEN score_u >= k * 100000 THEN 1 ELSE 0 END AS pred, label
         |         FROM sl CROSS JOIN th),
         |cm AS (SELECT k, CAST(SUM(pred * label) AS BIGINT) AS tp,
         |         CAST(SUM(pred * (1 - label)) AS BIGINT) AS fp,
         |         CAST(SUM((1 - pred) * label) AS BIGINT) AS fn,
         |         CAST(SUM((1 - pred) * (1 - label)) AS BIGINT) AS tn
         |       FROM cell GROUP BY k)
         |SELECT k AS threshold, tp, fp, fn, tn,
         |  CASE WHEN tp + fp > 0 THEN round(CAST(tp AS DOUBLE) / (tp + fp), 6) END AS precision_,
         |  CASE WHEN tp + fn > 0 THEN round(CAST(tp AS DOUBLE) / (tp + fn), 6) END AS recall_,
         |  CASE WHEN 2 * tp + fp + fn > 0 THEN round(2.0 * tp / (2 * tp + fp + fn), 6) END AS f1
         |FROM cm ORDER BY threshold""".stripMargin) { (s, dir) =>
      val sl = scoreLabel(s, dir)
      val th = s.range(1, 10).select(col("id").cast("int").as("k"))
      sl.crossJoin(broadcast(th))
        .select(col("k"),
          when(col("score_u") >= col("k") * 100000, 1).otherwise(0)
            .as("pred"),
          col("label"))
        .groupBy("k")
        .agg(sum(col("pred") * col("label")).as("tp"),
          sum(col("pred") * (lit(1) - col("label"))).as("fp"),
          sum((lit(1) - col("pred")) * col("label")).as("fn"),
          sum((lit(1) - col("pred")) * (lit(1) - col("label"))).as("tn"))
        .select(col("k").as("threshold"), col("tp"), col("fp"), col("fn"),
          col("tn"),
          when(col("tp") + col("fp") > 0,
            round(col("tp").cast("double") / (col("tp") + col("fp")), 6))
            .as("precision_"),
          when(col("tp") + col("fn") > 0,
            round(col("tp").cast("double") / (col("tp") + col("fn")), 6))
            .as("recall_"),
          when(lit(2) * col("tp") + col("fp") + col("fn") > 0,
            round(lit(2.0) * col("tp") /
              (lit(2) * col("tp") + col("fp") + col("fn")), 6)).as("f1"))
        .orderBy("threshold")
    },

    // CALIBRATION BINS (reliability diagram + ECE inputs; Guo et al.,
    // ICML '17) — does quality_logit's sigmoid MEAN what it says?
    // Bins reuse quality_logit's own integer bucketing (score_u //
    // 100000), so this table extends that query's census with the
    // empirical keep-rate per bin and the |confidence - accuracy| gap
    // whose n-weighted sum is ECE. Integer sums only; the two
    // division-derived doubles are deterministic. One scan + one
    // 11-row aggregate: census-sized output at any corpus scale.
    Q("score_calibration",
      s"""WITH $duckScoreLabel
         |SELECT score_u // 100000 AS bin, COUNT(*) AS n,
         |  CAST(SUM(score_u) AS BIGINT) AS su,
         |  CAST(SUM(label) AS BIGINT) AS n_pos,
         |  round(SUM(score_u) / COUNT(*) / 1000000.0, 6) AS avg_conf,
         |  round(CAST(SUM(label) AS DOUBLE) / COUNT(*), 6) AS pos_rate,
         |  round(abs(SUM(score_u) / COUNT(*) / 1000000.0
         |            - CAST(SUM(label) AS DOUBLE) / COUNT(*)), 6) AS gap
         |FROM sl GROUP BY 1 ORDER BY bin""".stripMargin) { (s, dir) =>
      calibrationBins(scoreLabel(s, dir)).orderBy("bin")
    },

    // CLASS-CONDITIONAL EMBEDDING DRIFT — ks_drift's vector-space
    // counterpart: per-label embedding centroid vs the global
    // centroid, reported as cosine similarity and L2 shift. The
    // training-mix monitor for embedding spaces: a label whose
    // centroid swings away from the corpus centroid signals a
    // distribution change in that slice. Centroids use the suite's
    // decimal-exact mean recipe (components pre-rounded to 6 dp,
    // summed as DECIMAL(20,10) — order-independent); the global
    // centroid derives from the per-label sums, so the corpus is
    // scanned ONCE. Cross-dim reductions (dot, norms, shift) pre-round
    // each of the 64 terms and sum as DECIMAL. Everything after the
    // one per-(label, dim) aggregation is label-count-sized.
    Q("embedding_drift",
      s"""WITH ev AS (SELECT vec_id, label, i, round(CAST(embedding[i] AS DOUBLE), 6) AS v
         |    FROM (SELECT vec_id, label, embedding,
         |          unnest(generate_series(1, $Dim)) AS i FROM embeddings)),
         |lm AS (SELECT label, i, SUM(CAST(v AS DECIMAL(20,10))) AS sv, COUNT(*) AS n
         |       FROM ev GROUP BY 1, 2),
         |lc AS (SELECT label, i, CAST(sv AS DOUBLE) / n AS ml, n FROM lm),
         |gc AS (SELECT i, CAST(SUM(sv) AS DOUBLE) / SUM(n) AS mg FROM lm GROUP BY i),
         |terms AS (SELECT label, n,
         |    CAST(round(ml * mg, 6) AS DECIMAL(20,6)) AS t_dot,
         |    CAST(round(ml * ml, 6) AS DECIMAL(20,6)) AS t_nl,
         |    CAST(round(mg * mg, 6) AS DECIMAL(20,6)) AS t_ng,
         |    CAST(round((ml - mg) * (ml - mg), 6) AS DECIMAL(20,6)) AS t_sh
         |  FROM lc JOIN gc USING (i))
         |SELECT label, CAST(MIN(n) AS BIGINT) AS n_vecs,
         |  round(CAST(SUM(t_dot) AS DOUBLE) /
         |    (sqrt(CAST(SUM(t_nl) AS DOUBLE)) * sqrt(CAST(SUM(t_ng) AS DOUBLE))), 6) AS cos_to_global,
         |  round(sqrt(CAST(SUM(t_sh) AS DOUBLE)), 6) AS l2_shift
         |FROM terms GROUP BY label ORDER BY label""".stripMargin) { (s, dir) =>
      val ev = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"), col("label"),
          posexplode(col("embedding")).as(Seq("p", "e")))
        .select(col("vec_id"), col("label"), (col("p") + 1).as("i"),
          round(col("e").cast("double"), 6).as("v"))
      val lm = ev.groupBy("label", "i")
        .agg(sum(col("v").cast(DecimalType(20, 10))).as("sv"),
          count(lit(1)).as("n"))
        .localCheckpoint(true) // one scan feeds both centroid tables
      val lc = lm.select(col("label"), col("i"),
        (col("sv").cast("double") / col("n")).as("ml"), col("n"))
      val gc = lm.groupBy("i")
        .agg((sum(col("sv")).cast("double") / sum(col("n"))).as("mg"))
      lc.join(broadcast(gc), Seq("i"))
        .select(col("label"), col("n"),
          round(col("ml") * col("mg"), 6).cast(DecimalType(20, 6)).as("t_dot"),
          round(col("ml") * col("ml"), 6).cast(DecimalType(20, 6)).as("t_nl"),
          round(col("mg") * col("mg"), 6).cast(DecimalType(20, 6)).as("t_ng"),
          round((col("ml") - col("mg")) * (col("ml") - col("mg")), 6)
            .cast(DecimalType(20, 6)).as("t_sh"))
        .groupBy("label")
        .agg(min(col("n")).as("n_vecs"),
          round(sum(col("t_dot")).cast("double") /
            (sqrt(sum(col("t_nl")).cast("double")) *
              sqrt(sum(col("t_ng")).cast("double"))), 6).as("cos_to_global"),
          round(sqrt(sum(col("t_sh")).cast("double")), 6).as("l2_shift"))
        .orderBy("label")
    },

    // COMPACTION PLAN — the lakehouse table-maintenance pass
    // (Iceberg/Delta `rewrite_data_files` semantics): given the
    // current file manifest (here: 64 synthetic files = docs hashed
    // by h32(doc_id) % 64, file size = sum of member text bytes),
    // assign files in layout order to sequential target-sized output
    // bins — a file starts a new bin exactly when the running total
    // has reached the target. The manifest is metadata-sized (file
    // count, not data size: millions of rows at 100 TB, not
    // billions), so the single unpartitioned cumulative-sum window is
    // the CORRECT plan here — the data itself is never read, only the
    // per-file size census (one shuffle-light aggregate).
    Q("compaction_plan", {
      val h = duckH32("CAST(doc_id AS VARCHAR)")
      s"""WITH fm AS (SELECT $h % 64 AS file_id,
         |    CAST(SUM(length(text)) AS BIGINT) AS bytes FROM documents GROUP BY 1),
         |cum AS (SELECT file_id, bytes,
         |    SUM(bytes) OVER (ORDER BY file_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs FROM fm)
         |SELECT CAST((cs - bytes) // 16384 AS BIGINT) AS bin, COUNT(*) AS n_files,
         |  CAST(SUM(bytes) AS BIGINT) AS bytes,
         |  CAST(MIN(file_id) AS BIGINT) AS first_file,
         |  CAST(MAX(file_id) AS BIGINT) AS last_file
         |FROM cum GROUP BY 1 ORDER BY bin""".stripMargin
    }) { (s, dir) =>
      val fm = Tables.parallelize(Tables.load(s, dir, "documents")
          .select("doc_id", "text"))
        .groupBy((h32(col("doc_id").cast("string")) % 64).as("file_id"))
        .agg(sum(length(col("text"))).as("bytes"))
      val cum = fm.withColumn("cs",
        sum(col("bytes")).over(Window.orderBy("file_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      cum.groupBy(expr("(cs - bytes) div 16384").as("bin"))
        .agg(count(lit(1)).as("n_files"), sum(col("bytes")).as("bytes"),
          min(col("file_id")).as("first_file"),
          max(col("file_id")).as("last_file"))
        .orderBy("bin")
    },

    // KEY-SKEW AUDIT — the census a team reads BEFORE picking a
    // shuffle key at 100 TB: per-key event counts summarized as Gini
    // coefficient + head concentration (top-1 / top-10 share). A
    // Gini near 1 or a fat top-10 share is the signal that the key
    // needs salting (ops/Skew.scala) or an AQE skew join. Gini uses
    // the rank formulation 2·Σi·cᵢ/(n·Σc) − (n+1)/n over counts
    // ranked ascending (ties broken by key — fully deterministic).
    // SCALE: the Spark side never ranks individual keys. Within a
    // tie group (all keys sharing count v) every key contributes the
    // same c = v, so the uid tiebreak cancels out of the SUM:
    //   Σᵢ i·cᵢ = Σᵥ v · ( mᵥ·Bᵥ + mᵥ(mᵥ+1)/2 )
    // where mᵥ = #keys with count v and Bᵥ = #keys with count < v.
    // That prefix scan runs over the COUNT-VALUE census — distinct
    // positive integers summing to ≤ total events, hence ≤ √(2·total)
    // rows at ANY scale (10¹² events → ≤ 1.4M census rows) — and as
    // of round 11 even THAT bounded window is TWO-PHASE (the
    // negative_sampling_table / curriculum_order shape): census rows
    // bucket by bit-length of v (length(bin(v)) — an ORDER-PRESERVING
    // integer truncation, ≤ 64 buckets, exact with no float log),
    // the within-bucket cumsum runs under a window PARTITIONED by
    // bit-length (hash exchange, parallel), and Bᵥ = bucket offset +
    // within-bucket prefix − mᵥ. The only unpartitioned windows left
    // are the ≤ 64-row bucket-offset cumsum and the ≤ 10·B-row
    // two-level head: per-hash-bucket top-10 (hash-partitioned over
    // the key census) feeds the global top-10 window. Every
    // single-partition exchange in this plan is now CONSTANT-bounded,
    // not corpus-growth-bounded.
    // HASH-UNIFORMITY AUDIT — the validity check under EVERYTHING
    // this suite hash-partitions (bucket joins, LSH bands, salting,
    // the two-level top-k, compaction file assignment): does the
    // portable h32 spread the corpus uniformly over 256 buckets? The
    // chi-square uniformity statistic in exact integer algebra —
    // Σ(c−e)²/e with e = n/256 collapses to 256·Σc²/n − n, so the
    // only doubles are that one expression and the normal
    // approximation z = (χ² − k)/√(2k) (dof k = 255; the documented
    // approximation — the suite's closed-form p machinery covers
    // even dof only). A failing audit (p ≈ 0) means hot buckets:
    // every "spread by hash" claim in SCALE.md inherits this check.
    // Census shape: 256 bucket counts from one scan, one-row rollup.
    Q("hash_uniformity_chi2", {
      val h = duckH32("text")
      s"""WITH b AS (SELECT $h % 256 AS bkt, COUNT(*) AS c
         |  FROM documents GROUP BY 1),
         |t AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
         |    CAST(COUNT(*) AS BIGINT) AS n_buckets,
         |    CAST(SUM(c * c) AS BIGINT) AS s2,
         |    CAST(MAX(c) AS BIGINT) AS max_bucket FROM b),
         |st AS (SELECT n, n_buckets, max_bucket,
         |    round(256.0 * s2 / n - n, 6) AS chi2 FROM t),
         |z AS (SELECT n, n_buckets, max_bucket, chi2,
         |    (chi2 - 255.0) / sqrt(510.0) AS zs FROM st),
         |e AS (SELECT *, 1.0 / (1.0 + 0.3275911 * (ABS(zs) / sqrt(2.0))) AS tv FROM z)
         |SELECT n AS n_docs, n_buckets, max_bucket, chi2, round(zs, 6) AS z,
         |  round((((((1.061405429 * tv + -1.453152027) * tv + 1.421413741)
         |    * tv + -0.284496736) * tv + 0.254829592) * tv)
         |    * exp(-((ABS(zs)) / sqrt(2.0)) * ((ABS(zs)) / sqrt(2.0))), 6) AS p_two_sided
         |FROM e""".stripMargin
    }) { (s, dir) =>
      val b = Tables.load(s, dir, "documents")
        .groupBy((h32(col("text")) % 256).as("bkt"))
        .agg(count(lit(1)).as("c"))
      val t = b.agg(sum(col("c")).cast("long").as("n"),
        count(lit(1)).cast("long").as("n_buckets"),
        sum(col("c") * col("c")).cast("long").as("s2"),
        max(col("c")).cast("long").as("max_bucket"))
      val st = t.select(col("n"), col("n_buckets"), col("max_bucket"),
        round(lit(256.0) * col("s2") / col("n") - col("n"), 6).as("chi2"))
      val z = st.withColumn("zs",
        (col("chi2") - lit(255.0)) / sqrt(lit(510.0)))
      val z0 = abs(col("zs")) / lit(math.sqrt(2.0))
      val tv = lit(1.0) / (lit(1.0) + lit(0.3275911) * z0)
      val poly = Seq(0.254829592, -0.284496736, 1.421413741,
        -1.453152027, 1.061405429)
        .reverse.map(lit).reduce((acc, a) => acc * tv + a) * tv
      z.select(col("n").as("n_docs"), col("n_buckets"), col("max_bucket"),
        col("chi2"), round(col("zs"), 6).as("z"),
        round(poly * exp(-z0 * z0), 6).as("p_two_sided"))
    },

    Q("key_skew_gini",
      """WITH kc AS (SELECT user_id, COUNT(*) AS c FROM events GROUP BY 1),
        |rk AS (SELECT c, row_number() OVER (ORDER BY c, user_id) AS i FROM kc),
        |hd AS (SELECT c, row_number() OVER (ORDER BY c DESC, user_id) AS j FROM kc),
        |t AS (SELECT COUNT(*) AS n, CAST(SUM(c) AS BIGINT) AS total,
        |        CAST(SUM(i * c) AS BIGINT) AS ic FROM rk),
        |h AS (SELECT CAST(SUM(CASE WHEN j = 1 THEN c ELSE 0 END) AS BIGINT) AS c1,
        |        CAST(SUM(CASE WHEN j <= 10 THEN c ELSE 0 END) AS BIGINT) AS c10 FROM hd)
        |SELECT n AS n_keys, total,
        |  round(CAST(c1 AS DOUBLE) / total, 6) AS top1_share,
        |  round(CAST(c10 AS DOUBLE) / total, 6) AS top10_share,
        |  round(2.0 * ic / n / total - (n + 1.0) / n, 6) AS gini
        |FROM t CROSS JOIN h""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val kc = Tables.load(s, dir, "events")
        .groupBy("user_id").agg(count(lit(1)).as("c"))
      // count-VALUE census (≤ √(2·total) rows), prefix-scanned in TWO
      // PHASES: bucket by bit-length of c (order-preserving, ≤ 64
      // buckets), offsets cumsum over the bucket census, within-bucket
      // cumsum hash-partitioned; Bᵥ = offset + prefix − mᵥ. All sums
      // are integer, so the phase split is exact by associativity.
      // materialized once (≤ √(2·total) rows): both the offset census
      // and the within-bucket cumsum read it, and without the
      // checkpoint the offs branch would re-run the events scan + key
      // census a second time
      val vc0 = kc.groupBy("c").agg(count(lit(1)).as("m"))
        .withColumn("bl", length(bin(col("c"))))
        .localCheckpoint(true)
      val offs = vc0.groupBy("bl").agg(sum(col("m")).as("bm"))
        .withColumn("offset",
          coalesce(sum(col("bm")).over(Window.orderBy("bl")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("bl", "offset")
      val vc = vc0
        .withColumn("pm", sum(col("m")).over(
          Window.partitionBy("bl").orderBy("c")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .join(broadcast(offs), "bl")
        .withColumn("bv", col("offset") + col("pm") - col("m"))
      // m·(m+1) is always even, so `div 2` is exact integer arithmetic;
      // each census term equals the exact Σ i·c over its tie group
      val t = vc.agg(sum("m").as("n"), sum(col("c") * col("m")).as("total"),
        sum(col("c") * (col("m") * col("bv") +
          expr("(m * (m + 1)) div 2"))).as("ic"))
      // two-level top-k head: per-bucket top-10 spreads the key census
      // over B hash partitions; the global window sees ≤ 10·B rows
      val hd = kc
        .withColumn("bkt", pmod(hash(col("user_id")), lit(32)))
        .withColumn("bj", row_number().over(
          Window.partitionBy("bkt").orderBy(col("c").desc, col("user_id"))))
        .filter(col("bj") <= 10)
        .withColumn("j",
          row_number().over(Window.orderBy(col("c").desc, col("user_id"))))
      val h = hd.agg(
        sum(when(col("j") === 1, col("c")).otherwise(0)).as("c1"),
        sum(when(col("j") <= 10, col("c")).otherwise(0)).as("c10"))
      t.crossJoin(broadcast(h))
        .select(col("n").as("n_keys"), col("total"),
          round(col("c1").cast("double") / col("total"), 6).as("top1_share"),
          round(col("c10").cast("double") / col("total"), 6).as("top10_share"),
          round(lit(2.0) * col("ic") / col("n") / col("total") -
            (col("n") + 1.0) / col("n"), 6).as("gini"))
    },

    // BLOOM-FILTER FPR AUDIT — the sizing check for the membership
    // screens this suite runs at scale (decontamination's shingle
    // probe, dedup_incremental's store hit-test): build a bloom
    // filter (m=131072 bits, k=3 portable h32 hashes) over the
    // even-doc 3-token shingle set (~10k keys — the vocabulary is too
    // small to exercise a filter; shingles are the REAL key
    // population those screens use), probe it with the genuinely
    // held-out shingles (odd-doc shingles anti-joined against the
    // train set — thousands of true negatives exist because rare
    // shingles are rare, the same fact decontamination relies on),
    // and compare the EMPIRICAL false-positive rate to the textbook
    // (1 − e^(−kn/m))^k. Both engines materialize the same bit set —
    // the filter is the DISTINCT position set, bounded by m, so it
    // broadcasts — and a probe is positive iff all k of its
    // positions hit. The power is written as x·x·x (no libm pow);
    // exp() matches cross-engine as everywhere else in the suite.
    Q("bloom_fpr_audit", {
      def pos(seed: Int, e: String) = s"${duckH32(seed, e)} % 131072"
      // shingle CTE mirrors DedupQueries.shingleCtes (same derivation)
      s"""WITH arr AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
         |sh AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(a)-2),
         |        i -> a[i] || ' ' || a[i+1] || ' ' || a[i+2])) AS w FROM arr),
         |train AS (SELECT DISTINCT w FROM sh WHERE doc_id % 2 = 0),
         |probe AS (SELECT DISTINCT w FROM sh WHERE doc_id % 2 = 1
         |          AND w NOT IN (SELECT w FROM train)),
         |bits AS (SELECT DISTINCT p FROM (
         |    SELECT ${pos(0, "w")} AS p FROM train
         |    UNION ALL SELECT ${pos(1, "w")} FROM train
         |    UNION ALL SELECT ${pos(2, "w")} FROM train)),
         |pp AS (SELECT w, ${pos(0, "w")} AS p FROM probe
         |       UNION ALL SELECT w, ${pos(1, "w")} FROM probe
         |       UNION ALL SELECT w, ${pos(2, "w")} FROM probe),
         |hits AS (SELECT pp.w, COUNT(*) AS nh FROM pp JOIN bits USING (p) GROUP BY 1),
         |c AS (SELECT (SELECT COUNT(*) FROM train) AS n_train,
         |        (SELECT COUNT(*) FROM bits) AS n_bits,
         |        (SELECT COUNT(*) FROM probe) AS n_probe,
         |        (SELECT COUNT(*) FROM hits WHERE nh = 3) AS n_fp)
         |SELECT n_train, n_bits, n_probe, n_fp,
         |  CASE WHEN n_probe > 0
         |    THEN round(CAST(n_fp AS DOUBLE) / n_probe, 6) END AS fpr_emp,
         |  round((1.0 - exp(-3.0 * n_train / 131072.0))
         |      * (1.0 - exp(-3.0 * n_train / 131072.0))
         |      * (1.0 - exp(-3.0 * n_train / 131072.0)), 6) AS fpr_theory
         |FROM c""".stripMargin
    }) { (s, dir) =>
      val M = 131072
      def sp(seed: Int) = h32(seed, col("w")) % M
      val tk = Tables.parallelizeByRange(Tables.load(s, dir, "documents")
          .select("doc_id", "text"), col("doc_id"))
        .select(col("doc_id"),
          explode(graft.ops.Dedup.shingles(col("text"))).as("w"))
      // the corpus is shingled ONCE: the (half, shingle) distinct set
      // is materialized and every downstream branch (train bits x3,
      // probe positions x3, the anti join, four count censuses) reads
      // the checkpoint instead of re-deriving the scan+explode —
      // at 100 TB the explode is the data-sized stage and must not
      // run once per branch (sf0.1 timings are load-noise-bound
      // either way; the suite bench tracks the net effect)
      val sh = tk.select((col("doc_id") % 2).as("half"), col("w")).distinct()
        .localCheckpoint(true)
      val train = sh.filter(col("half") === 0).select("w")
      val probe = sh.filter(col("half") === 1).select("w")
        .join(train, Seq("w"), "left_anti")
        .localCheckpoint(true) // three position branches re-read it
      val bits = train.select(sp(0).as("p"))
        .unionAll(train.select(sp(1).as("p")))
        .unionAll(train.select(sp(2).as("p"))).distinct()
      val pp = probe.select(col("w"), sp(0).as("p"))
        .unionAll(probe.select(col("w"), sp(1).as("p")))
        .unionAll(probe.select(col("w"), sp(2).as("p")))
      val hits = pp.join(broadcast(bits), Seq("p"))
        .groupBy("w").agg(count(lit(1)).as("nh"))
      val cT = train.agg(count(lit(1)).as("n_train"))
      val cB = bits.agg(count(lit(1)).as("n_bits"))
      val cP = probe.agg(count(lit(1)).as("n_probe"))
      val cF = hits.filter(col("nh") === 3).agg(count(lit(1)).as("n_fp"))
      cT.crossJoin(broadcast(cB)).crossJoin(broadcast(cP))
        .crossJoin(broadcast(cF))
        .select(col("n_train"), col("n_bits"), col("n_probe"), col("n_fp"),
          when(col("n_probe") > 0,
            round(col("n_fp").cast("double") / col("n_probe"), 6))
            .as("fpr_emp"),
          {
            val q = lit(1.0) - exp(lit(-3.0) * col("n_train") / lit(131072.0))
            round(q * q * q, 6).as("fpr_theory")
          })
    },

    // JOIN-CARDINALITY AUDIT — predict a join's output size from the
    // two key-count censuses BEFORE running it: |A ⋈ B on k| =
    // Σ_k c_A(k)·c_B(k). Over full censuses the formula is exact, so
    // the audit verifies itself against the actual join count — the
    // planning discipline that catches a key-explosion join (the
    // 100 TB incident class: a "join on id" where id is 30% one hot
    // value) for the cost of two aggregates instead of the blown
    // shuffle. Output also carries the per-side profile a planner
    // reads: row counts, distinct keys, max multiplicity. Kept on
    // orders ⋈ lineitem (the suite's canonical fact join); censuses
    // are key-bounded, the product term joins census-to-census.
    Q("join_cardinality_audit",
      """WITH co AS (SELECT o_orderkey AS k, COUNT(*) AS c FROM orders GROUP BY 1),
        |cl AS (SELECT l_orderkey AS k, COUNT(*) AS c FROM lineitem GROUP BY 1),
        |pred AS (SELECT CAST(SUM(co.c * cl.c) AS BIGINT) AS predicted_rows
        |         FROM co JOIN cl USING (k)),
        |prof AS (SELECT (SELECT CAST(SUM(c) AS BIGINT) FROM co) AS n_left,
        |           (SELECT CAST(SUM(c) AS BIGINT) FROM cl) AS n_right,
        |           (SELECT COUNT(*) FROM co) AS ndv_left,
        |           (SELECT COUNT(*) FROM cl) AS ndv_right,
        |           (SELECT CAST(MAX(c) AS BIGINT) FROM co) AS max_mult_left,
        |           (SELECT CAST(MAX(c) AS BIGINT) FROM cl) AS max_mult_right),
        |act AS (SELECT COUNT(*) AS actual_rows
        |        FROM orders JOIN lineitem ON o_orderkey = l_orderkey)
        |SELECT n_left, n_right, ndv_left, ndv_right, max_mult_left,
        |  max_mult_right, predicted_rows, actual_rows
        |FROM prof CROSS JOIN pred CROSS JOIN act""".stripMargin) { (s, dir) =>
      val co = Tables.load(s, dir, "orders")
        .groupBy(col("o_orderkey").as("k")).agg(count(lit(1)).as("c"))
      val cl = Tables.load(s, dir, "lineitem")
        .groupBy(col("l_orderkey").as("k")).agg(count(lit(1)).as("c"))
      val pred = co.join(cl.withColumnRenamed("c", "c2"), Seq("k"))
        .agg(sum(col("c") * col("c2")).as("predicted_rows"))
      val profL = co.agg(sum("c").as("n_left"), count(lit(1)).as("ndv_left"),
        max("c").as("max_mult_left"))
      val profR = cl.agg(sum("c").as("n_right"), count(lit(1)).as("ndv_right"),
        max("c").as("max_mult_right"))
      val act = Tables.load(s, dir, "orders")
        .join(Tables.load(s, dir, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .agg(count(lit(1)).as("actual_rows"))
      profL.crossJoin(broadcast(profR)).crossJoin(broadcast(pred))
        .crossJoin(broadcast(act))
        .select("n_left", "n_right", "ndv_left", "ndv_right",
          "max_mult_left", "max_mult_right", "predicted_rows", "actual_rows")
    },

    // CROSS-SOURCE QUANTILE NORMALIZATION — the mixing prerequisite
    // when per-source metrics aren't comparable (one crawl's "long
    // document" is another's median): replace each doc's raw length
    // with the GLOBAL length at the same within-source quantile.
    // Two scale-correct pieces: (1) within-source percent-rank is a
    // source-partitioned window (unique tie-break via doc_id);
    // (2) the global decile grid comes from the VALUE CENSUS — one
    // row per distinct length, hundreds of rows — via cumulative
    // counts, NOT from a corpus-wide sort: the value at 0-based rank
    // i is the census row whose cumulative range covers i, so exact
    // order statistics cost one census cumsum at any corpus size
    // (the StreamDrift ECDF trick). Interpolation uses the exact
    // `percentiles` two-sided formula on integer values: every
    // double derives from integers in one fixed expression order.
    Q("quantile_normalize",
      s"""WITH d AS (SELECT doc_id, source, n_chars FROM documents),
         |r AS (SELECT doc_id, source, n_chars,
         |    CASE WHEN COUNT(*) OVER (PARTITION BY source) = 1 THEN 0.0
         |         ELSE CAST(row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) - 1 AS DOUBLE)
         |              / (COUNT(*) OVER (PARTITION BY source) - 1) END AS p FROM d),
         |${duckCensusQuantiles((0 to 10).map(_ / 10.0))},
         |grid AS (SELECT a.k AS k, a.qv AS lo, b.qv AS hi
         |         FROM q a JOIN q b ON b.k = a.k + 1 WHERE a.k <= 9)
         |SELECT doc_id, source, n_chars, round(p, 6) AS p_src,
         |  round(CASE WHEN p >= 1.0 THEN hi
         |        ELSE lo + (p * 10 - floor(p * 10)) * (hi - lo) END, 6) AS norm_len
         |FROM r JOIN grid ON least(CAST(floor(p * 10) AS BIGINT), 9) = grid.k
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val d = Tables.load(s, dir, "documents")
        .select("doc_id", "source", "n_chars")
      val ws = Window.partitionBy("source").orderBy(col("n_chars"), col("doc_id"))
      val wsAll = Window.partitionBy("source")
      val r = d.withColumn("p",
        when(count(lit(1)).over(wsAll) === 1, lit(0.0))
          .otherwise((row_number().over(ws) - 1).cast("double") /
            (count(lit(1)).over(wsAll) - 1)))
      val q = censusQuantiles(d, (0 to 10).map(_ / 10.0))
      val grid = q.as("a").join(q.as("b"), col("b.k") === col("a.k") + 1)
        .filter(col("a.k") <= 9)
        .select(col("a.k").as("k"), col("a.qv").as("lo"), col("b.qv").as("hi"))
      r.join(broadcast(grid),
          least(floor(col("p") * 10).cast("long"), lit(9L)) === col("k"))
        .select(col("doc_id"), col("source"), col("n_chars"),
          round(col("p"), 6).as("p_src"),
          round(when(col("p") >= 1.0, col("hi"))
            .otherwise(col("lo") + (col("p") * 10 - floor(col("p") * 10)) *
              (col("hi") - col("lo"))), 6).as("norm_len"))
        .orderBy("doc_id")
    },

    // WINSORIZED ROBUST STATISTICS — the outlier-resistant per-source
    // profile: clip the metric at the global exact p5/p95 (from the
    // same census-derived order statistics as quantile_normalize —
    // no corpus sort), then report per-source mean/sd BEFORE and
    // AFTER winsorization plus the clip censuses. The spread between
    // raw and winsorized mean is the outlier-mass signal a mixing
    // policy reads. Determinism: raw moments are integer sums;
    // clipped values and their squares round to 6 dp and sum as
    // DECIMAL (order-independent); sd derives from those exact sums
    // in one fixed expression.
    Q("winsorize_stats",
      s"""WITH ${duckCensusQuantiles(Seq(0.05, 0.95))},
         |b AS (SELECT (SELECT qv FROM q WHERE k = 0) AS lo,
         |             (SELECT qv FROM q WHERE k = 1) AS hi),
         |w AS (SELECT source, n_chars,
         |    CAST(round(least(greatest(CAST(n_chars AS DOUBLE), lo), hi), 6) AS DECIMAL(24,6)) AS wv,
         |    CASE WHEN n_chars < lo THEN 1 ELSE 0 END AS cl,
         |    CASE WHEN n_chars > hi THEN 1 ELSE 0 END AS ch
         |  FROM documents CROSS JOIN b)
         |SELECT source, COUNT(*) AS n,
         |  round(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 6) AS mean_raw,
         |  round(CAST(SUM(wv) AS DOUBLE) / COUNT(*), 6) AS mean_wins,
         |  round(sqrt(CAST(SUM(CAST(round(CAST(wv AS DOUBLE) * CAST(wv AS DOUBLE), 6) AS DECIMAL(24,6))) AS DOUBLE) / COUNT(*)
         |        - (CAST(SUM(wv) AS DOUBLE) / COUNT(*)) * (CAST(SUM(wv) AS DOUBLE) / COUNT(*))), 6) AS sd_wins,
         |  CAST(SUM(cl) AS BIGINT) AS n_clipped_low,
         |  CAST(SUM(ch) AS BIGINT) AS n_clipped_high
         |FROM w GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      val d = Tables.load(s, dir, "documents").select("source", "n_chars")
      val q = censusQuantiles(
        Tables.load(s, dir, "documents").select("n_chars"), Seq(0.05, 0.95))
      val b = q.groupBy()
        .agg(max(when(col("k") === 0, col("qv"))).as("lo"),
          max(when(col("k") === 1, col("qv"))).as("hi"))
      val wv = round(least(greatest(col("n_chars").cast("double"), col("lo")),
        col("hi")), 6).cast(DecimalType(24, 6))
      val meanW = sum(col("wv")).cast("double") / count(lit(1))
      d.crossJoin(broadcast(b))
        .select(col("source"), col("n_chars"), wv.as("wv"),
          when(col("n_chars") < col("lo"), 1).otherwise(0).as("cl"),
          when(col("n_chars") > col("hi"), 1).otherwise(0).as("ch"))
        .groupBy("source")
        .agg(count(lit(1)).as("n"),
          round(sum(col("n_chars")).cast("double") / count(lit(1)), 6)
            .as("mean_raw"),
          round(meanW, 6).as("mean_wins"),
          round(sqrt(sum(round(col("wv").cast("double") *
              col("wv").cast("double"), 6).cast(DecimalType(24, 6)))
            .cast("double") / count(lit(1)) - meanW * meanW), 6).as("sd_wins"),
          sum(col("cl")).as("n_clipped_low"),
          sum(col("ch")).as("n_clipped_high"))
        .orderBy("source")
    },

    // K-FOLD BALANCE AUDIT — cross-validation fold assignment as a
    // pure function of doc_id (h32, the train_split rule) with the
    // per-stratum balance census a team checks before trusting CV
    // numbers: per (lang, fold) count, the uniform expectation, and
    // the chi-square contribution (n − e)²/e whose sum is the
    // balance statistic. One scan + one strata-sized aggregate; the
    // per-language totals broadcast back onto the census.
    Q("kfold_balance", {
      val f = duckH32("'fold|' || CAST(doc_id AS VARCHAR)")
      s"""WITH a AS (SELECT lang, $f % 5 AS fold FROM documents),
         |c AS (SELECT lang, fold, COUNT(*) AS n FROM a GROUP BY 1, 2),
         |lt AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS tot FROM c GROUP BY 1)
         |SELECT c.lang AS lang, CAST(fold AS BIGINT) AS fold, n,
         |  round(tot / 5.0, 6) AS expected,
         |  round((n - tot / 5.0) * (n - tot / 5.0) / (tot / 5.0), 6) AS chi2
         |FROM c JOIN lt ON c.lang = lt.lang
         |ORDER BY lang, fold""".stripMargin
    }) { (s, dir) =>
      val a = Tables.parallelize(Tables.load(s, dir, "documents")
          .select("doc_id", "lang"))
        .select(col("lang"),
          (h32(concat(lit("fold|"), col("doc_id").cast("string"))) % 5)
            .as("fold"))
      val c = a.groupBy("lang", "fold").agg(count(lit(1)).as("n"))
      val lt = c.groupBy("lang").agg(sum("n").as("tot"))
      c.join(broadcast(lt), Seq("lang"))
        .select(col("lang"), col("fold"), col("n"),
          round(col("tot") / 5.0, 6).as("expected"),
          round((col("n") - col("tot") / 5.0) * (col("n") - col("tot") / 5.0) /
            (col("tot") / 5.0), 6).as("chi2"))
        .orderBy("lang", "fold")
    },

    // PER-SLICE AUC — roc_auc partitioned by source: the slice-based
    // evaluation a training pipeline runs before shipping a quality
    // model (a global AUC hides a slice where the ranking inverts).
    // Same doubled-rank machinery as roc_auc, with every window
    // partitioned by the slice; single-class slices report NULL
    // rather than a divide-by-zero.
    Q("auc_by_source",
      s"""WITH $duckScoreLabel,
        |ss AS (SELECT d.source, sl.score_u, sl.label FROM sl
        |       JOIN documents d ON sl.doc_id = d.doc_id),
        |gg AS (SELECT source, score_u, COUNT(*) AS nx,
        |    CAST(SUM(label) AS BIGINT) AS npos FROM ss GROUP BY 1, 2),
        |r AS (SELECT source, npos,
        |    2 * (SUM(nx) OVER (PARTITION BY source ORDER BY score_u ROWS UNBOUNDED PRECEDING) - nx) + nx + 1 AS r2,
        |    CAST(SUM(nx) OVER (PARTITION BY source) AS BIGINT) AS nt
        |  FROM gg),
        |t AS (SELECT source, CAST(SUM(npos * r2) AS BIGINT) AS r2pos,
        |    CAST(SUM(npos) AS BIGINT) AS n1, MAX(nt) AS nt FROM r GROUP BY 1)
        |SELECT source, n1 AS n_pos, CAST(nt - n1 AS BIGINT) AS n_neg,
        |  CASE WHEN n1 > 0 AND n1 < nt THEN
        |    round((CAST(r2pos - n1 * (n1 + 1) AS DOUBLE) / 2.0)
        |      / (CAST(n1 AS DOUBLE) * (nt - n1)), 6) END AS auc
        |FROM t ORDER BY source""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val ss = scoreLabelOf(graft.Tables.parallelize(
          docs.select("doc_id", "text")))
        .join(docs.select("doc_id", "source"), "doc_id")
      val gg = ss.groupBy("source", "score_u")
        .agg(count(lit(1)).as("nx"), sum(col("label")).cast("long").as("npos"))
      val cum = Window.partitionBy("source").orderBy("score_u")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val whole = Window.partitionBy("source")
      val r = gg.select(col("source"), col("npos"),
        (lit(2) * (sum(col("nx")).over(cum) - col("nx")) + col("nx") + 1).as("r2"),
        sum(col("nx")).over(whole).cast("long").as("nt"))
      val t = r.groupBy("source")
        .agg(sum(col("npos") * col("r2")).cast("long").as("r2pos"),
          sum(col("npos")).cast("long").as("n1"), max(col("nt")).as("nt"))
      val aucExpr = ((col("r2pos") - col("n1") * (col("n1") + 1)).cast("double") / 2.0) /
        (col("n1").cast("double") * (col("nt") - col("n1")))
      val ok = col("n1") > 0 && col("n1") < col("nt")
      t.select(col("source"), col("n1").as("n_pos"),
          (col("nt") - col("n1")).cast("long").as("n_neg"),
          when(ok, round(aucExpr, 6)).as("auc"))
        .orderBy("source")
    },

    // ISOTONIC CALIBRATION (PAVA): the monotone-nondecreasing label
    // rate fitted over the quality-score buckets — what turns a raw
    // ranking score into a calibrated probability without binning
    // artifacts. Engine split exploits the PAVA ≡ minimax theorem:
    // Spark runs pool-adjacent-violators as ONE bounded fold over the
    // score census (exact BigInt cross-product comparisons — no float
    // decision anywhere), while the oracle evaluates the closed-form
    // minimax fitted[i] = max_{j<=i} min_{k>=i} avg(y_j..y_k) with an
    // O(census²) pair window — both yield the identical block-average
    // rational, hence the identical double. Census is dictionary-
    // bounded (score_u ∈ [0, 1e6]), so both sides are corpus-free.
    Q("isotonic_calibration",
      s"""WITH $duckScoreLabel,
        |gg AS (SELECT score_u, COUNT(*) AS n, CAST(SUM(label) AS BIGINT) AS k
        |       FROM sl GROUP BY 1),
        |o AS (SELECT score_u, n, k, row_number() OVER w AS i,
        |    CAST(SUM(n) OVER w AS BIGINT) AS cn,
        |    CAST(SUM(k) OVER w AS BIGINT) AS ck
        |  FROM gg WINDOW w AS (ORDER BY score_u ROWS UNBOUNDED PRECEDING)),
        |p AS (SELECT a.i AS j, b.i AS ke,
        |    CAST(b.ck - a.ck + a.k AS DOUBLE) / (b.cn - a.cn + a.n) AS avgr
        |  FROM o a JOIN o b ON a.i <= b.i),
        |mn AS (SELECT j, ke AS i,
        |    MIN(avgr) OVER (PARTITION BY j ORDER BY ke DESC ROWS UNBOUNDED PRECEDING) AS sufmin
        |  FROM p),
        |iso AS (SELECT i, MAX(sufmin) AS fitted FROM mn GROUP BY i)
        |SELECT o.score_u, o.n, o.k, round(iso.fitted, 6) AS fitted
        |FROM o JOIN iso ON o.i = iso.i ORDER BY o.score_u""".stripMargin) { (s, dir) =>
      val gg = scoreLabelOf(graft.Tables.parallelize(
          Tables.load(s, dir, "documents").select("doc_id", "text")))
        .groupBy("score_u")
        .agg(count(lit(1)).as("n"), sum(col("label")).cast("long").as("k"))
      import s.implicits._
      gg.select(col("score_u"), col("n").cast("long"), col("k"))
        .as[(Long, Long, Long)]
        .groupByKey(_ => 0)
        .flatMapGroups { (_, it) =>
          val rows = it.toArray.sortBy(_._1)
          // PAVA stack of blocks (n, k, #buckets); pool while the
          // previous block's rate exceeds the incoming one — decided
          // by exact integer cross-products, never floats
          val st = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
          rows.foreach { case (_, n, k) =>
            var (bn, bk, bc) = (n, k, 1)
            while (st.nonEmpty &&
                BigInt(st.last._2) * bn > BigInt(bk) * st.last._1) {
              val (pn, pk, pc) = st.remove(st.length - 1)
              bn += pn; bk += pk; bc += pc
            }
            st += ((bn, bk, bc))
          }
          val fitted = st.iterator.flatMap { case (bn, bk, bc) =>
            Iterator.fill(bc)(
              BigDecimal(bk.toDouble / bn.toDouble)
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
          }.toArray
          rows.iterator.zip(fitted.iterator).map { case ((sc, n, k), fv) =>
            (sc, n, k, fv)
          }
        }
        .toDF("score_u", "n", "k", "fitted")
        .orderBy("score_u")
    },

    // POPULATION STABILITY INDEX — the scorecard-industry drift
    // metric (sibling of ks_drift/jsd_sources, but THE number risk
    // teams alert on): per source, PSI of the quality-score
    // distribution against the whole-corpus reference over the 11
    // fixed score bins, Laplace-smoothed ((cnt+1)/(n+11)) so empty
    // bins contribute finite terms instead of ln(0). Everything after
    // the one (source × bin) aggregation is census-sized; per-bin
    // terms quantize to 9 dp before the decimal sum. The standard
    // thresholds label the verdict: <0.1 stable, <0.25 moderate,
    // else major.
    Q("psi_drift",
      s"""WITH $duckScoreLabel,
        |sd AS (SELECT d.source, sl.score_u FROM sl
        |       JOIN documents d ON sl.doc_id = d.doc_id),
        |bc AS (SELECT source, score_u // 100000 AS bin, COUNT(*) AS cnt
        |       FROM sd GROUP BY 1, 2),
        |src AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS ns FROM bc GROUP BY 1),
        |tot AS (SELECT bin, CAST(SUM(cnt) AS BIGINT) AS ct FROM bc GROUP BY 1),
        |nn AS (SELECT CAST(SUM(cnt) AS BIGINT) AS nt FROM bc),
        |grid AS (SELECT s.source, s.ns, t.m AS bin
        |         FROM src s CROSS JOIN range(0, 11) t(m)),
        |p AS (SELECT g.source, g.ns,
        |    CAST(COALESCE(b.cnt, 0) + 1 AS DOUBLE) / (g.ns + 11) AS pa,
        |    CAST(COALESCE(tt.ct, 0) + 1 AS DOUBLE) / (nn.nt + 11) AS pe
        |  FROM grid g
        |  LEFT JOIN bc b ON g.source = b.source AND g.bin = b.bin
        |  LEFT JOIN tot tt ON g.bin = tt.bin, nn),
        |t AS (SELECT source, ns AS n_docs,
        |    round(CAST(SUM(CAST(round((pa - pe) * ln(pa / pe), 9)
        |      AS DECIMAL(12,9))) AS DOUBLE), 6) AS psi
        |  FROM p GROUP BY 1, 2)
        |SELECT source, n_docs, psi,
        |  CASE WHEN psi < 0.1 THEN 'stable' WHEN psi < 0.25 THEN 'moderate'
        |       ELSE 'major' END AS verdict
        |FROM t ORDER BY source""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val sd = scoreLabelOf(graft.Tables.parallelize(
          docs.select("doc_id", "text")))
        .join(docs.select("doc_id", "source"), "doc_id")
      val bc = sd.groupBy(col("source"), expr("score_u div 100000").as("bin"))
        .agg(count(lit(1)).as("cnt"))
        .localCheckpoint(true) // (source x bin) census feeds 3 rollups
      val src = bc.groupBy("source").agg(sum(col("cnt")).cast("long").as("ns"))
      val tot = bc.groupBy("bin").agg(sum(col("cnt")).cast("long").as("ct"))
      val nn = bc.agg(sum(col("cnt")).cast("long").as("nt"))
      val grid = src.crossJoin(s.range(0, 11).select(col("id").as("bin")))
      val p = grid
        .join(bc.withColumnRenamed("cnt", "bcnt"), Seq("source", "bin"), "left")
        .join(broadcast(tot), Seq("bin"), "left")
        .crossJoin(broadcast(nn))
        .select(col("source"), col("ns"),
          ((coalesce(col("bcnt"), lit(0L)) + 1).cast("double") /
            (col("ns") + 11)).as("pa"),
          ((coalesce(col("ct"), lit(0L)) + 1).cast("double") /
            (col("nt") + 11)).as("pe"))
      val t = p.groupBy(col("source"), col("ns").as("n_docs"))
        .agg(round(sum(round((col("pa") - col("pe")) *
            log(col("pa") / col("pe")), 9).cast(DecimalType(12, 9)))
          .cast("double"), 6).as("psi"))
      t.select(col("source"), col("n_docs"), col("psi"),
          when(col("psi") < 0.1, "stable")
            .when(col("psi") < 0.25, "moderate")
            .otherwise("major").as("verdict"))
        .orderBy("source")
    },

    // BRIER SCORE + MURPHY DECOMPOSITION — the proper-scoring-rule
    // audit of the quality scorer (Murphy '73): the exact per-row
    // Brier score (integer sums: score_u and label both live on the
    // 1e6 grid, so Σ(score_u − label·1e6)² is an exact BIGINT), and
    // the binned reliability / resolution / uncertainty decomposition
    // over the same 11 calibration bins as score_calibration. With
    // non-constant forecasts inside a bin the exact identity is
    // brier = reliability − resolution + uncertainty + (within-bin
    // forecast variance − 2·within-bin forecast-outcome covariance)
    // (the generalized decomposition, Stephenson et al. '08);
    // within_bin reports that combined residual — NEGATIVE when
    // forecasts discriminate even inside a bin. One scan+census math.
    Q("brier_decomposition",
      s"""WITH $duckScoreLabel,
        |bb AS (SELECT score_u // 100000 AS bin, COUNT(*) AS nk,
        |    CAST(SUM(score_u) AS BIGINT) AS su,
        |    CAST(SUM(label) AS BIGINT) AS kk,
        |    CAST(SUM((score_u - label * 1000000) * (score_u - label * 1000000)) AS BIGINT) AS sq
        |  FROM sl GROUP BY 1),
        |gt AS (SELECT CAST(SUM(nk) AS BIGINT) AS n, CAST(SUM(kk) AS BIGINT) AS k,
        |    CAST(SUM(sq) AS BIGINT) AS sq FROM bb),
        |tm AS (SELECT
        |    CAST(round(CAST(bb.nk AS DOUBLE) / gt.n
        |      * (CAST(bb.su AS DOUBLE) / bb.nk / 1000000.0 - CAST(bb.kk AS DOUBLE) / bb.nk)
        |      * (CAST(bb.su AS DOUBLE) / bb.nk / 1000000.0 - CAST(bb.kk AS DOUBLE) / bb.nk), 9)
        |      AS DECIMAL(12,9)) AS rel,
        |    CAST(round(CAST(bb.nk AS DOUBLE) / gt.n
        |      * (CAST(bb.kk AS DOUBLE) / bb.nk - CAST(gt.k AS DOUBLE) / gt.n)
        |      * (CAST(bb.kk AS DOUBLE) / bb.nk - CAST(gt.k AS DOUBLE) / gt.n), 9)
        |      AS DECIMAL(12,9)) AS res
        |  FROM bb, gt),
        |dd AS (SELECT round(CAST(SUM(rel) AS DOUBLE), 6) AS reliability,
        |    round(CAST(SUM(res) AS DOUBLE), 6) AS resolution FROM tm)
        |SELECT gt.n AS n_docs,
        |  round(CAST(gt.sq AS DOUBLE) / gt.n / 1e12, 6) AS brier,
        |  dd.reliability, dd.resolution,
        |  round(CAST(gt.k AS DOUBLE) / gt.n * (1.0 - CAST(gt.k AS DOUBLE) / gt.n), 6) AS uncertainty,
        |  round(CAST(gt.sq AS DOUBLE) / gt.n / 1e12
        |    - dd.reliability + dd.resolution
        |    - CAST(gt.k AS DOUBLE) / gt.n * (1.0 - CAST(gt.k AS DOUBLE) / gt.n), 6) AS within_bin
        |FROM gt, dd""".stripMargin) { (s, dir) =>
      val sl = scoreLabel(s, dir)
      val b = sl.groupBy(expr("score_u div 100000").as("bin"))
        .agg(count(lit(1)).as("nk"), sum(col("score_u")).cast("long").as("su"),
          sum(col("label")).cast("long").as("kk"),
          sum((col("score_u") - col("label") * 1000000L) *
            (col("score_u") - col("label") * 1000000L)).cast("long").as("sq"))
        .localCheckpoint(true) // 11-row census feeds both rollups
      val g = b.agg(sum(col("nk")).cast("long").as("n"),
        sum(col("kk")).cast("long").as("k"),
        sum(col("sq")).cast("long").as("sqt"))
      val fk = col("su").cast("double") / col("nk") / 1000000.0
      val ok = col("kk").cast("double") / col("nk")
      val obar = col("k").cast("double") / col("n")
      val t = b.crossJoin(broadcast(g))
        .select(
          round(col("nk").cast("double") / col("n") *
            (fk - ok) * (fk - ok), 9).cast(DecimalType(12, 9)).as("rel"),
          round(col("nk").cast("double") / col("n") *
            (ok - obar) * (ok - obar), 9).cast(DecimalType(12, 9)).as("res"))
      val d = t.agg(round(sum(col("rel")).cast("double"), 6).as("reliability"),
        round(sum(col("res")).cast("double"), 6).as("resolution"))
      g.crossJoin(broadcast(d))
        .select(col("n").as("n_docs"),
          round(col("sqt").cast("double") / col("n") / 1e12, 6).as("brier"),
          col("reliability"), col("resolution"),
          round(obar * (lit(1.0) - obar), 6).as("uncertainty"),
          round(col("sqt").cast("double") / col("n") / lit(1e12)
            - col("reliability") + col("resolution")
            - obar * (lit(1.0) - obar), 6).as("within_bin"))
    }
  )
}
