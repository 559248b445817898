package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Similarity

/** Approximate-nearest-neighbor search over `embeddings` (north-star
  * set): brute-force cosine top-k baseline, and the LSH-bucketed scale
  * path (random-hyperplane signatures; at cluster scale the table
  * would be bucketed/partitioned by `bucket`, so a probe reads one
  * partition instead of all vectors).
  */
object SimilarityQueries {

  val Planes = 4
  val Dim = 64
  val TopK = 10
  val Centroids = 4
  val Nprobe = 2
  val KmeansK = 8
  /** Product quantization: Dim = PqM subspaces x PqSub dims, PqK
    * codebook entries per subspace (4-bit codes here; 8-bit — PqK=256
    * — at production scale), 2 Lloyd training iterations, and a
    * PqShortlist-candidate exact re-rank after the ADC scan.
    */
  val PqM = 8
  val PqSub = 8
  val PqK = 16
  val PqShortlist = 100

  private def duckDot(x: String, y: String) =
    s"list_sum(list_transform(generate_series(1, $Dim), i -> CAST($x.embedding[i] AS DOUBLE) * $y.embedding[i]))"

  /** (vec_id, embedding, scale_raw, codes): per-vector symmetric int8
    * quantization — max-abs/127 scale, codes = floor(x/scale + 0.5)
    * as LONG. ONE definition feeds both embed_quantize (the store
    * build) and ann_quantized (the probe over that store); the rule
    * carries two hard-won fixes (floor(+0.5), not round() — the
    * engines' tie rules differ on half-way doubles; the raw scale
    * deliberately NOT named "scale" — Spark 4's lateral column alias
    * resolution would rebind same-select references to a rounded
    * output alias, a measured 0.15% mse shift), so a drift between
    * copies would silently quantize the probe differently from the
    * store it claims to read. Tables.parallelize: everything here is
    * row-local map work before the caller's first exchange, and the
    * fixture parquet is a single row group = one scan task without it.
    */
  private def quantized(s: org.apache.spark.sql.SparkSession,
                        dir: String): org.apache.spark.sql.DataFrame =
    Tables.parallelize(Tables.load(s, dir, "embeddings"))
      .select(col("vec_id"), col("embedding"),
        (array_max(transform(col("embedding"), x => abs(x.cast("double"))))
          / 127.0).as("scale_raw"))
      .filter(col("scale_raw") > 0)
      .withColumn("codes", transform(col("embedding"),
        x => floor(x.cast("double") / col("scale_raw") + 0.5).cast("long")))

  /** DuckDB twin of [[quantized]]: the `s`/`c` CTE pair (codes as
    * BIGINT, matching the LONG Spark codes).
    */
  private val duckQuantizeCtes: String =
    """s AS (SELECT vec_id, embedding,
      |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
      |  FROM embeddings),
      |c AS (SELECT vec_id, embedding, scale,
      |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) / scale + 0.5) AS BIGINT)) AS codes
      |  FROM s WHERE scale > 0)""".stripMargin

  /** Shared 2-iteration unrolled Lloyd CTE chain over `embeddings`
    * for `k` md5-init centroids — ONE definition serves both the
    * kmeans_centroids oracle and the ann_ivf_trained oracle (the
    * trickiest SQL in the repo: decimal-exact order-independent
    * means, 6-dp pre-round, empty-cluster COALESCE; a fix applied to
    * one copy but not another would silently diverge). Defines CTEs
    * ev, c0, a1, m1, c1, c1a, s2, a2 and m2 (cv = new component, n =
    * member count); callers append their tail after a trailing comma.
    */
  private def duckLloyd2(k: Int): String = {
    val coefs = Similarity.centroidCoefs(k, Dim)
    val c0rows = (for { c <- 0 until k; i <- 0 until Dim } yield
      s"($c,${i + 1},${if (coefs(c)(i) > 0) "1.0" else "-1.0"})").mkString(",")
    val ds = coefs.zipWithIndex.map { case (cen, c) =>
      val arr = cen.map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ",", "]")
      s"round(list_sum(list_transform(generate_series(1, $Dim), i -> CAST(embeddings.embedding[i] AS DOUBLE) * ($arr)[i])), 6) AS d_$c"
    }.mkString(",\n    ")
    val assign1 = (0 until k - 1).map { c =>
      val rest = (c + 1 until k).map(o => s"d_$c >= d_$o").mkString(" AND ")
      s"WHEN $rest THEN $c"
    }.mkString(" ")
    s"""WITH ev AS (SELECT vec_id, i, round(CAST(embedding[i] AS DOUBLE), 6) AS v
       |    FROM (SELECT vec_id, embedding,
       |          unnest(generate_series(1, $Dim)) AS i FROM embeddings)),
       |c0(c, i, cv) AS (VALUES $c0rows),
       |a1 AS (SELECT vec_id, CASE $assign1 ELSE ${k - 1} END AS c
       |       FROM (SELECT vec_id, $ds FROM embeddings)),
       |m1 AS (SELECT c, i, CAST(SUM(CAST(v AS DECIMAL(20,10))) AS DOUBLE) / COUNT(*) AS cv
       |       FROM ev JOIN a1 USING (vec_id) GROUP BY c, i),
       |c1 AS (SELECT c0.c AS c, c0.i AS i, COALESCE(m1.cv, c0.cv) AS cv
       |       FROM c0 LEFT JOIN m1 ON c0.c = m1.c AND c0.i = m1.i),
       |c1a AS (SELECT c, list(cv ORDER BY i) AS cvec FROM c1 GROUP BY c),
       |s2 AS (SELECT e.vec_id, c1a.c,
       |         round(list_sum(list_transform(generate_series(1, $Dim),
       |           i -> CAST(e.embedding[i] AS DOUBLE) * c1a.cvec[i])), 6) AS sim
       |       FROM embeddings e CROSS JOIN c1a),
       |a2 AS (SELECT vec_id, c FROM (SELECT vec_id, c, row_number() OVER (
       |         PARTITION BY vec_id ORDER BY sim DESC, c) AS rn FROM s2) WHERE rn = 1),
       |m2 AS (SELECT c, i, CAST(SUM(CAST(v AS DECIMAL(20,10))) AS DOUBLE) / COUNT(*) AS cv,
       |         COUNT(*) AS n
       |       FROM ev JOIN a2 USING (vec_id) GROUP BY c, i)""".stripMargin
  }

  /** Per-subspace two-iteration Lloyd + encode + asymmetric-distance
    * CTE chain for the ann_pq oracle: for each subspace m (dims
    * m*PqSub+1 .. (m+1)*PqSub) derive the trained codebook exactly as
    * Spark's kmeansTrainFrom does (iter-1 assignment = rounded
    * index-ordered dots against the ±1 md5 init unrolled as literals,
    * iter-2 assignment = row_number over sims to the iter-1 codebook,
    * updates = DECIMAL(20,10)-exact 6-dp pre-rounded per-dimension
    * means, empty clusters keep the previous centroid — the duckLloyd2
    * discipline, re-derived per slice), then s_$m (sims to the final
    * codebook) is BOTH the corpus assignment input and the query LUT,
    * asg_$m the encoded corpus, contrib_$m the per-subspace LUT value
    * of each (query, neighbor) pair.
    */
  private def duckPqCtes: String = {
    (0 until PqM).map { m =>
      val off = m * PqSub
      val init = Similarity.pqInitCoefs(m, PqK, PqSub)
      val c0rows = (for { c <- 0 until PqK; i <- 0 until PqSub } yield
        s"($c,${i + 1},${if (init(c)(i) > 0) "1.0" else "-1.0"})").mkString(",")
      val ds = init.zipWithIndex.map { case (cen, c) =>
        val arr = cen.map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ",", "]")
        s"round(list_sum(list_transform(generate_series(1, $PqSub), i -> CAST(embedding[$off + i] AS DOUBLE) * ($arr)[i])), 6) AS d_$c"
      }.mkString(",\n      ")
      val assign = (0 until PqK - 1).map { c =>
        val rest = (c + 1 until PqK).map(o => s"d_$c >= d_$o").mkString(" AND ")
        s"WHEN $rest THEN $c"
      }.mkString(" ")
      s"""pqc0_$m(c, i, cv) AS (VALUES $c0rows),
         |ev_$m AS (SELECT vec_id, i, round(CAST(embedding[$off + i] AS DOUBLE), 6) AS v
         |    FROM (SELECT vec_id, embedding, unnest(generate_series(1, $PqSub)) AS i FROM embeddings)),
         |a1_$m AS (SELECT vec_id, CASE $assign ELSE ${PqK - 1} END AS c
         |    FROM (SELECT vec_id, $ds FROM embeddings)),
         |m1_$m AS (SELECT c, i, CAST(SUM(CAST(v AS DECIMAL(20,10))) AS DOUBLE) / COUNT(*) AS cv
         |    FROM ev_$m JOIN a1_$m USING (vec_id) GROUP BY c, i),
         |cb1_$m AS (SELECT p.c, p.i, COALESCE(m.cv, p.cv) AS cv
         |    FROM pqc0_$m p LEFT JOIN m1_$m m ON p.c = m.c AND p.i = m.i),
         |cba1_$m AS (SELECT c, list(cv ORDER BY i) AS cvec FROM cb1_$m GROUP BY c),
         |s1_$m AS (SELECT e.vec_id, b.c,
         |    round(list_sum(list_transform(generate_series(1, $PqSub),
         |      i -> CAST(e.embedding[$off + i] AS DOUBLE) * b.cvec[i])), 6) AS sim
         |    FROM embeddings e CROSS JOIN cba1_$m b),
         |a2_$m AS (SELECT vec_id, c FROM (SELECT vec_id, c, row_number() OVER (
         |    PARTITION BY vec_id ORDER BY sim DESC, c) AS rn FROM s1_$m) WHERE rn = 1),
         |m2_$m AS (SELECT c, i, CAST(SUM(CAST(v AS DECIMAL(20,10))) AS DOUBLE) / COUNT(*) AS cv
         |    FROM ev_$m JOIN a2_$m USING (vec_id) GROUP BY c, i),
         |cb2_$m AS (SELECT p.c, p.i, COALESCE(m.cv, p.cv) AS cv
         |    FROM cb1_$m p LEFT JOIN m2_$m m ON p.c = m.c AND p.i = m.i),
         |cba2_$m AS (SELECT c, list(cv ORDER BY i) AS cvec FROM cb2_$m GROUP BY c),
         |s_$m AS (SELECT e.vec_id, b.c,
         |    round(list_sum(list_transform(generate_series(1, $PqSub),
         |      i -> CAST(e.embedding[$off + i] AS DOUBLE) * b.cvec[i])), 6) AS sim
         |    FROM embeddings e CROSS JOIN cba2_$m b),
         |asg_$m AS (SELECT vec_id, c FROM (SELECT vec_id, c, row_number() OVER (
         |    PARTITION BY vec_id ORDER BY sim DESC, c) AS rn FROM s_$m) WHERE rn = 1),
         |contrib_$m AS (SELECT s.vec_id AS q_id, a.vec_id AS n_id, s.sim
         |    FROM s_$m s JOIN asg_$m a ON s.c = a.c
         |    WHERE s.vec_id < 20 AND a.vec_id <> s.vec_id)""".stripMargin
    }.mkString(",\n")
  }

  /** DuckDB literal for the md5-derived hyperplane coefficients —
    * identical constants to [[Similarity.planeCoefs]].
    */
  private def duckBucket(tbl: String): String = {
    val coefs = Similarity.planeCoefs(Planes, Dim)
    (0 until Planes).map { p =>
      val arr = coefs(p).map(c => if (c > 0) "1.0" else "-1.0").mkString("[", ",", "]")
      s"(CASE WHEN list_sum(list_transform(generate_series(1, $Dim), i -> CAST($tbl.embedding[i] AS DOUBLE) * ($arr)[i])) > 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString(" + ")
  }

  def all: Seq[Q] = Seq(

    // SEMANTIC DECONTAMINATION — the embedding-space complement to the
    // n-gram `decontamination` query (modern eval hygiene runs BOTH:
    // exact-overlap n-grams catch copies, embedding similarity catches
    // paraphrases): for every training vector, the max cosine against
    // a held-out EVAL benchmark set, swept over three thresholds —
    // the census a curator reads before claiming an eval is clean.
    // (Sweep values are tuned to the fixture's similarity range —
    // max pairwise cosine ~0.45, the synthetic embeddings being
    // near-orthogonal; a production run sweeps 0.80/0.90/0.95. The
    // machinery is threshold-agnostic.)
    // The eval set is a deterministic FIXED slice (vec_id % 41 = 0
    // below a constant id ceiling — ~49 vectors at ANY scale factor,
    // exactly like a real benchmark: a fixed dimension, never
    // corpus-scaled). SCALE: the eval side
    // BROADCASTS; each corpus partition computes its |eval| cosines
    // map-side and the per-vector MAX partial-aggregates BEFORE the
    // exchange (max is order-free — no quantization needed), so the
    // one shuffle carries |train| rows, not |train|·|eval|; the sweep
    // is a 3-row broadcast. Mean-over-contaminated quantizes to
    // micro-units before summation (exact, order-free); cosines are
    // the suite's shared 6-dp-rounded index-ordered dot.
    Q("semantic_decontamination",
      s"""WITH q AS (SELECT * FROM embeddings WHERE vec_id % 41 = 0 AND vec_id < 2000),
         |n AS (SELECT * FROM embeddings WHERE NOT (vec_id % 41 = 0 AND vec_id < 2000)),
         |p AS (SELECT n.vec_id AS n_id,
         |    round(${duckDot("q", "n")} /
         |      (sqrt(${duckDot("q", "q")}) * sqrt(${duckDot("n", "n")})), 6) AS c
         |  FROM n JOIN q ON true),
         |m AS (SELECT n_id, MAX(c) AS max_cos FROM p GROUP BY 1),
         |t AS (SELECT CAST(tau AS DOUBLE) AS tau
         |      FROM (VALUES (0.30), (0.35), (0.40)) t(tau)),
         |g AS (SELECT tau, CAST(COUNT(*) AS BIGINT) AS n_train,
         |    CAST(SUM(CASE WHEN max_cos >= tau THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
         |    SUM(CASE WHEN max_cos >= tau
         |      THEN CAST(floor(max_cos * 1e6 + 0.5) AS BIGINT) END) AS sum_u
         |  FROM m, t GROUP BY tau)
         |SELECT tau, n_train, n_contaminated,
         |  CAST(n_contaminated AS DOUBLE) / n_train AS contamination_rate,
         |  CASE WHEN n_contaminated > 0
         |    THEN CAST(sum_u AS DOUBLE) / n_contaminated / 1e6 END AS mean_maxcos_contaminated
         |FROM g ORDER BY tau""".stripMargin) { (s, dir) =>
      import s.implicits._
      val e = Tables.load(s, dir, "embeddings")
      val evalSet = pmod(col("vec_id"), lit(41)) === 0 && col("vec_id") < 2000
      val q = e.filter(evalSet)
        .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
      // repartition the corpus side so the train x eval cosine work
      // parallelizes (fixture parquet is one row group)
      val n = e.filter(!(pmod(col("vec_id"), lit(41)) === 0 && col("vec_id") < 2000))
        .repartition(s.sparkContext.defaultParallelism, col("vec_id"))
        .select(col("vec_id").as("n_id"), col("embedding").as("ne"))
      val m = n.crossJoin(broadcast(q))
        .select(col("n_id"),
          graft.ops.Similarity.cosine(col("qe"), col("ne")).as("c"))
        .groupBy("n_id").agg(max(col("c")).as("max_cos"))
      val taus = Seq(0.30, 0.35, 0.40).toDF("tau")
      m.crossJoin(broadcast(taus))
        .groupBy("tau")
        .agg(count(lit(1)).cast("long").as("n_train"),
          sum(when(col("max_cos") >= col("tau"), 1).otherwise(0))
            .cast("long").as("n_contaminated"),
          sum(when(col("max_cos") >= col("tau"),
            floor(col("max_cos") * lit(1e6) + lit(0.5)).cast("long")))
            .as("sum_u"))
        .select(col("tau"), col("n_train"), col("n_contaminated"),
          (col("n_contaminated").cast("double") / col("n_train"))
            .as("contamination_rate"),
          when(col("n_contaminated") > 0,
            col("sum_u").cast("double") / col("n_contaminated") / lit(1e6))
            .as("mean_maxcos_contaminated"))
        .orderBy("tau")
    },

    // brute-force exact top-k (the correctness baseline for ANN)
    // Margin-based bitext/pair mining (Artetxe & Schwenk 2019, the
    // LASER/CCMatrix shape): for each query vector on side A, the
    // best candidate on side B scored by the RATIO margin — cos of
    // the pair over the mean cos of the query's k nearest B-side
    // neighbors — so a match only survives when it PEAKS above its
    // neighborhood (a flat neighborhood means "everything is equally
    // similar", i.e. no alignment). Sides here are the label parity
    // (stand-in for two languages). Discipline: cosines quantize to
    // integer micro-units before the k-NN mean (AVG over doubles is
    // summation-order-dependent; an integer sum is exact in both
    // engines), and the margin divides the exact integers. Same
    // broadcast-queries/stream-corpus shape as ann_bruteforce.
    Q("bitext_mine", {
      val k = 4
      s"""WITH a AS (SELECT * FROM embeddings WHERE label % 2 = 0 AND vec_id < 40),
         |b AS (SELECT * FROM embeddings WHERE label % 2 = 1),
         |p AS (SELECT a.vec_id AS q_id, b.vec_id AS n_id,
         |    round(${duckDot("a", "b")} /
         |      (sqrt(${duckDot("a", "a")}) * sqrt(${duckDot("b", "b")})), 6) AS cos_sim
         |  FROM a JOIN b ON true),
         |r AS (SELECT q_id, n_id, cos_sim,
         |    row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, n_id) AS rnk,
         |    CAST(floor(cos_sim * 1e6 + 0.5) AS BIGINT) AS cu FROM p),
         |d AS (SELECT q_id, SUM(CASE WHEN rnk <= $k THEN cu END) AS denom_u
         |      FROM r GROUP BY q_id)
         |SELECT r.q_id AS q_id, n_id, cos_sim,
         |  round(cu * $k.0 / denom_u, 6) AS margin
         |FROM r JOIN d ON r.q_id = d.q_id
         |WHERE rnk = 1 AND round(cu * $k.0 / denom_u, 6) >= 1.01
         |ORDER BY r.q_id""".stripMargin
    }) { (s, dir) =>
      val k = 4
      val e = Tables.load(s, dir, "embeddings")
      val q = e.filter(col("label") % 2 === 0 && col("vec_id") < 40)
        .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
      val n = e.filter(col("label") % 2 === 1)
        .repartition(s.sparkContext.defaultParallelism, col("vec_id"))
        .select(col("vec_id").as("n_id"), col("embedding").as("ne"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("n_id"))
      val wAll = Window.partitionBy(col("q_id"))
      n.crossJoin(broadcast(q))
        .select(col("q_id"), col("n_id"),
          Similarity.cosine(col("qe"), col("ne")).as("cos_sim"))
        .withColumn("rnk", row_number().over(w))
        .withColumn("cu", floor(col("cos_sim") * 1e6 + 0.5).cast("long"))
        .withColumn("denom_u", sum(when(col("rnk") <= k, col("cu"))).over(wAll))
        .filter(col("rnk") === 1)
        .withColumn("margin", round(col("cu") * lit(k.toDouble) / col("denom_u"), 6))
        .filter(col("margin") >= 1.01)
        .select("q_id", "n_id", "cos_sim", "margin")
        .orderBy("q_id")
    },

    Q("ann_bruteforce",
      s"""WITH q AS (SELECT * FROM embeddings WHERE vec_id < 5),
         |p AS (SELECT q.vec_id AS q_id, e.vec_id AS n_id,
         |    round(${duckDot("q", "e")} /
         |      (sqrt(${duckDot("q", "q")}) * sqrt(${duckDot("e", "e")})), 6) AS cos_sim
         |  FROM q JOIN embeddings e ON e.vec_id <> q.vec_id),
         |r AS (SELECT q_id, n_id, cos_sim, row_number() OVER (
         |        PARTITION BY q_id ORDER BY cos_sim DESC, n_id) AS rnk FROM p)
         |SELECT q_id, rnk, n_id, cos_sim FROM r WHERE rnk <= $TopK
         |ORDER BY q_id, rnk""".stripMargin) { (s, dir) =>
      val e = Tables.load(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
      // repartition the corpus side so the Q x N dot products parallelize
      val n = e.repartition(s.sparkContext.defaultParallelism, col("vec_id"))
        .select(col("vec_id").as("n_id"), col("embedding").as("ne"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("n_id"))
      // broadcast the tiny QUERY side and stream the corpus: the Q x N
      // cosine work then runs on the corpus partitions
      n.join(broadcast(q), col("n_id") =!= col("q_id"))
        .select(col("q_id"), col("n_id"),
          Similarity.cosine(col("qe"), col("ne")).as("cos_sim"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= TopK)
        .select("q_id", "rnk", "n_id", "cos_sim")
        .orderBy("q_id", "rnk")
    },

    // kNN LABEL-NOISE DETECTION — the embedding-space data-quality
    // check a labeled training set gets before training: for each
    // audited vector, the fraction of its k=10 exact cosine neighbors
    // sharing its label; low agreement (<0.3) flags the label as
    // likely noise (the kNN-agreement core of confident-learning
    // pipelines). Same broadcast-queries/stream-corpus shape as
    // ann_bruteforce — the audited subset ships to the corpus
    // partitions, cosines and the top-k window do the work, the
    // output is |audited| fixed-width rows. At 100 TB the audited
    // sample is bounded by construction and the corpus side streams.
    Q("knn_label_noise",
      s"""WITH q AS (SELECT * FROM embeddings WHERE vec_id < 50),
         |p AS (SELECT q.vec_id AS q_id, q.label AS q_label,
         |    e.label AS n_label, e.vec_id AS n_id,
         |    round(${duckDot("q", "e")} /
         |      (sqrt(${duckDot("q", "q")}) * sqrt(${duckDot("e", "e")})), 6) AS cos_sim
         |  FROM q JOIN embeddings e ON e.vec_id <> q.vec_id),
         |r AS (SELECT q_id, q_label, n_label, cos_sim, row_number() OVER (
         |        PARTITION BY q_id ORDER BY cos_sim DESC, n_id) AS rnk FROM p)
         |SELECT q_id, q_label AS label,
         |  CAST(SUM(CASE WHEN n_label = q_label THEN 1 ELSE 0 END) AS BIGINT) AS n_agree,
         |  round(SUM(CASE WHEN n_label = q_label THEN 1 ELSE 0 END) / 10.0, 6) AS agreement,
         |  SUM(CASE WHEN n_label = q_label THEN 1 ELSE 0 END) < 3 AS noisy
         |FROM r WHERE rnk <= 10 GROUP BY 1, 2 ORDER BY q_id""".stripMargin) { (s, dir) =>
      val e = Tables.load(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 50)
        .select(col("vec_id").as("q_id"), col("label").as("q_label"),
          col("embedding").as("qe"))
      val n = e.repartition(s.sparkContext.defaultParallelism, col("vec_id"))
        .select(col("vec_id").as("n_id"), col("label").as("n_label"),
          col("embedding").as("ne"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("n_id"))
      val agree = sum(when(col("n_label") === col("q_label"), 1).otherwise(0))
      n.join(broadcast(q), col("n_id") =!= col("q_id"))
        .select(col("q_id"), col("q_label"), col("n_label"), col("n_id"),
          Similarity.cosine(col("qe"), col("ne")).as("cos_sim"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 10)
        .groupBy("q_id", "q_label")
        .agg(agree.cast("long").as("n_agree"))
        .select(col("q_id"), col("q_label").as("label"), col("n_agree"),
          round(col("n_agree") / 10.0, 6).as("agreement"),
          (col("n_agree") < 3).as("noisy"))
        .orderBy("q_id")
    },

    // LSH-bucketed ANN: probe only the query's own hyperplane bucket
    Q("ann_lsh",
      s"""WITH e AS (SELECT vec_id, embedding, ${duckBucket("embeddings")} AS bucket
         |           FROM embeddings),
         |q AS (SELECT * FROM e WHERE vec_id < 20),
         |p AS (SELECT q.vec_id AS q_id, q.bucket AS bucket, e.vec_id AS n_id,
         |    round(${duckDot("q", "e")} /
         |      (sqrt(${duckDot("q", "q")}) * sqrt(${duckDot("e", "e")})), 6) AS cos_sim
         |  FROM q JOIN e ON q.bucket = e.bucket AND e.vec_id <> q.vec_id),
         |r AS (SELECT q_id, bucket, n_id, cos_sim, row_number() OVER (
         |        PARTITION BY q_id ORDER BY cos_sim DESC, n_id) AS rnk FROM p)
         |SELECT q_id, bucket, rnk, n_id, cos_sim FROM r WHERE rnk <= 5
         |ORDER BY q_id, rnk""".stripMargin) { (s, dir) =>
      val coefs = Similarity.planeCoefs(Planes, Dim)
      val e = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"),
          Similarity.lshBucket(col("embedding"), coefs).as("bucket"))
      val q = e.select(col("vec_id").as("q_id"), col("embedding").as("qe"),
        col("bucket")).filter(col("q_id") < 20)
      val n = e.repartition(s.sparkContext.defaultParallelism, col("vec_id"))
        .select(col("vec_id").as("n_id"), col("embedding").as("ne"), col("bucket"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("n_id"))
      n.join(broadcast(q), Seq("bucket")).filter(col("n_id") =!= col("q_id"))
        .select(col("q_id"), col("bucket"), col("n_id"),
          Similarity.cosine(col("qe"), col("ne")).as("cos_sim"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .select("q_id", "bucket", "rnk", "n_id", "cos_sim")
        .orderBy("q_id", "rnk")
    },

    // IVF-bucketed ANN: assign every vector to its nearest of K
    // deterministic coarse centroids (the "inverted lists"; at cluster
    // scale the table is PARTITIONED BY cl, so a probe reads nprobe
    // lists instead of the whole corpus), then search only the query's
    // nprobe most-similar lists. Recall/latency trade-off vs ann_lsh:
    // probing 2 of 4 lists halves the candidate set with graceful
    // degradation, while LSH probes exactly one hash bucket.
    Q("ann_ivf", {
      val coefs = Similarity.centroidCoefs(Centroids, Dim)
      def duckArr(c: Array[Double]) =
        c.map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ",", "]")
      val ds = coefs.zipWithIndex.map { case (cen, c) =>
        s"round(list_sum(list_transform(generate_series(1, $Dim), i -> CAST(embeddings.embedding[i] AS DOUBLE) * (${duckArr(cen)})[i])), 6) AS d_$c"
      }.mkString(",\n    ")
      val assign = (0 until Centroids - 1).map { c =>
        val rest = (c + 1 until Centroids).map(o => s"d_$c >= d_$o").mkString(" AND ")
        s"WHEN $rest THEN $c"
      }.mkString(" ")
      val structs = (0 until Centroids)
        .map(c => s"struct_pack(c := $c, s := d_$c)").mkString(", ")
      s"""WITH e AS (SELECT vec_id, embedding, $ds,
         |    CASE $assign ELSE ${Centroids - 1} END AS cl
         |  FROM embeddings),
         |qs AS (SELECT vec_id, embedding, unnest([$structs]) AS cs
         |       FROM e WHERE vec_id < 20),
         |qp AS (SELECT vec_id AS q_id, embedding AS qe, cs.c AS cl,
         |         row_number() OVER (PARTITION BY vec_id
         |           ORDER BY cs.s DESC, cs.c) AS crn
         |       FROM qs),
         |p AS (SELECT q.q_id, n.cl AS cl, n.vec_id AS n_id,
         |    round(list_sum(list_transform(generate_series(1, $Dim), i -> CAST(q.qe[i] AS DOUBLE) * n.embedding[i])) /
         |      (sqrt(list_sum(list_transform(generate_series(1, $Dim), i -> CAST(q.qe[i] AS DOUBLE) * q.qe[i]))) *
         |       sqrt(${duckDot("n", "n")})), 6) AS cos_sim
         |  FROM (SELECT * FROM qp WHERE crn <= $Nprobe) q
         |  JOIN e n ON n.cl = q.cl AND n.vec_id <> q.q_id),
         |r AS (SELECT q_id, cl, n_id, cos_sim, row_number() OVER (
         |        PARTITION BY q_id ORDER BY cos_sim DESC, n_id) AS rnk FROM p)
         |SELECT q_id, rnk, n_id, cl, cos_sim FROM r WHERE rnk <= 5
         |ORDER BY q_id, rnk""".stripMargin
    }) { (s, dir) =>
      val coefs = Similarity.centroidCoefs(Centroids, Dim)
      val sims = Similarity.centroidSims(col("embedding"), coefs)
      val e = Tables.load(s, dir, "embeddings").select(
        Seq(col("vec_id"), col("embedding"),
          Similarity.ivfAssign(sims).as("cl")) ++
          sims.zipWithIndex.map { case (c, i) => c.as(s"s_$i") }: _*)
      val probes = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("embedding").as("qe"),
          explode(array((0 until Centroids).map(c =>
            struct(lit(c).as("c"), col(s"s_$c").as("s"))): _*)).as("cs"))
        .withColumn("crn", row_number().over(Window.partitionBy("q_id")
          .orderBy(col("cs.s").desc, col("cs.c"))))
        .filter(col("crn") <= Nprobe)
        .select(col("q_id"), col("qe"), col("cs.c").as("cl"))
      // corpus side streams; tiny probe list broadcasts (the IVF probe
      // pattern: work is proportional to the probed lists only)
      val n = e.repartition(s.sparkContext.defaultParallelism, col("vec_id"))
        .select(col("vec_id").as("n_id"), col("embedding").as("ne"), col("cl"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("n_id"))
      n.join(broadcast(probes), Seq("cl")).filter(col("n_id") =!= col("q_id"))
        .select(col("q_id"), col("cl"), col("n_id"),
          Similarity.cosine(col("qe"), col("ne")).as("cos_sim"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .select("q_id", "rnk", "n_id", "cl", "cos_sim")
        .orderBy("q_id", "rnk")
    },

    // IVF OPERATING-POINT CURVE — the tuning table behind ann_ivf's
    // fixed Nprobe=2: recall@5 against the exact (brute-force) top-5
    // at EVERY probe count 1..K, from ONE pass. The trick: a
    // neighbor reached through list `cl` is visible at probe count
    // np iff the query ranks `cl` within its top np centroids (crn
    // <= np), so the all-pairs cosine computes ONCE, each pair
    // carries its crn, and a broadcast 4-row nprobe dim fans the
    // ranking — the corpus is NOT rescanned per operating point
    // (the quality_pr_curve pattern applied to retrieval). At
    // nprobe=K the candidate set is the full corpus, so recall@5 is
    // exactly 1.0 — asserted in KMeansSpec as the curve's anchor.
    // Scale: the query set is broadcast-bounded (20 vectors); the
    // corpus streams once; everything after the per-(q, np) top-5
    // window is a 4-row census.
    Q("ann_probe_recall_curve", {
      val coefs = Similarity.centroidCoefs(Centroids, Dim)
      def duckArr(c: Array[Double]) =
        c.map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ",", "]")
      val ds = coefs.zipWithIndex.map { case (cen, c) =>
        s"round(list_sum(list_transform(generate_series(1, $Dim), i -> CAST(embeddings.embedding[i] AS DOUBLE) * (${duckArr(cen)})[i])), 6) AS d_$c"
      }.mkString(",\n    ")
      val assign = (0 until Centroids - 1).map { c =>
        val rest = (c + 1 until Centroids).map(o => s"d_$c >= d_$o").mkString(" AND ")
        s"WHEN $rest THEN $c"
      }.mkString(" ")
      val structs = (0 until Centroids)
        .map(c => s"struct_pack(c := $c, s := d_$c)").mkString(", ")
      s"""WITH e AS (SELECT vec_id, embedding, $ds,
         |    CASE $assign ELSE ${Centroids - 1} END AS cl
         |  FROM embeddings),
         |qs AS (SELECT vec_id, embedding, unnest([$structs]) AS cs
         |       FROM e WHERE vec_id < 20),
         |qp AS (SELECT vec_id AS q_id, cs.c AS cl,
         |         row_number() OVER (PARTITION BY vec_id
         |           ORDER BY cs.s DESC, cs.c) AS crn
         |       FROM qs),
         |p AS (SELECT q.vec_id AS q_id, n.vec_id AS n_id, n.cl AS cl,
         |    round(list_sum(list_transform(generate_series(1, $Dim), i -> CAST(q.qe[i] AS DOUBLE) * n.embedding[i])) /
         |      (sqrt(list_sum(list_transform(generate_series(1, $Dim), i -> CAST(q.qe[i] AS DOUBLE) * q.qe[i]))) *
         |       sqrt(${duckDot("n", "n")})), 6) AS cos_sim
         |  FROM (SELECT vec_id, embedding AS qe FROM e WHERE vec_id < 20) q
         |  JOIN e n ON n.vec_id <> q.vec_id),
         |pg AS (SELECT p.q_id, p.n_id, cos_sim, crn, row_number() OVER (
         |        PARTITION BY p.q_id ORDER BY cos_sim DESC, n_id) AS gt_rnk
         |       FROM p JOIN qp ON p.q_id = qp.q_id AND p.cl = qp.cl),
         |npd AS (SELECT unnest(generate_series(1, $Centroids)) AS nprobe),
         |a AS (SELECT nprobe, q_id, gt_rnk, row_number() OVER (
         |        PARTITION BY q_id, nprobe ORDER BY cos_sim DESC, n_id) AS a_rnk
         |      FROM pg CROSS JOIN npd WHERE crn <= nprobe)
         |SELECT nprobe, COUNT(DISTINCT q_id) AS n_queries,
         |  CAST(SUM(CASE WHEN gt_rnk <= 5 THEN 1 ELSE 0 END) AS BIGINT) AS hits,
         |  round(CAST(SUM(CASE WHEN gt_rnk <= 5 THEN 1 ELSE 0 END) AS DOUBLE) /
         |    (COUNT(DISTINCT q_id) * 5), 6) AS recall_at_5
         |FROM a WHERE a_rnk <= 5 GROUP BY nprobe ORDER BY nprobe""".stripMargin
    }) { (s, dir) =>
      val coefs = Similarity.centroidCoefs(Centroids, Dim)
      val sims = Similarity.centroidSims(col("embedding"), coefs)
      val e = Tables.load(s, dir, "embeddings").select(
        Seq(col("vec_id"), col("embedding"),
          Similarity.ivfAssign(sims).as("cl")) ++
          sims.zipWithIndex.map { case (c, i) => c.as(s"s_$i") }: _*)
      val qranks = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"),
          explode(array((0 until Centroids).map(c =>
            struct(lit(c).as("c"), col(s"s_$c").as("s"))): _*)).as("cs"))
        .withColumn("crn", row_number().over(Window.partitionBy("q_id")
          .orderBy(col("cs.s").desc, col("cs.c"))))
        .select(col("q_id"), col("cs.c").as("cl"), col("crn"))
      val q20 = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
      val n = e.repartition(s.sparkContext.defaultParallelism, col("vec_id"))
        .select(col("vec_id").as("n_id"), col("embedding").as("ne"), col("cl"))
      val pairs = n.join(broadcast(q20), col("n_id") =!= col("q_id"))
        .select(col("q_id"), col("n_id"), col("cl"),
          Similarity.cosine(col("qe"), col("ne")).as("cos_sim"))
        .join(broadcast(qranks), Seq("q_id", "cl"))
      val wq = Window.partitionBy("q_id")
        .orderBy(col("cos_sim").desc, col("n_id"))
      val npd = s.range(1, Centroids + 1).select(col("id").cast("int").as("nprobe"))
      val wnp = Window.partitionBy("q_id", "nprobe")
        .orderBy(col("cos_sim").desc, col("n_id"))
      pairs.withColumn("gt_rnk", row_number().over(wq))
        .crossJoin(broadcast(npd)).filter(col("crn") <= col("nprobe"))
        .withColumn("a_rnk", row_number().over(wnp))
        .filter(col("a_rnk") <= 5)
        .groupBy("nprobe")
        .agg(countDistinct(col("q_id")).as("n_queries"),
          sum(when(col("gt_rnk") <= 5, 1).otherwise(0)).as("hits"))
        .select(col("nprobe"), col("n_queries"), col("hits"),
          round(col("hits").cast("double") / (col("n_queries") * 5), 6)
            .as("recall_at_5"))
        .orderBy("nprobe")
    },

    // EMBEDDING NORM PROFILE — the audit behind the cosine-vs-dot
    // decision: per label, the L2-norm distribution (decimal-exact
    // mean, sd, min/max). A label whose norms drift from the global
    // profile breaks dot-product ranking comparability and is the
    // cue to re-normalize before indexing. Norms are per-row math
    // (same index-ordered fold as every cosine here, rounded to
    // 6 dp); moments sum as DECIMAL so the census is
    // partition-order-independent. One scan, |labels| output rows.
    Q("embedding_norm_stats",
      s"""WITH n AS (SELECT label,
         |    CAST(round(sqrt(list_sum(list_transform(generate_series(1, $Dim),
         |      i -> CAST(embedding[i] AS DOUBLE) * embedding[i]))), 6) AS DECIMAL(18,6)) AS nrm
         |  FROM embeddings)
         |SELECT label, COUNT(*) AS n_vecs,
         |  round(CAST(SUM(nrm) AS DOUBLE) / COUNT(*), 6) AS mean_norm,
         |  round(sqrt(CAST(SUM(CAST(round(CAST(nrm AS DOUBLE) * CAST(nrm AS DOUBLE), 6) AS DECIMAL(24,6))) AS DOUBLE) / COUNT(*)
         |    - (CAST(SUM(nrm) AS DOUBLE) / COUNT(*)) * (CAST(SUM(nrm) AS DOUBLE) / COUNT(*))), 6) AS sd_norm,
         |  CAST(MIN(nrm) AS DOUBLE) AS min_norm,
         |  CAST(MAX(nrm) AS DOUBLE) AS max_norm
         |FROM n GROUP BY label ORDER BY label""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.types.DecimalType
      val nrm = round(Similarity.norm(col("embedding")), 6)
        .cast(DecimalType(18, 6))
      val meanN = sum(col("nrm")).cast("double") / count(lit(1))
      Tables.load(s, dir, "embeddings")
        .select(col("label"), nrm.as("nrm"))
        .groupBy("label")
        .agg(count(lit(1)).as("n_vecs"),
          round(meanN, 6).as("mean_norm"),
          round(sqrt(sum(round(col("nrm").cast("double") *
              col("nrm").cast("double"), 6).cast(DecimalType(24, 6)))
            .cast("double") / count(lit(1)) - meanN * meanN), 6).as("sd_norm"),
          min(col("nrm")).cast("double").as("min_norm"),
          max(col("nrm")).cast("double").as("max_norm"))
        .orderBy("label")
    },

    // RECIPROCAL-RANK FUSION (Cormack et al., SIGIR '09) — the
    // standard zero-tuning ensemble for heterogeneous retrievers:
    // fuse the IVF shortlist and the LSH-bucket shortlist per query
    // by score(n) = Σ_lists 1/(60 + rank_list(n)) and re-rank. RRF
    // needs only RANKS, never comparable scores — which is exactly
    // why it is the default when one arm is a dot-product search and
    // the other a hash bucket. Both arms derive from ONE embedding
    // scan (assignments + buckets computed together); ranks are
    // integers, the fused score is a 1-2 term sum of exact rationals
    // in fixed order, and ties break by n_id — deterministic across
    // engines and partitionings. Candidate frames stay
    // probed-list/bucket-bounded; the fusion join is shortlist-sized.
    Q("rrf_fusion", {
      val coefs = Similarity.centroidCoefs(Centroids, Dim)
      def duckArr(c: Array[Double]) =
        c.map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ",", "]")
      val ds = coefs.zipWithIndex.map { case (cen, c) =>
        s"round(list_sum(list_transform(generate_series(1, $Dim), i -> CAST(embeddings.embedding[i] AS DOUBLE) * (${duckArr(cen)})[i])), 6) AS d_$c"
      }.mkString(",\n    ")
      val assign = (0 until Centroids - 1).map { c =>
        val rest = (c + 1 until Centroids).map(o => s"d_$c >= d_$o").mkString(" AND ")
        s"WHEN $rest THEN $c"
      }.mkString(" ")
      val structs = (0 until Centroids)
        .map(c => s"struct_pack(c := $c, s := d_$c)").mkString(", ")
      val cosQN =
        s"""round(list_sum(list_transform(generate_series(1, $Dim), i -> CAST(q.qe[i] AS DOUBLE) * n.embedding[i])) /
           |      (sqrt(list_sum(list_transform(generate_series(1, $Dim), i -> CAST(q.qe[i] AS DOUBLE) * q.qe[i]))) *
           |       sqrt(${duckDot("n", "n")})), 6)""".stripMargin
      s"""WITH e AS (SELECT vec_id, embedding, $ds,
         |    CASE $assign ELSE ${Centroids - 1} END AS cl,
         |    ${duckBucket("embeddings")} AS bucket
         |  FROM embeddings),
         |qs AS (SELECT vec_id, embedding, unnest([$structs]) AS cs
         |       FROM e WHERE vec_id < 20),
         |qp AS (SELECT vec_id AS q_id, embedding AS qe, cs.c AS cl,
         |         row_number() OVER (PARTITION BY vec_id
         |           ORDER BY cs.s DESC, cs.c) AS crn
         |       FROM qs),
         |pi AS (SELECT q.q_id, n.vec_id AS n_id, $cosQN AS cs
         |       FROM (SELECT * FROM qp WHERE crn <= $Nprobe) q
         |       JOIN e n ON n.cl = q.cl AND n.vec_id <> q.q_id),
         |ri AS (SELECT q_id, n_id, row_number() OVER (
         |        PARTITION BY q_id ORDER BY cs DESC, n_id) AS r FROM pi),
         |ql AS (SELECT vec_id AS q_id, embedding AS qe, bucket
         |       FROM e WHERE vec_id < 20),
         |pl AS (SELECT q.q_id, n.vec_id AS n_id, $cosQN AS cs
         |       FROM ql q JOIN e n ON n.bucket = q.bucket AND n.vec_id <> q.q_id),
         |rl AS (SELECT q_id, n_id, row_number() OVER (
         |        PARTITION BY q_id ORDER BY cs DESC, n_id) AS r FROM pl),
         |f AS (SELECT COALESCE(a.q_id, b.q_id) AS q_id,
         |        COALESCE(a.n_id, b.n_id) AS n_id,
         |        COALESCE(1.0 / (60 + a.r), 0) + COALESCE(1.0 / (60 + b.r), 0) AS score
         |      FROM (SELECT * FROM ri WHERE r <= 10) a
         |      FULL OUTER JOIN (SELECT * FROM rl WHERE r <= 10) b
         |        ON a.q_id = b.q_id AND a.n_id = b.n_id),
         |rr AS (SELECT q_id, n_id, score, row_number() OVER (
         |        PARTITION BY q_id ORDER BY score DESC, n_id) AS rnk FROM f)
         |SELECT q_id, rnk, n_id, round(score, 6) AS rrf
         |FROM rr WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin
    }) { (s, dir) =>
      val coefs = Similarity.centroidCoefs(Centroids, Dim)
      val planes = Similarity.planeCoefs(Planes, Dim)
      val sims = Similarity.centroidSims(col("embedding"), coefs)
      val e = Tables.load(s, dir, "embeddings").select(
        Seq(col("vec_id"), col("embedding"),
          Similarity.ivfAssign(sims).as("cl"),
          Similarity.lshBucket(col("embedding"), planes).as("bucket")) ++
          sims.zipWithIndex.map { case (c, i) => c.as(s"s_$i") }: _*)
      val n = e.repartition(s.sparkContext.defaultParallelism, col("vec_id"))
        .select(col("vec_id").as("n_id"), col("embedding").as("ne"),
          col("cl"), col("bucket"))
      // IVF arm: probed-list candidates, ranked
      val probes = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("embedding").as("qe"),
          explode(array((0 until Centroids).map(c =>
            struct(lit(c).as("c"), col(s"s_$c").as("s"))): _*)).as("cs"))
        .withColumn("crn", row_number().over(Window.partitionBy("q_id")
          .orderBy(col("cs.s").desc, col("cs.c"))))
        .filter(col("crn") <= Nprobe)
        .select(col("q_id"), col("qe"), col("cs.c").as("cl"))
      val wq = Window.partitionBy("q_id").orderBy(col("cs").desc, col("n_id"))
      val ri = n.join(broadcast(probes), Seq("cl"))
        .filter(col("n_id") =!= col("q_id"))
        .select(col("q_id"), col("n_id"),
          Similarity.cosine(col("qe"), col("ne")).as("cs"))
        .withColumn("r", row_number().over(wq))
        .filter(col("r") <= 10).select("q_id", "n_id", "r")
      // LSH arm: own-bucket candidates, ranked
      val ql = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("embedding").as("qe"),
          col("bucket"))
      val rl = n.join(broadcast(ql), Seq("bucket"))
        .filter(col("n_id") =!= col("q_id"))
        .select(col("q_id"), col("n_id"),
          Similarity.cosine(col("qe"), col("ne")).as("cs"))
        .withColumn("r", row_number().over(wq))
        .filter(col("r") <= 10).select("q_id", "n_id", "r")
      val f = ri.withColumnRenamed("r", "ra")
        .join(rl.withColumnRenamed("r", "rb"), Seq("q_id", "n_id"),
          "full_outer")
        .select(col("q_id"), col("n_id"),
          (coalesce(lit(1.0) / (lit(60) + col("ra")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60) + col("rb")), lit(0.0))).as("score"))
      f.withColumn("rnk", row_number().over(Window.partitionBy("q_id")
          .orderBy(col("score").desc, col("n_id"))))
        .filter(col("rnk") <= 5)
        .select(col("q_id"), col("rnk"), col("n_id"),
          round(col("score"), 6).as("rrf"))
        .orderBy("q_id", "rnk")
    },

    // Trained IVF coarse quantizer: two Lloyd (k-means) iterations from
    // the deterministic md5 init — the training step the fixed-centroid
    // ann_ivf skips. Oracled by unrolling BOTH iterations in SQL:
    // assignment = rounded index-ordered dot products (the ann_ivf
    // construction), update = DECIMAL(20,10)-exact per-dimension means
    // (order-independent, so Spark's distributed partial aggregation
    // and DuckDB's single-node scan produce bit-identical centroids),
    // empty clusters keep their previous centroid on both engines.
    Q("kmeans_centroids",
      s"""${duckLloyd2(KmeansK)}
         |SELECT c AS cluster, CAST(i - 1 AS INT) AS idx, cv AS component, n
         |FROM m2 ORDER BY cluster, idx""".stripMargin) { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      val (cents, counts) =
        Similarity.kmeansTrain(emb, "embedding", KmeansK, Dim, 2)
      val rows = for {
        c <- 0 until KmeansK if counts(c) > 0
        i <- 0 until Dim
      } yield (c, i, cents(c)(i), counts(c))
      import s.implicits._
      rows.toDF("cluster", "idx", "component", "n")
        .orderBy("cluster", "idx")
    },

    // IVF probe with the TRAINED coarse quantizer (closes the loop
    // kmeans_centroids opened: ann_ivf assigns with the md5 init, this
    // assigns with the 2-iteration Lloyd centroids). The oracle
    // re-derives the trained centroids inside SQL by unrolling both
    // Lloyd iterations (the kmeans_centroids oracle proved that
    // construction hash-matches Spark's training bit-for-bit), then
    // runs the same probe as ann_ivf against them. Spark side: train
    // via kmeansTrain (k*dim scalars collected, the documented Lloyd
    // broadcast step), assign the corpus with the native CentroidAssign
    // (one codegen reference object), and rank probe lists from
    // one-shot unrolled literal sims (each sim appears once, so no
    // O(k^2) janino blowup; same literals every run, so the codegen
    // cache holds across bench passes).
    Q("ann_ivf_trained",
      s"""${duckLloyd2(Centroids)},
         |c2 AS (SELECT c1.c AS c, c1.i AS i, COALESCE(m2.cv, c1.cv) AS cv
         |       FROM c1 LEFT JOIN m2 ON c1.c = m2.c AND c1.i = m2.i),
         |c2a AS (SELECT c, list(cv ORDER BY i) AS cvec FROM c2 GROUP BY c),
         |s3 AS (SELECT e.vec_id, c2a.c,
         |         round(list_sum(list_transform(generate_series(1, $Dim),
         |           i -> CAST(e.embedding[i] AS DOUBLE) * c2a.cvec[i])), 6) AS sim
         |       FROM embeddings e CROSS JOIN c2a),
         |asg AS (SELECT vec_id, c AS cl FROM (SELECT vec_id, c, row_number() OVER (
         |         PARTITION BY vec_id ORDER BY sim DESC, c) AS rn FROM s3) WHERE rn = 1),
         |n AS (SELECT e.vec_id, e.embedding, asg.cl FROM embeddings e
         |      JOIN asg USING (vec_id)),
         |qp AS (SELECT vec_id AS q_id, c AS cl, row_number() OVER (
         |         PARTITION BY vec_id ORDER BY sim DESC, c) AS crn
         |       FROM s3 WHERE vec_id < 20),
         |p AS (SELECT q.q_id, n.cl AS cl, n.vec_id AS n_id,
         |    round(${duckDot("qv", "n")} /
         |      (sqrt(${duckDot("qv", "qv")}) * sqrt(${duckDot("n", "n")})), 6) AS cos_sim
         |  FROM (SELECT * FROM qp WHERE crn <= $Nprobe) q
         |  JOIN embeddings qv ON qv.vec_id = q.q_id
         |  JOIN n ON n.cl = q.cl AND n.vec_id <> q.q_id),
         |r AS (SELECT q_id, cl, n_id, cos_sim, row_number() OVER (
         |        PARTITION BY q_id ORDER BY cos_sim DESC, n_id) AS rnk FROM p)
         |SELECT q_id, rnk, n_id, cl, cos_sim FROM r WHERE rnk <= 5
         |ORDER BY q_id, rnk""".stripMargin) { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      val (cents, _) = Similarity.kmeansTrain(emb, "embedding", Centroids, Dim, 2)
      val e = emb.select(col("vec_id"), col("embedding"),
        graft.functions.CentroidAssign(col("embedding"), cents).as("cl"))
      val sims = cents.toIndexedSeq.map(cen =>
        round(Similarity.dotLit(col("embedding"), cen), 6))
      val probes = emb.filter(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("embedding").as("qe"),
          explode(array((0 until Centroids).map(c =>
            struct(lit(c).as("c"), sims(c).as("s"))): _*)).as("cs"))
        .withColumn("crn", row_number().over(Window.partitionBy("q_id")
          .orderBy(col("cs.s").desc, col("cs.c"))))
        .filter(col("crn") <= Nprobe)
        .select(col("q_id"), col("qe"), col("cs.c").as("cl"))
      val n = e.repartition(s.sparkContext.defaultParallelism, col("vec_id"))
        .select(col("vec_id").as("n_id"), col("embedding").as("ne"), col("cl"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("n_id"))
      n.join(broadcast(probes), Seq("cl")).filter(col("n_id") =!= col("q_id"))
        .select(col("q_id"), col("cl"), col("n_id"),
          Similarity.cosine(col("qe"), col("ne")).as("cos_sim"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .select("q_id", "rnk", "n_id", "cl", "cos_sim")
        .orderBy("q_id", "rnk")
    },

    // Cluster-quality audit: after training the KmeansK-centroid
    // quantizer (the same 2-iteration Lloyd as kmeans_centroids),
    // cross-tab the assignment against the fixture's label column —
    // per-cluster size, majority label, and purity (majority share).
    // This is the eval step that tells a pipeline whether its coarse
    // quantizer respects the corpus's semantic partitions (high
    // purity: IVF lists align with labels, probes can prune by label;
    // low purity on a labeled corpus: the embedding space or k is
    // wrong). One map-only assignment pass + a |k x labels| aggregate
    // — at 100 TB the cross-tab is k*|labels| partials per task, the
    // same bounded-shuffle contract as every audit here. Majority
    // ties break to the lexicographically smallest label on both
    // engines (row_number over n DESC, label).
    Q("cluster_purity",
      s"""${duckLloyd2(KmeansK)},
         |c2 AS (SELECT c1.c AS c, c1.i AS i, COALESCE(m2.cv, c1.cv) AS cv
         |       FROM c1 LEFT JOIN m2 ON c1.c = m2.c AND c1.i = m2.i),
         |c2a AS (SELECT c, list(cv ORDER BY i) AS cvec FROM c2 GROUP BY c),
         |s3 AS (SELECT e.vec_id, c2a.c,
         |         round(list_sum(list_transform(generate_series(1, $Dim),
         |           i -> CAST(e.embedding[i] AS DOUBLE) * c2a.cvec[i])), 6) AS sim
         |       FROM embeddings e CROSS JOIN c2a),
         |asg AS (SELECT vec_id, c AS cl FROM (SELECT vec_id, c, row_number() OVER (
         |         PARTITION BY vec_id ORDER BY sim DESC, c) AS rn FROM s3) WHERE rn = 1),
         |lc AS (SELECT cl, label, COUNT(*) AS n
         |       FROM asg JOIN embeddings USING (vec_id) GROUP BY cl, label),
         |tot AS (SELECT cl, CAST(SUM(n) AS BIGINT) AS sz FROM lc GROUP BY cl),
         |maj AS (SELECT cl, label, n FROM (SELECT cl, label, n, row_number() OVER (
         |         PARTITION BY cl ORDER BY n DESC, label) AS rn FROM lc) WHERE rn = 1)
         |SELECT tot.cl AS cluster, tot.sz AS size, maj.label AS majority_label,
         |  CAST(maj.n AS BIGINT) AS majority_n,
         |  CAST(maj.n AS DOUBLE) / CAST(tot.sz AS DOUBLE) AS purity
         |FROM tot JOIN maj USING (cl) ORDER BY cluster""".stripMargin) { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      val (cents, _) = Similarity.kmeansTrain(emb, "embedding", KmeansK, Dim, 2)
      // ONE scan, two cascaded aggregates: the majority label is
      // max(struct(n, -label)) — largest count, ties to the SMALLEST
      // label (labels are ints; negation flips struct order) — so the
      // tot/maj split never duplicates the (cl, label) counts the way
      // a count-branch + window-branch pair would (measured: that
      // shape scanned embeddings twice and paid 6 exchanges; this one
      // scans once and pays 2 + the output sort)
      Tables.load(s, dir, "embeddings")
        .select(
          graft.functions.CentroidAssign(col("embedding"), cents).as("cl"),
          col("label"))
        .groupBy("cl", "label").agg(count(lit(1)).as("n"))
        .groupBy("cl")
        .agg(sum(col("n")).cast("long").as("sz"),
          max(struct(col("n"), (-col("label")).as("neg"))).as("m"))
        .select(col("cl").as("cluster"), col("sz").as("size"),
          (-col("m.neg")).as("majority_label"), col("m.n").as("majority_n"),
          (col("m.n").cast("double") / col("sz").cast("double")).as("purity"))
        .orderBy("cluster")
    },

    // Symmetric int8 scalar quantization of the embedding store — the
    // compression step that makes a 100 TB float32 corpus a 25 TB
    // int8 one (4x more vectors per executor page, the difference
    // between an ANN probe that fits in memory and one that spills).
    // Per-vector max-abs scale; codes = floor(x/scale + 0.5) spelled
    // EXPLICITLY (both engines' round() tie rules differ on half-way
    // doubles; floor(+0.5) is the same IEEE op everywhere). Everything
    // is row-local map work — no shuffle at all until the output sort,
    // and none in production where results write back partition-wise.
    // Codes are pinned cross-engine as md5 of the joined code string
    // (list columns don't survive every comparator; the hash pins all
    // 64 values exactly). MSE folds in index order like every dot
    // product here.
    Q("embed_quantize",
      s"""WITH $duckQuantizeCtes
         |SELECT vec_id, round(scale, 6) AS scale,
         |  list_max(list_transform(codes, x -> abs(x))) AS max_code,
         |  md5(array_to_string(list_transform(codes, x -> CAST(x AS VARCHAR)), ',')) AS codes_md5,
         |  round(list_sum(list_transform(generate_series(1, $Dim),
         |    i -> (CAST(embedding[i] AS DOUBLE) - codes[i] * scale)
         |       * (CAST(embedding[i] AS DOUBLE) - codes[i] * scale))) / $Dim, 9) AS mse
         |FROM c ORDER BY vec_id""".stripMargin) { (s, dir) =>
      val scaled = quantized(s, dir)
      scaled.select(
          col("vec_id"), round(col("scale_raw"), 6).as("scale"),
          array_max(transform(col("codes"), abs(_))).as("max_code"),
          md5(concat_ws(",", col("codes")).cast("binary")).as("codes_md5"),
          round(aggregate(
            zip_with(col("embedding"), col("codes"),
              // (d * d), not pow(d, 2): libm pow need not be the exact
              // IEEE product, and the two engines' pows disagree in the
              // last ulp — enough to flip a 9 dp rounding
              (e, cd) => (e.cast("double") - cd * col("scale_raw"))
                * (e.cast("double") - cd * col("scale_raw"))),
            lit(0.0), (acc, x) => acc + x) / Dim, 9).as("mse"))
        .orderBy("vec_id")
    },

    // per-label mean embeddings — the class-prototype table (nearest-
    // centroid classification, per-class drift monitoring, embedding-
    // space dataset cards). A grouped VECTOR reduce: posexplode to
    // (label, idx, x), then per-(label, idx) sums of INTEGER
    // micro-units — floor(x*1e6 + 0.5), the quantized() tie rule, NOT
    // round() (engines' round() tie rules differ exactly on the
    // dyadic float32 values embeddings are full of) — so the sum is
    // both aggregation-order-independent and tie-rule-exact; the mean
    // divides in a fixed double-op order. 100 TB: one shuffle on the
    // (label, idx) composite key with map-side partial sums; output
    // is |labels| x dim rows regardless of corpus size.
    Q("label_centroids",
      """WITH e AS (SELECT label, unnest(embedding) AS x,
        |    generate_subscripts(embedding, 1) AS i FROM embeddings),
        |a AS (SELECT label, i,
        |    CAST(SUM(CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) AS sx,
        |    COUNT(*) AS n FROM e GROUP BY label, i)
        |SELECT label, CAST(i - 1 AS INT) AS idx,
        |  round(sx / n / 1000000.0, 6) AS component, n
        |FROM a ORDER BY label, idx""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding")))
        .withColumnRenamed("pos", "idx").withColumnRenamed("col", "x")
        .groupBy("label", "idx")
        .agg(
          sum(floor(col("x").cast("double") * 1000000.0 + 0.5).cast("long"))
            .cast("double").as("sx"),
          count(lit(1)).as("n"))
        .select(col("label"), col("idx"),
          round(col("sx") / col("n") / 1000000.0, 6).as("component"), col("n"))
        .orderBy("label", "idx")
    },

    // ANN over the QUANTIZED store — the production use of
    // embed_quantize: top-k by cosine of the int8 code vectors. The
    // per-vector scales cancel in the cosine (codes*s_q · codes*s_n /
    // norms), so the probe is pure integer dot products — 4x less
    // memory bandwidth than float32, the reason quantized stores probe
    // faster at 100 TB. Products stay exact in int64 (64·127² ≈ 10^6)
    // and cast to double per term, so both engines fold identical
    // values. Same broadcast-query/stream-corpus shape as
    // ann_bruteforce; PipelineShapesSpec pins recall@10 against the
    // float32 exact baseline.
    Q("ann_quantized",
      s"""WITH $duckQuantizeCtes,
         |q AS (SELECT vec_id AS q_id, codes AS qc FROM c WHERE vec_id < 5),
         |p AS (SELECT q_id, c.vec_id AS n_id,
         |    round(
         |      list_sum(list_transform(generate_series(1, $Dim), i -> CAST(qc[i] * codes[i] AS DOUBLE)))
         |      / (sqrt(list_sum(list_transform(generate_series(1, $Dim), i -> CAST(qc[i] * qc[i] AS DOUBLE))))
         |       * sqrt(list_sum(list_transform(generate_series(1, $Dim), i -> CAST(codes[i] * codes[i] AS DOUBLE))))), 6) AS qcos
         |  FROM q JOIN c ON c.vec_id <> q.q_id),
         |r AS (SELECT q_id, n_id, qcos, row_number() OVER (
         |        PARTITION BY q_id ORDER BY qcos DESC, n_id) AS rnk FROM p)
         |SELECT q_id, rnk, n_id, qcos FROM r WHERE rnk <= $TopK
         |ORDER BY q_id, rnk""".stripMargin) { (s, dir) =>
      val c = quantized(s, dir).select("vec_id", "codes")
      def idot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        aggregate(zip_with(a, b, (x, y) => (x * y).cast("double")),
          lit(0.0), (acc, v) => acc + v)
      val qs = c.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("codes").as("qc"))
      val n = c.select(col("vec_id").as("n_id"), col("codes").as("nc"))
      val qcos = round(idot(col("qc"), col("nc"))
        / (sqrt(idot(col("qc"), col("qc"))) * sqrt(idot(col("nc"), col("nc")))), 6)
      val w = Window.partitionBy(col("q_id")).orderBy(col("qcos").desc, col("n_id"))
      n.join(broadcast(qs), col("n_id") =!= col("q_id"))
        .select(col("q_id"), col("n_id"), qcos.as("qcos"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= TopK)
        .select("q_id", "rnk", "n_id", "qcos")
        .orderBy("q_id", "rnk")
    },

    // Product-quantization ANN with exact re-rank — the memory rung
    // below int8 scalar quantization: Dim splits into PqM subvectors,
    // each subspace gets its own PqK-entry k-means codebook
    // (kmeansTrainFrom per slice, 2 Lloyd steps from a per-subspace
    // md5 init), and a corpus vector compresses to PqM 4-bit codes
    // (8-bit at production scale — 64 float32 dims become 8 bytes).
    // The probe is the standard two-stage ADC scan: (1) the
    // full-precision query precomputes a LUT of its rounded dot with
    // every codebook entry (PqM*PqK values, broadcast with the query)
    // and each corpus vector's estimated dot is just PqM table
    // lookups summed — no float math against the corpus at all, so
    // codes stream through executors at 32x less memory bandwidth
    // than float32; (2) the PqShortlist best candidates per query are
    // re-ranked by EXACT cosine (touching only Shortlist full vectors
    // per query — the IVFADC+rerank shape every production ANN system
    // uses, because the ADC estimate alone cannot separate top-5
    // margins; measured recall@5 0.87 vs 0.09 without re-rank on the
    // near-random fixture vectors). Cross-engine exactness: LUT
    // entries are 6-dp rounds (index-ordered folds, float cast to
    // double before multiply), the PqM-term score sums as
    // DECIMAL(18,6) — order-independent — and the shortlist tie-rule
    // is (approx_dot DESC, n_id). PipelineShapesSpec pins the recall
    // floor against the exact baseline.
    Q("ann_pq",
      s"""WITH $duckPqCtes,
         |allc AS (${(0 until PqM).map(m => s"SELECT * FROM contrib_$m").mkString(" UNION ALL ")}),
         |scores AS (SELECT q_id, n_id,
         |    CAST(SUM(CAST(sim AS DECIMAL(18,6))) AS DOUBLE) AS approx_dot
         |  FROM allc GROUP BY q_id, n_id),
         |short AS (SELECT q_id, n_id FROM (SELECT q_id, n_id, row_number() OVER (
         |        PARTITION BY q_id ORDER BY approx_dot DESC, n_id) AS srn FROM scores)
         |      WHERE srn <= $PqShortlist),
         |x AS (SELECT short.q_id, short.n_id,
         |    round(${duckDot("qv", "nv")} /
         |      (sqrt(${duckDot("qv", "qv")}) * sqrt(${duckDot("nv", "nv")})), 6) AS cos_sim
         |  FROM short JOIN embeddings qv ON qv.vec_id = short.q_id
         |  JOIN embeddings nv ON nv.vec_id = short.n_id),
         |r AS (SELECT q_id, n_id, cos_sim, row_number() OVER (
         |        PARTITION BY q_id ORDER BY cos_sim DESC, n_id) AS rnk FROM x)
         |SELECT q_id, rnk, n_id, cos_sim FROM r WHERE rnk <= 5
         |ORDER BY q_id, rnk""".stripMargin) { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      // train all PqM codebooks together: 2 pqStep jobs total (not
      // PqM*2 per-slice jobs — same math, pinned by KMeansSpec); at
      // 100 TB training runs on a sample — the codebooks are
      // PqM*PqK*PqSub scalars regardless of corpus size
      var cbs: IndexedSeq[Array[Array[Double]]] =
        (0 until PqM).map(m => Similarity.pqInitCoefs(m, PqK, PqSub))
      cbs = Similarity.pqStep(emb, "embedding", cbs, PqSub)
      cbs = Similarity.pqStep(emb, "embedding", cbs, PqSub)
      // encoded corpus: PqM codes per vector (native CentroidAssign —
      // one codegen reference object per subspace, no janino blowup)
      val codeCols = (0 until PqM).map(m =>
        graft.functions.CentroidAssign(
          slice(col("embedding"), m * PqSub + 1, PqSub), cbs(m)).as(s"code_$m"))
      val n = emb.repartition(s.sparkContext.defaultParallelism, col("vec_id"))
        .select(col("vec_id").as("n_id") +: codeCols: _*)
      // query LUT: rounded subspace dots against every codebook entry,
      // flattened to one array so the probe is pure element_at lookups.
      // Native PqLut: the codebooks ride as ONE codegen reference
      // object instead of an M*K*subDim-term unrolled tree (see the
      // expression's scaladoc for the plan-size argument).
      val q = emb.filter(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"),
          graft.functions.PqLut(col("embedding"), cbs.toArray).as("luts"))
      val score = (0 until PqM).map(m =>
          element_at(col("luts"), lit(m * PqK + 1) + col(s"code_$m"))
            .cast(org.apache.spark.sql.types.DecimalType(18, 6)))
        .reduceLeft(_ + _).cast("double")
      val ws = Window.partitionBy(col("q_id"))
        .orderBy(col("approx_dot").desc, col("n_id"))
      val short = n.join(broadcast(q), col("n_id") =!= col("q_id"))
        .select(col("q_id"), col("n_id"), score.as("approx_dot"))
        .withColumn("srn", row_number().over(ws))
        .filter(col("srn") <= PqShortlist)
        .select("q_id", "n_id")
      // exact re-rank over the shortlist only: Shortlist vectors per
      // query, fetched by two broadcast-able id joins
      val qv = emb.select(col("vec_id").as("q_id"), col("embedding").as("qe"))
      val nv = emb.select(col("vec_id").as("n_id"), col("embedding").as("ne"))
      val wr = Window.partitionBy(col("q_id"))
        .orderBy(col("cos_sim").desc, col("n_id"))
      short.join(qv, "q_id").join(nv, "n_id")
        .select(col("q_id"), col("n_id"),
          Similarity.cosine(col("qe"), col("ne")).as("cos_sim"))
        .withColumn("rnk", row_number().over(wr))
        .filter(col("rnk") <= 5)
        .select("q_id", "rnk", "n_id", "cos_sim")
        .orderBy("q_id", "rnk")
    },

    // IVF + PQ — the two previous rungs COMPOSED, which is the actual
    // production index layout (FAISS's IVFADC): the coarse quantizer
    // partitions the corpus into inverted lists (table PARTITIONED BY
    // cl at cluster scale), the PQ codes make each list 32x smaller
    // than float32, and a probe touches nprobe lists' codes plus
    // Shortlist full vectors. ann_ivf proves the pruning, ann_pq
    // proves the compression; this query proves they compose: the ADC
    // scan runs only over the probed lists' candidates, so the probe
    // cost is (corpus/K * nprobe) LUT lookups instead of ann_pq's
    // full-corpus scan — at 100 TB with K=65k lists and nprobe=64,
    // ~0.1% of the codes are touched. Same cross-engine discipline as
    // the parents: coarse assignment is the rounded-dot argmax CASE,
    // ADC scores sum as DECIMAL(18,6), shortlist ties (approx_dot
    // DESC, n_id), exact-cosine re-rank ties (cos_sim DESC, n_id).
    Q("ann_ivf_pq", {
      val coefs = Similarity.centroidCoefs(Centroids, Dim)
      def duckArr(c: Array[Double]) =
        c.map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ",", "]")
      val ds = coefs.zipWithIndex.map { case (cen, c) =>
        s"round(list_sum(list_transform(generate_series(1, $Dim), i -> CAST(embeddings.embedding[i] AS DOUBLE) * (${duckArr(cen)})[i])), 6) AS d_$c"
      }.mkString(",\n    ")
      val assign = (0 until Centroids - 1).map { c =>
        val rest = (c + 1 until Centroids).map(o => s"d_$c >= d_$o").mkString(" AND ")
        s"WHEN $rest THEN $c"
      }.mkString(" ")
      val structs = (0 until Centroids)
        .map(c => s"struct_pack(c := $c, s := d_$c)").mkString(", ")
      s"""WITH $duckPqCtes,
         |ivfe AS (SELECT vec_id, $ds,
         |    CASE $assign ELSE ${Centroids - 1} END AS cl
         |  FROM embeddings),
         |ivfq AS (SELECT vec_id, unnest([$structs]) AS cs
         |       FROM ivfe WHERE vec_id < 20),
         |ivfp AS (SELECT vec_id AS q_id, cs.c AS cl,
         |         row_number() OVER (PARTITION BY vec_id
         |           ORDER BY cs.s DESC, cs.c) AS crn
         |       FROM ivfq),
         |cand AS (SELECT p.q_id, n.vec_id AS n_id
         |  FROM (SELECT * FROM ivfp WHERE crn <= $Nprobe) p
         |  JOIN ivfe n ON n.cl = p.cl AND n.vec_id <> p.q_id),
         |allc AS (${(0 until PqM).map(m => s"SELECT * FROM contrib_$m").mkString(" UNION ALL ")}),
         |scores AS (SELECT q_id, n_id,
         |    CAST(SUM(CAST(sim AS DECIMAL(18,6))) AS DOUBLE) AS approx_dot
         |  FROM allc JOIN cand USING (q_id, n_id) GROUP BY q_id, n_id),
         |short AS (SELECT q_id, n_id FROM (SELECT q_id, n_id, row_number() OVER (
         |        PARTITION BY q_id ORDER BY approx_dot DESC, n_id) AS srn FROM scores)
         |      WHERE srn <= $PqShortlist),
         |x AS (SELECT short.q_id, short.n_id,
         |    round(${duckDot("qv", "nv")} /
         |      (sqrt(${duckDot("qv", "qv")}) * sqrt(${duckDot("nv", "nv")})), 6) AS cos_sim
         |  FROM short JOIN embeddings qv ON qv.vec_id = short.q_id
         |  JOIN embeddings nv ON nv.vec_id = short.n_id),
         |r AS (SELECT q_id, n_id, cos_sim, row_number() OVER (
         |        PARTITION BY q_id ORDER BY cos_sim DESC, n_id) AS rnk FROM x)
         |SELECT q_id, rnk, n_id, cos_sim FROM r WHERE rnk <= 5
         |ORDER BY q_id, rnk""".stripMargin
    }) { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      // PQ codebooks: same 2 batched pqStep jobs as ann_pq
      var cbs: IndexedSeq[Array[Array[Double]]] =
        (0 until PqM).map(m => Similarity.pqInitCoefs(m, PqK, PqSub))
      cbs = Similarity.pqStep(emb, "embedding", cbs, PqSub)
      cbs = Similarity.pqStep(emb, "embedding", cbs, PqSub)
      // corpus side: coarse list id + PQ codes — 9 small ints per
      // vector; at cluster scale this frame is the stored index
      // (PARTITIONED BY cl), built once, probed forever
      val coefs = Similarity.centroidCoefs(Centroids, Dim)
      val codeCols = (0 until PqM).map(m =>
        graft.functions.CentroidAssign(
          slice(col("embedding"), m * PqSub + 1, PqSub), cbs(m)).as(s"code_$m"))
      val n = emb.repartition(s.sparkContext.defaultParallelism, col("vec_id"))
        .select(Seq(col("vec_id").as("n_id"),
          graft.functions.CentroidAssign(col("embedding"), coefs).as("cl")) ++
          codeCols: _*)
      // query side: nprobe coarse lists (unrolled literal sims, the
      // ann_ivf_trained construction) + the flattened ADC LUT riding
      // on the probe rows (2 rows x PqM*PqK doubles per query)
      val sims = coefs.toIndexedSeq.map(cen =>
        round(Similarity.dotLit(col("embedding"), cen), 6))
      val probes = emb.filter(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"),
          graft.functions.PqLut(col("embedding"), cbs.toArray).as("luts"),
          explode(array((0 until Centroids).map(c =>
            struct(lit(c).as("c"), sims(c).as("s"))): _*)).as("cs"))
        .withColumn("crn", row_number().over(Window.partitionBy("q_id")
          .orderBy(col("cs.s").desc, col("cs.c"))))
        .filter(col("crn") <= Nprobe)
        .select(col("q_id"), col("luts"), col("cs.c").as("cl"))
      // ADC scan over the probed lists only: corpus codes stream, the
      // probe list broadcasts, each candidate costs PqM lookups
      val score = (0 until PqM).map(m =>
          element_at(col("luts"), lit(m * PqK + 1) + col(s"code_$m"))
            .cast(org.apache.spark.sql.types.DecimalType(18, 6)))
        .reduceLeft(_ + _).cast("double")
      val ws = Window.partitionBy(col("q_id"))
        .orderBy(col("approx_dot").desc, col("n_id"))
      val short = n.join(broadcast(probes), Seq("cl"))
        .filter(col("n_id") =!= col("q_id"))
        .select(col("q_id"), col("n_id"), score.as("approx_dot"))
        .withColumn("srn", row_number().over(ws))
        .filter(col("srn") <= PqShortlist)
        .select("q_id", "n_id")
      val qv = emb.select(col("vec_id").as("q_id"), col("embedding").as("qe"))
      val nv = emb.select(col("vec_id").as("n_id"), col("embedding").as("ne"))
      val wr = Window.partitionBy(col("q_id"))
        .orderBy(col("cos_sim").desc, col("n_id"))
      short.join(qv, "q_id").join(nv, "n_id")
        .select(col("q_id"), col("n_id"),
          Similarity.cosine(col("qe"), col("ne")).as("cos_sim"))
        .withColumn("rnk", row_number().over(wr))
        .filter(col("rnk") <= 5)
        .select("q_id", "rnk", "n_id", "cos_sim")
        .orderBy("q_id", "rnk")
    },

    // Simplified (centroid-based) silhouette — the clustering-QA
    // companion to cluster_purity: per vector, a = cosine distance to
    // the ASSIGNED centroid, b = min distance to any OTHER centroid,
    // s = (b - a) / max(a, b) ∈ [-1, 1]; per-cluster mean silhouette
    // says how separated that cluster is (the medoid-free variant —
    // full silhouette's pairwise a/b is quadratic; the centroid form
    // is the one production clustering audits run at scale). Shape:
    // cosines to K centroids are per-row column math riding the scan;
    // the only exchange carries (cl, s_u) pairs into a K-row
    // aggregate. Cross-engine: cosines round to 6 dp, s derives from
    // those identical doubles in one fixed op order, then quantizes
    // to 1e-6 integer units so the per-cluster SUM is exact. The own-
    // cluster term is excluded from b with a 9.9 sentinel (cosine
    // distance caps at 2.0), never engine-specific NULL-skipping. ±1
    // centroids all have norm sqrt(Dim) = 8 exactly.
    Q("cluster_silhouette", {
      val coefs = Similarity.centroidCoefs(Centroids, Dim)
      val ds = coefs.zipWithIndex.map { case (cen, c) =>
        val arr = cen.map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ",", "]")
        s"round(list_sum(list_transform(generate_series(1, $Dim), i -> CAST(embedding[i] AS DOUBLE) * ($arr)[i])), 6) AS d_$c"
      }.mkString(",\n    ")
      val assign = (0 until Centroids - 1).map { c =>
        val rest = (c + 1 until Centroids).map(o => s"d_$c >= d_$o").mkString(" AND ")
        s"WHEN $rest THEN $c"
      }.mkString(" ")
      val cs = coefs.zipWithIndex.map { case (cen, c) =>
        val arr = cen.map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ",", "]")
        s"round(list_sum(list_transform(generate_series(1, $Dim), i -> CAST(embedding[i] AS DOUBLE) * ($arr)[i])) / (sqrt(list_sum(list_transform(generate_series(1, $Dim), i -> CAST(embedding[i] AS DOUBLE) * embedding[i]))) * 8.0), 6) AS c_$c"
      }.mkString(",\n    ")
      val bTerms = (0 until Centroids)
        .map(c => s"CASE WHEN cl = $c THEN 9.9 ELSE 1.0 - c_$c END")
        .mkString(", ")
      s"""WITH e0 AS (SELECT vec_id, embedding, $ds, $cs FROM embeddings),
         |e AS (SELECT vec_id, CASE $assign ELSE ${Centroids - 1} END AS cl,
         |    ${(0 until Centroids).map(c => s"c_$c").mkString(", ")} FROM e0),
         |ab AS (SELECT vec_id, cl,
         |    1.0 - (CASE ${(0 until Centroids).map(c => s"WHEN cl = $c THEN c_$c").mkString(" ")} END) AS a,
         |    least($bTerms) AS b FROM e),
         |s AS (SELECT cl, CASE WHEN greatest(a, b) = 0 THEN CAST(0 AS BIGINT)
         |        ELSE CAST(floor((b - a) / greatest(a, b) * 1e6 + 0.5) AS BIGINT) END AS s_u
         |      FROM ab)
         |SELECT cl, COUNT(*) AS n, CAST(SUM(s_u) AS BIGINT) AS sil_u,
         |  SUM(s_u) / COUNT(*) / 1000000.0 AS avg_sil
         |FROM s GROUP BY cl ORDER BY cl""".stripMargin
    }) { (s, dir) =>
      val coefs = Similarity.centroidCoefs(Centroids, Dim)
      val cosC = coefs.toIndexedSeq.map(cen =>
        round(Similarity.dotLit(col("embedding"), cen)
          / (Similarity.normUnrolled(col("embedding"), Dim) * 8.0), 6))
      val e = Tables.parallelize(Tables.load(s, dir, "embeddings"))
        .select(col("vec_id"),
          graft.functions.CentroidAssign(col("embedding"), coefs).as("cl"),
          array(cosC: _*).as("cs"))
      val a = lit(1.0) - element_at(col("cs"), col("cl") + 1)
      val bTerms = (0 until Centroids).map(c =>
        when(col("cl") === c, lit(9.9))
          .otherwise(lit(1.0) - element_at(col("cs"), lit(c + 1))))
      val b = least(bTerms: _*)
      val sU = when(greatest(col("a"), col("b")) === 0, lit(0L))
        .otherwise(floor((col("b") - col("a")) / greatest(col("a"), col("b"))
          * 1e6 + 0.5).cast("long"))
      e.select(col("cl"), a.as("a"), b.as("b"))
        .select(col("cl"), sU.as("s_u"))
        .groupBy("cl")
        .agg(count(lit(1)).as("n"), sum(col("s_u")).as("sil_u"))
        .select(col("cl"), col("n"), col("sil_u"),
          (col("sil_u") / col("n") / lit(1000000.0)).as("avg_sil"))
        .orderBy("cl")
    },

    // MAXIMAL MARGINAL RELEVANCE re-ranking (Carbonell & Goldstein,
    // SIGIR '98) — the diversity pass between ANN retrieval and
    // downstream use: greedily pick k results maximizing
    // λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s), so near-duplicate
    // hits don't crowd the result list. Greedy selection is
    // inherently sequential, but k is a small constant (3 here), so
    // the recurrence UNROLLS into k dataflow argmax steps — no driver
    // loop, identical plans at any corpus size. All scores are exact
    // integers (cosines round to 6 dp then scale to 1e-6 units;
    // λ=0.7 becomes score = 7·rel_u − 3·sim_u), so every argmax is
    // engine- and order-deterministic with the (score DESC, id) tie
    // rule. Scale shape: the QxN retrieval streams the corpus against
    // broadcast queries (ann_bruteforce's shape); everything after
    // operates on the |queries|×CandK shortlist, which is
    // MATERIALIZED (localCheckpoint — the production analog is the
    // retrieval output table) so the k unrolled steps reuse it
    // instead of re-scanning the corpus per step.
    Q("mmr_rerank", {
      val ck = MmrCandK
      s"""WITH q AS (SELECT vec_id AS q_id, embedding FROM embeddings WHERE vec_id < 5),
         |n AS (SELECT vec_id AS c_id, embedding FROM embeddings WHERE vec_id >= 5),
         |rel AS (SELECT q_id, c_id,
         |    CAST(floor(round(${duckDot("q", "n")} /
         |      (sqrt(${duckDot("q", "q")}) * sqrt(${duckDot("n", "n")})), 6) * 1e6 + 0.5) AS BIGINT) AS rel_u
         |  FROM q JOIN n ON true),
         |cand AS (SELECT q_id, c_id, rel_u, row_number() OVER (
         |    PARTITION BY q_id ORDER BY rel_u DESC, c_id) AS rnk FROM rel
         |  QUALIFY rnk <= $ck),
         |ps AS (SELECT x.q_id, x.c_id AS a_id, y.c_id AS b_id,
         |    CAST(floor(round(${duckDot("ea", "eb")} /
         |      (sqrt(${duckDot("ea", "ea")}) * sqrt(${duckDot("eb", "eb")})), 6) * 1e6 + 0.5) AS BIGINT) AS sim_u
         |  FROM cand x JOIN cand y ON x.q_id = y.q_id AND x.c_id <> y.c_id
         |  JOIN embeddings ea ON ea.vec_id = x.c_id
         |  JOIN embeddings eb ON eb.vec_id = y.c_id),
         |s1 AS (SELECT q_id, c_id AS s1_id, rel_u AS r1 FROM cand WHERE rnk = 1),
         |t2 AS (SELECT c.q_id, c.c_id, 7 * c.rel_u - 3 * ps.sim_u AS sc
         |  FROM cand c JOIN s1 USING (q_id)
         |  JOIN ps ON ps.q_id = c.q_id AND ps.a_id = c.c_id AND ps.b_id = s1_id
         |  WHERE c.c_id <> s1_id),
         |s2 AS (SELECT q_id, c_id AS s2_id, sc AS sc2 FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sc DESC, c_id) AS rn
         |  FROM t2) WHERE rn = 1),
         |t3 AS (SELECT c.q_id, c.c_id,
         |    7 * c.rel_u - 3 * GREATEST(p1.sim_u, p2.sim_u) AS sc
         |  FROM cand c JOIN s1 USING (q_id) JOIN s2 USING (q_id)
         |  JOIN ps p1 ON p1.q_id = c.q_id AND p1.a_id = c.c_id AND p1.b_id = s1_id
         |  JOIN ps p2 ON p2.q_id = c.q_id AND p2.a_id = c.c_id AND p2.b_id = s2_id
         |  WHERE c.c_id <> s1_id AND c.c_id <> s2_id),
         |s3 AS (SELECT q_id, c_id AS s3_id, sc AS sc3 FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sc DESC, c_id) AS rn
         |  FROM t3) WHERE rn = 1)
         |SELECT q_id, mmr_rank, vec_id, score_u FROM (
         |  SELECT q_id, 1 AS mmr_rank, s1_id AS vec_id, CAST(7 * r1 AS BIGINT) AS score_u FROM s1
         |  UNION ALL SELECT q_id, 2, s2_id, CAST(sc2 AS BIGINT) FROM s2
         |  UNION ALL SELECT q_id, 3, s3_id, CAST(sc3 AS BIGINT) FROM s3)
         |ORDER BY q_id, mmr_rank""".stripMargin
    }) { (s, dir) =>
      val e = Tables.load(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
      val n = e.filter(col("vec_id") >= 5)
        .repartition(s.sparkContext.defaultParallelism, col("vec_id"))
        .select(col("vec_id").as("c_id"), col("embedding").as("ce"))
      def u(c: org.apache.spark.sql.Column) =
        floor(round(c, 6) * 1e6 + 0.5).cast("long")
      val wRel = Window.partitionBy(col("q_id"))
        .orderBy(col("rel_u").desc, col("c_id"))
      // retrieval: corpus streams against broadcast queries; the
      // shortlist (|q| x CandK rows, with embeddings) materializes so
      // the unrolled steps below never touch the corpus again
      val cand = n.crossJoin(broadcast(q))
        .select(col("q_id"), col("c_id"), col("ce"),
          u(Similarity.cosine(col("qe"), col("ce"))).as("rel_u"))
        .withColumn("rnk", row_number().over(wRel))
        .filter(col("rnk") <= MmrCandK)
        .localCheckpoint(true)
      val ps = cand.select(col("q_id"), col("c_id").as("a_id"), col("ce").as("ea"))
        .join(broadcast(cand.select(col("q_id"), col("c_id").as("b_id"),
          col("ce").as("eb"))), Seq("q_id"))
        .filter(col("a_id") =!= col("b_id"))
        .select(col("q_id"), col("a_id"), col("b_id"),
          u(Similarity.cosine(col("ea"), col("eb"))).as("sim_u"))
      val s1 = cand.filter(col("rnk") === 1)
        .select(col("q_id"), col("c_id").as("s1_id"), col("rel_u").as("r1"))
      def argmax(t: org.apache.spark.sql.DataFrame) =
        t.withColumn("rn", row_number().over(
          Window.partitionBy(col("q_id")).orderBy(col("sc").desc, col("c_id"))))
          .filter(col("rn") === 1)
      // pair-sim lookup tables renamed per use site so every join key
      // resolves unambiguously (the same ps feeds both steps)
      val p1 = ps.select(col("q_id").as("pq1"), col("a_id").as("a1"),
        col("b_id").as("b1"), col("sim_u").as("sim1"))
      val p2 = ps.select(col("q_id").as("pq2"), col("a_id").as("a2"),
        col("b_id").as("b2"), col("sim_u").as("sim2"))
      val t2 = cand.join(broadcast(s1), Seq("q_id")).filter(col("c_id") =!= col("s1_id"))
        .join(broadcast(p1), col("q_id") === col("pq1") && col("a1") === col("c_id") &&
          col("b1") === col("s1_id"))
        .select(col("q_id"), col("c_id"),
          (lit(7) * col("rel_u") - lit(3) * col("sim1")).as("sc"))
      val s2 = argmax(t2).select(col("q_id"), col("c_id").as("s2_id"),
        col("sc").as("sc2"))
      val t3 = cand.join(broadcast(s1), Seq("q_id")).join(broadcast(s2), Seq("q_id"))
        .filter(col("c_id") =!= col("s1_id") && col("c_id") =!= col("s2_id"))
        .join(broadcast(p1), col("q_id") === col("pq1") && col("a1") === col("c_id") &&
          col("b1") === col("s1_id"))
        .join(broadcast(p2), col("q_id") === col("pq2") && col("a2") === col("c_id") &&
          col("b2") === col("s2_id"))
        .select(col("q_id"), col("c_id"),
          (lit(7) * col("rel_u") - lit(3) * greatest(col("sim1"), col("sim2")))
            .as("sc"))
      val s3 = argmax(t3).select(col("q_id"), col("c_id").as("s3_id"),
        col("sc").as("sc3"))
      s1.select(col("q_id"), lit(1).as("mmr_rank"), col("s1_id").as("vec_id"),
          (lit(7) * col("r1")).cast("long").as("score_u"))
        .union(s2.select(col("q_id"), lit(2).as("mmr_rank"),
          col("s2_id").as("vec_id"), col("sc2").cast("long").as("score_u")))
        .union(s3.select(col("q_id"), lit(3).as("mmr_rank"),
          col("s3_id").as("vec_id"), col("sc3").cast("long").as("score_u")))
        .orderBy("q_id", "mmr_rank")
    }
  )

  /** mmr_rerank shortlist size (candidates per query before the
    * greedy diversity selection).
    */
  val MmrCandK = 8
}
