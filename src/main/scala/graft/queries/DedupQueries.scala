package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.functions.PortableHash.{duckH32, h32}
import graft.ops.Dedup

/** Deduplication operators as oracle-checked queries (north-star set).
  * MinHash parameters: K=12 hashes, b=6 bands × r=2 rows — calibrated
  * on the corpus so candidate pairs are non-empty at sf0.001 (~34) and
  * bounded at sf0.1 (~1.2k).
  */
object DedupQueries {

  val K = 12
  val B = 6
  val R = 2

  /** dedup_containment: drop shingles appearing in more than this
    * many documents before pairing — corpus-wide boilerplate shingles
    * are not containment evidence and would be the hot-key quadratic
    * (the dup_spans MaxFpDocFreq pattern).
    */
  val MaxContDf = 50

  /** Embedding near-dup blocking: 8 IVF coarse centroids over the
    * 64-dim vectors (see `dedup_embedding` for why blocks must not
    * come from a data column).
    */
  val Dim = 64
  val DedupCentroids = 8

  /** vec_id, embedding (+ all input columns), cl = nearest-centroid id.
    * Native CentroidAssign, not the composed ivfAssign CASE chain: at
    * k=8 the chain duplicates each 64-term dot ~56x and the unrolled
    * codegen takes ~12 s to janino-compile (the HOF form instead pays
    * per-row lambda interpretation). The native loop is exact-equal by
    * KMeansSpec's parity test.
    */
  private[graft] def embeddingBlocks(
      df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import graft.ops.Similarity
    val coefs = Similarity.centroidCoefs(DedupCentroids, Dim)
    df.withColumn("cl", graft.functions.CentroidAssign(col("embedding"), coefs))
  }

  /** DuckDB twin of [[embeddingBlocks]]'s `cl`, split in two so the
    * 64-literal centroid dot products are named once (`d_0..d_{K-1}`
    * select list) and the argmax CASE references the names: the same
    * md5-derived ±1 centroids, the same rounded dot products, ties to
    * the lowest index.
    */
  private val duckCentroidSims: String = {
    import graft.ops.Similarity
    val coefs = Similarity.centroidCoefs(DedupCentroids, Dim)
    def duckArr(c: Array[Double]) =
      c.map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ",", "]")
    coefs.zipWithIndex.map { case (cen, c) =>
      s"round(list_sum(list_transform(generate_series(1, $Dim), i -> CAST(embedding[i] AS DOUBLE) * (${duckArr(cen)})[i])), 6) AS d_$c"
    }.mkString(",\n    ")
  }

  private val duckCentroidCase: String = {
    val assign = (0 until DedupCentroids - 1).map { c =>
      val rest = (c + 1 until DedupCentroids)
        .map(o => s"d_$c >= d_$o").mkString(" AND ")
      s"WHEN $rest THEN $c"
    }.mkString(" ")
    s"(CASE $assign ELSE ${DedupCentroids - 1} END)"
  }

  /** Shared shingle CTEs (word 3-grams, distinct per doc). */
  private val shingleCtes =
    """WITH arr AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
      |sh AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(a)-2),
      |        i -> a[i] || ' ' || a[i+1] || ' ' || a[i+2])) AS shingle FROM arr),
      |dsh AS (SELECT DISTINCT doc_id, shingle FROM sh)""".stripMargin

  private val minhashCte = {
    import graft.functions.PortableHash
    val mins = PortableHash.minhashPerms(K).zipWithIndex.map { case ((a, b), i) =>
      s"min(${PortableHash.duckPermute("hm", a, b)}) AS m$i"
    }.mkString(", ")
    s"""$shingleCtes,
       |hs AS (SELECT doc_id, ${duckH32("shingle")} % ${PortableHash.MersennePrime31} AS hm FROM dsh),
       |mh AS (SELECT doc_id, $mins FROM hs GROUP BY doc_id)""".stripMargin
  }

  /** SQL twin of [[Dedup.bandKeys]] (generated over B and R, never
    * hand-expanded — one definition serves every banded query).
    */
  private val bandsCte = {
    val keys = (0 until B).map { b =>
      (s"'$b'" +: (0 until R).map(j => s"m${b * R + j}")).mkString(" || ',' || ")
    }
    s"bands AS (SELECT doc_id, unnest([${keys.mkString(", ")}]) AS band FROM mh)"
  }

  /** Bucket-tagged band keys over the whole documents table — the
    * incremental-dedup pipeline BEFORE its localCheckpoint, exposed
    * separately because the checkpoint hides everything upstream
    * behind a Scan ExistingRDD boundary: PlanShapeSpec asserts the
    * no-single-partition property on THIS frame, the query
    * materializes it.
    */
  private[graft] def incrementalBands(
      s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    val docs = Tables.load(s, dir, "documents").select("doc_id", "text")
    Dedup.bandKeys(
      Dedup.minhashFromText(docs, "doc_id", "text", K), "doc_id", B, R)
      .withColumn("bucket", h32(col("doc_id").cast("string")) % 100)
  }

  /** Deterministic 3-round synchronous label propagation over a
    * symmetric edge list (a, b): majority over the neighbors' labels
    * PLUS the node's own current label (the standard self-vote that
    * damps the two-node oscillation synchronous LPA is infamous for
    * — without it a pair swaps labels every round and never merges),
    * ties to the smallest label. Shared by lpa_communities and
    * graph_modularity so the propagation rule cannot drift between
    * them. Returns (node, lbl) for every node with at least one edge.
    */
  private[graft] def lpaLabels(edges: org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val majority = Window.partitionBy("node")
      .orderBy(col("c").desc, col("lbl"))
    var l = edges.select(col("a").as("node")).distinct()
      .select(col("node"), col("node").as("lbl"))
    for (_ <- 1 to 3) {
      l = edges.join(l, edges("b") === l("node"))
        .select(edges("a").as("node"), col("lbl"))
        .unionAll(l) // the self-vote
        .groupBy("node", "lbl")
        .agg(count(lit(1)).as("c"))
        .withColumn("rn", row_number().over(majority))
        .filter(col("rn") === 1)
        .select(col("node"), col("lbl"))
    }
    l
  }

  /** SQL twin of [[lpaLabels]]: CTEs l0..l3 over an `edges(a, b)` CTE
    * (same generated rounds as lpa_communities' oracle).
    */
  private val lpaCtes: String = {
    val rounds = (1 to 3).map { k =>
      s"""v$k AS (SELECT node, lbl, COUNT(*) AS c FROM (
         |        SELECT e.a AS node, l.lbl FROM edges e JOIN l${k - 1} l ON e.b = l.node
         |        UNION ALL SELECT node, lbl FROM l${k - 1}) GROUP BY 1, 2),
         |l$k AS (SELECT node, lbl FROM (SELECT node, lbl, row_number() OVER (
         |          PARTITION BY node ORDER BY c DESC, lbl) AS rn FROM v$k) WHERE rn = 1)"""
        .stripMargin
    }.mkString(",\n")
    s"""l0 AS (SELECT DISTINCT a AS node, a AS lbl FROM edges),
       |$rounds""".stripMargin
  }

  def all: Seq[Q] = Seq(

    // exact dedup: group on md5(text) (16-byte shuffle key, not the body)
    Q("dedup_exact",
      """SELECT min(doc_id) AS doc_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .groupBy(md5(col("text")))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
        .select("doc_id", "n_copies")
        .orderBy("doc_id")
    },

    // MinHash signatures (K portable min-hashes over the shingle set)
    Q("dedup_minhash_sig",
      s"""$minhashCte
         |SELECT doc_id, ${(0 until K).map("m" + _).mkString(", ")}
         |FROM mh ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // no distinct: min is duplicate-invariant (see minhashFromText)
      Dedup.minhashFromText(Tables.load(s, dir, "documents"), "doc_id", "text", K)
        .orderBy("doc_id")
    },

    // MinHash + LSH banding: candidate duplicate pairs
    Q("dedup_minhash",
      s"""$minhashCte,
         |$bandsCte
         |SELECT DISTINCT x.doc_id AS doc_id_1, y.doc_id AS doc_id_2
         |FROM bands x JOIN bands y ON x.band = y.band AND x.doc_id < y.doc_id
         |ORDER BY doc_id_1, doc_id_2""".stripMargin) { (s, dir) =>
      val sig = Dedup.minhashFromText(Tables.load(s, dir, "documents"), "doc_id", "text", K)
      val bands = Dedup.bandKeys(sig, "doc_id", B, R)
      Dedup.candidatePairs(bands, "doc_id")
        .select(col("id_a").as("doc_id_1"), col("id_b").as("doc_id_2"))
        .orderBy("doc_id_1", "doc_id_2")
    },

    // signature CALIBRATION — the audit that tells you whether K=12
    // minhashes are enough for this corpus: per banding candidate
    // pair, the signature's Jaccard estimate (fraction of agreeing
    // components — the unbiased minhash estimator) against the exact
    // Jaccard of the shingle-hash sets, with the absolute error. A
    // drifting error distribution is the signal to re-tune K/b/r
    // before dedup quality silently degrades. One shingling pass
    // feeds BOTH statistics through a single aggregation (the K
    // min-permutes and the sorted hash-set array per doc); the pair
    // decoration is the PrefixJaccard verify shape — shuffle-hash
    // joins with the (banding-bounded) candidate side as build, the
    // per-doc feature table streams, nothing corpus-sized broadcasts.
    Q("minhash_calibration", {
      val estTerms = (0 until K)
        .map(i => s"(CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""$minhashCte,
         |$bandsCte,
         |pairs AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
         |          FROM bands x JOIN bands y ON x.band = y.band AND x.doc_id < y.doc_id),
         |hset AS (SELECT DISTINCT doc_id, hm FROM hs),
         |hsz AS (SELECT doc_id, COUNT(*) AS n FROM hset GROUP BY doc_id),
         |i AS (SELECT x.doc_id AS d1, y.doc_id AS d2, COUNT(*) AS inter
         |      FROM hset x JOIN hset y ON x.hm = y.hm AND x.doc_id < y.doc_id
         |      GROUP BY 1, 2),
         |c AS (SELECT p.d1 AS doc_id_1, p.d2 AS doc_id_2,
         |    round(($estTerms) / $K.0, 6) AS est_jaccard,
         |    round(COALESCE(i.inter, 0) * 1.0
         |      / (x.n + y.n - COALESCE(i.inter, 0)), 6) AS jaccard
         |  FROM pairs p JOIN mh a ON a.doc_id = p.d1 JOIN mh b ON b.doc_id = p.d2
         |  JOIN hsz x ON x.doc_id = p.d1 JOIN hsz y ON y.doc_id = p.d2
         |  LEFT JOIN i ON i.d1 = p.d1 AND i.d2 = p.d2)
         |SELECT doc_id_1, doc_id_2, est_jaccard, jaccard,
         |  round(abs(est_jaccard - jaccard), 6) AS abs_err
         |FROM c ORDER BY doc_id_1, doc_id_2""".stripMargin
    }) { (s, dir) =>
      import graft.functions.PortableHash
      val dsh = Dedup.distinctShingles(
          Tables.load(s, dir, "documents").select("doc_id", "text"),
          "doc_id", "text")
        .select(col("doc_id"),
          (h32(col("shingle")) % PortableHash.MersennePrime31).as("hm"))
      val mins = PortableHash.minhashPerms(K).zipWithIndex.map {
        case ((a, b), i) => min(PortableHash.permute(col("hm"), a, b)).as(s"m$i")
      }
      // ONE aggregation builds the whole per-doc feature row:
      // signature components + the sorted distinct hash set + its size
      val feat = dsh.groupBy("doc_id")
        .agg(mins.head, (mins.tail :+
          sort_array(collect_set(col("hm"))).as("toks")): _*)
        .withColumn("n", size(col("toks")))
        .localCheckpoint(false)
      val pairs = Dedup.candidatePairs(
        Dedup.bandKeys(feat.select(col("doc_id") +:
          (0 until K).map(i => col(s"m$i")): _*), "doc_id", B, R), "doc_id")
      val est = (0 until K)
        .map(i => when(col(s"a.m$i") === col(s"b.m$i"), 1).otherwise(0))
        .reduceLeft(_ + _) / lit(K.toDouble)
      val inter = size(array_intersect(col("a.toks"), col("b.toks")))
      pairs.hint("shuffle_hash")
        .join(feat.as("a"), col("id_a") === col("a.doc_id"))
        .hint("shuffle_hash")
        .join(feat.as("b"), col("id_b") === col("b.doc_id"))
        .select(col("id_a").as("doc_id_1"), col("id_b").as("doc_id_2"),
          round(est, 6).as("est_jaccard"),
          round(inter * lit(1.0) / (col("a.n") + col("b.n") - inter), 6)
            .as("jaccard"))
        .withColumn("abs_err", round(abs(col("est_jaccard") - col("jaccard")), 6))
        .orderBy("doc_id_1", "doc_id_2")
    },

    // BANDING RECALL AUDIT — the missing half of minhash evaluation:
    // minhash_calibration measures estimator ACCURACY on pairs the
    // banding already surfaced; this measures what banding MISSES.
    // Ground truth = exact shingle-Jaccard over the SHARED-SHINGLE
    // pair frame (a pair with no shared shingle has j = 0, so the
    // frame is complete for any threshold > 0; it is bounded by
    // shingle document-frequency — the minhash_calibration exact
    // side, and at true 100 TB the production variant adds a
    // deterministic doc slice on top, trading audit coverage for
    // cost). For every true pair (j >= 0.5) it checks membership in
    // the banded candidates and reports measured recall NEXT TO the
    // S-curve prediction avg(1 − (1 − j^r)^b) — the number the b/r
    // choice was designed to (Leskovec et al., MMDS ch.3). Integer
    // powers are explicit products (no libm pow); per-pair
    // probabilities round to 6 dp and sum as DECIMAL.
    Q("minhash_recall_audit", {
      // (1 - j^2)^6 for b=6, r=2, as explicit products
      val x = "(1.0 - j * j)"
      val miss = Seq.fill(B)(x).mkString(" * ")
      s"""WITH sl AS (SELECT doc_id, text FROM documents),
         |arr AS (SELECT doc_id, string_split(text, ' ') AS a FROM sl),
         |ssh AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(a)-2),
         |        i -> a[i] || ' ' || a[i+1] || ' ' || a[i+2])) AS shingle FROM arr),
         |dsh2 AS (SELECT DISTINCT doc_id, shingle FROM ssh),
         |hs2 AS (SELECT doc_id, ${duckH32("shingle")} % ${graft.functions.PortableHash.MersennePrime31} AS hm FROM dsh2),
         |hset AS (SELECT DISTINCT doc_id, hm FROM hs2),
         |hsz AS (SELECT doc_id, COUNT(*) AS n FROM hset GROUP BY 1),
         |i AS (SELECT x.doc_id AS d1, y.doc_id AS d2, COUNT(*) AS inter
         |      FROM hset x JOIN hset y ON x.hm = y.hm AND x.doc_id < y.doc_id
         |      GROUP BY 1, 2),
         |tp AS (SELECT d1, d2, inter * 1.0 / (a.n + b.n - inter) AS j
         |       FROM i JOIN hsz a ON d1 = a.doc_id JOIN hsz b ON d2 = b.doc_id
         |       WHERE inter * 1.0 / (a.n + b.n - inter) >= 0.5),
         |mh2 AS (SELECT doc_id, ${
        graft.functions.PortableHash.minhashPerms(K).zipWithIndex.map {
          case ((a, b), idx) =>
            s"min(${graft.functions.PortableHash.duckPermute("hm", a, b)}) AS m$idx"
        }.mkString(", ")} FROM hs2 GROUP BY doc_id),
         |bands2 AS (SELECT doc_id, band FROM (SELECT doc_id, unnest([${
        (0 until B).map { band =>
          s"'$band,' || " + (0 until R).map(j => s"CAST(m${band * R + j} AS VARCHAR)")
            .mkString(" || ',' || ")
        }.mkString(", ")}]) AS band FROM mh2)),
         |cp AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
         |       FROM bands2 x JOIN bands2 y ON x.band = y.band AND x.doc_id < y.doc_id),
         |lab AS (SELECT tp.d1, tp.d2, j, cp.d1 IS NOT NULL AS caught
         |        FROM tp LEFT JOIN cp ON tp.d1 = cp.d1 AND tp.d2 = cp.d2)
         |SELECT (SELECT COUNT(*) FROM sl) AS n_docs,
         |  COUNT(*) AS n_true_pairs,
         |  CAST(SUM(CASE WHEN caught THEN 1 ELSE 0 END) AS BIGINT) AS n_caught,
         |  round(CAST(SUM(CASE WHEN caught THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS recall,
         |  round(CAST(SUM(CAST(round(1.0 - $miss, 6) AS DECIMAL(20,6))) AS DOUBLE) / COUNT(*), 6) AS predicted_recall
         |FROM lab""".stripMargin
    }) { (s, dir) =>
      import graft.functions.PortableHash
      val sl = Tables.load(s, dir, "documents").select("doc_id", "text")
      val hs2 = Dedup.distinctShingles(sl, "doc_id", "text")
        .select(col("doc_id"),
          (h32(col("shingle")) % PortableHash.MersennePrime31).as("hm"))
        .localCheckpoint(true) // feeds exact sets AND signatures
      val hsz = hs2.groupBy("doc_id").agg(count(lit(1)).as("n"))
      // shared-shingle pairs via the in-bucket group-explode (the
      // repo's own candidate-generation idiom) instead of a self-join:
      // ONE exchange on hm instead of two, and the checkpointed hs2 is
      // read once (guide §2.4). Per hm bucket, pairs (d1 < d2 in sort
      // order) each appear once per shared hash — the groupBy count is
      // exactly the self-join's `inter`.
      val tp = Dedup.bucketPairs(hs2, Seq(col("hm")), col("doc_id"))
        .groupBy(col("a").as("d1"), col("b").as("d2"))
        .agg(count(lit(1)).as("inter"))
        .join(hsz.withColumnRenamed("doc_id", "d1")
          .withColumnRenamed("n", "na"), Seq("d1"))
        .join(hsz.withColumnRenamed("doc_id", "d2")
          .withColumnRenamed("n", "nb"), Seq("d2"))
        .select(col("d1"), col("d2"),
          (col("inter") * lit(1.0) / (col("na") + col("nb") - col("inter")))
            .as("j"))
        .filter(col("j") >= 0.5)
      val mins = PortableHash.minhashPerms(K).zipWithIndex.map {
        case ((a, b), idx) =>
          min(PortableHash.permute(col("hm"), a, b)).as(s"m$idx")
      }
      val sig = hs2.groupBy("doc_id").agg(mins.head, mins.tail: _*)
      val cp = Dedup.candidatePairs(Dedup.bandKeys(sig, "doc_id", B, R),
          "doc_id")
        .select(col("id_a").as("d1"), col("id_b").as("d2"),
          lit(true).as("caught"))
      val missC = {
        val x = lit(1.0) - col("j") * col("j")
        (1 until B).foldLeft(x)((acc, _) => acc * x)
      }
      val nSlice = sl.agg(count(lit(1)).as("n_docs"))
      tp.join(cp, Seq("d1", "d2"), "left")
        .na.fill(false, Seq("caught"))
        .agg(count(lit(1)).as("n_true_pairs"),
          sum(when(col("caught"), 1).otherwise(0)).as("n_caught"),
          round(sum(when(col("caught"), 1).otherwise(0)).cast("double") /
            count(lit(1)), 6).as("recall"),
          round(sum(round(lit(1.0) - missC, 6).cast(DecimalType(20, 6)))
            .cast("double") / count(lit(1)), 6).as("predicted_recall"))
        .crossJoin(broadcast(nSlice))
        .select("n_docs", "n_true_pairs", "n_caught", "recall",
          "predicted_recall")
    },

    // DEDUP THRESHOLD SWEEP — the operating-point table for the
    // Jaccard cutoff itself (the quality_pr_curve discipline applied
    // to dedup policy): for each candidate threshold, how many pairs
    // fire, how many documents the keep-longest rule would DROP, and
    // how many bytes that saves. The drop rule is doc-level and
    // deterministic: a doc drops at threshold t iff some pair >= t
    // links it to a longer doc (ties to the lower doc_id) — each doc
    // counted ONCE per threshold however many pairs implicate it.
    // One exact-Jaccard pair frame (the recall-audit derivation)
    // fans across a broadcast 5-row threshold dim; everything after
    // the per-(threshold, doc) distinct is census-sized. On THIS
    // fixture the curve is flat — the generator's near-dups are
    // near-identical (all 25 true pairs sit at j >= 0.9) and
    // unrelated docs share no trigram, so every threshold fires the
    // same set; the monotone-non-increasing contract (EvalSpec) and
    // the oracle still exercise the full machinery, and on a real
    // corpus the same table is the cutoff-selection artifact.
    Q("dedup_threshold_sweep",
      s"""WITH arr AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
         |ssh AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(a)-2),
         |        i -> a[i] || ' ' || a[i+1] || ' ' || a[i+2])) AS shingle FROM arr),
         |dsh2 AS (SELECT DISTINCT doc_id, shingle FROM ssh),
         |hs2 AS (SELECT doc_id, ${duckH32("shingle")} % ${graft.functions.PortableHash.MersennePrime31} AS hm FROM dsh2),
         |hset AS (SELECT DISTINCT doc_id, hm FROM hs2),
         |hsz AS (SELECT doc_id, COUNT(*) AS n FROM hset GROUP BY 1),
         |i AS (SELECT x.doc_id AS d1, y.doc_id AS d2, COUNT(*) AS inter
         |      FROM hset x JOIN hset y ON x.hm = y.hm AND x.doc_id < y.doc_id
         |      GROUP BY 1, 2),
         |jp AS (SELECT d1, d2, inter * 1.0 / (a.n + b.n - inter) AS j
         |       FROM i JOIN hsz a ON d1 = a.doc_id JOIN hsz b ON d2 = b.doc_id),
         |m AS (SELECT jp.d1, jp.d2, j, da.n_chars AS ca, db.n_chars AS cb
         |      FROM jp JOIN documents da ON jp.d1 = da.doc_id
         |               JOIN documents db ON jp.d2 = db.doc_id),
         |th AS (SELECT CAST(unnest([0.1, 0.3, 0.5, 0.7, 0.9]) AS DOUBLE) AS t),
         |drops AS (SELECT DISTINCT t,
         |    CASE WHEN ca < cb OR (ca = cb AND d2 < d1) THEN d1 ELSE d2 END AS doc_id,
         |    CASE WHEN ca < cb OR (ca = cb AND d2 < d1) THEN ca ELSE cb END AS nch
         |  FROM m CROSS JOIN th WHERE j >= t),
         |pc AS (SELECT t, COUNT(*) AS n_pairs FROM m CROSS JOIN th
         |       WHERE j >= t GROUP BY t)
         |SELECT pc.t AS threshold, n_pairs,
         |  COALESCE(dc.n_docs_dropped, 0) AS n_docs_dropped,
         |  COALESCE(dc.bytes_saved, 0) AS bytes_saved
         |FROM pc LEFT JOIN (SELECT t, COUNT(*) AS n_docs_dropped,
         |    CAST(SUM(nch) AS BIGINT) AS bytes_saved FROM drops GROUP BY t) dc
         |  ON pc.t = dc.t
         |ORDER BY threshold""".stripMargin) { (s, dir) =>
      import graft.functions.PortableHash
      val docs = Tables.load(s, dir, "documents")
      // materialized once (the persisted signature artifact, as in
      // minhash_recall_audit): the un-checkpointed self-join used to
      // re-derive the scan + shingle + md5 pipeline for BOTH join
      // sides and a third time for the size census
      val hs2 = Dedup.distinctShingles(docs.select("doc_id", "text"),
          "doc_id", "text")
        .select(col("doc_id"),
          (h32(col("shingle")) % PortableHash.MersennePrime31).as("hm"))
        .localCheckpoint(true)
      val hsz = hs2.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val meta = docs.select("doc_id", "n_chars")
      // shared-shingle pairs via the in-bucket group-explode instead
      // of a self-join — same rationale as minhash_recall_audit
      val m = Dedup.bucketPairs(hs2, Seq(col("hm")), col("doc_id"))
        .groupBy(col("a").as("d1"), col("b").as("d2"))
        .agg(count(lit(1)).as("inter"))
        .join(hsz.toDF("d1", "na"), Seq("d1"))
        .join(hsz.toDF("d2", "nb"), Seq("d2"))
        .join(meta.toDF("d1", "ca"), Seq("d1"))
        .join(meta.toDF("d2", "cb"), Seq("d2"))
        .select(col("d1"), col("d2"), col("ca"), col("cb"),
          (col("inter") * lit(1.0) / (col("na") + col("nb") - col("inter")))
            .as("j"))
        .localCheckpoint(true) // pair frame feeds both sweep branches
      import s.implicits._
      val th = Seq(0.1, 0.3, 0.5, 0.7, 0.9).toDF("t")
      val fired = m.crossJoin(broadcast(th)).filter(col("j") >= col("t"))
      val loser = col("ca") < col("cb") ||
        (col("ca") === col("cb") && col("d2") < col("d1"))
      val drops = fired
        .select(col("t"),
          when(loser, col("d1")).otherwise(col("d2")).as("doc_id"),
          when(loser, col("ca")).otherwise(col("cb")).as("nch"))
        .distinct()
        .groupBy("t")
        .agg(count(lit(1)).as("n_docs_dropped"),
          sum(col("nch")).as("bytes_saved"))
      fired.groupBy("t").agg(count(lit(1)).as("n_pairs"))
        .join(drops, Seq("t"), "left")
        .na.fill(0L, Seq("n_docs_dropped", "bytes_saved"))
        .select(col("t").as("threshold"), col("n_pairs"),
          col("n_docs_dropped"), col("bytes_saved"))
        .orderBy("threshold")
    },

    // FELLEGI-SUNTER FIELD WEIGHTS (Fellegi & Sunter, JASA '69) — the
    // entity-resolution layer over the dedup machinery: how much
    // EVIDENCE does agreement on each metadata field carry? Labels
    // come from the pipeline itself (candidate pairs with exact
    // shingle-Jaccard >= 0.7 are "matches", the rest of the banded
    // candidates "non-matches"); per field the m-probability
    // P(agree|match) and u-probability P(agree|non-match) are
    // Laplace-smoothed ratios of exact integer counts, and the
    // log-likelihood weight ln(m/u) is what a linkage rule sums per
    // field before thresholding. Fields: lang equality, source
    // equality, length-within-5%. Same banding-bounded pair frame
    // and shuffle-hash verify as minhash_calibration (one shingling
    // pass feeds signatures AND exact sets); the field fan-out is a
    // 3-per-pair explode and the output a 3-row census — nothing
    // beyond the candidate decoration moves at 100 TB.
    Q("er_field_weights",
      s"""$minhashCte,
         |$bandsCte,
         |pairs AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
         |          FROM bands x JOIN bands y ON x.band = y.band AND x.doc_id < y.doc_id),
         |hset AS (SELECT DISTINCT doc_id, hm FROM hs),
         |hsz AS (SELECT doc_id, COUNT(*) AS n FROM hset GROUP BY doc_id),
         |i AS (SELECT x.doc_id AS d1, y.doc_id AS d2, COUNT(*) AS inter
         |      FROM hset x JOIN hset y ON x.hm = y.hm AND x.doc_id < y.doc_id
         |      GROUP BY 1, 2),
         |fl AS (SELECT
         |    COALESCE(i.inter, 0) * 1.0 / (x.n + y.n - COALESCE(i.inter, 0)) >= 0.7 AS is_match,
         |    a.lang = b.lang AS f_lang, a.source = b.source AS f_source,
         |    abs(a.n_chars - b.n_chars) * 20 <= greatest(a.n_chars, b.n_chars) AS f_len
         |  FROM pairs p LEFT JOIN i ON p.d1 = i.d1 AND p.d2 = i.d2
         |    JOIN hsz x ON p.d1 = x.doc_id JOIN hsz y ON p.d2 = y.doc_id
         |    JOIN documents a ON p.d1 = a.doc_id JOIN documents b ON p.d2 = b.doc_id),
         |u AS (SELECT 'lang' AS field, is_match, f_lang AS agree FROM fl
         |      UNION ALL SELECT 'len5pct', is_match, f_len FROM fl
         |      UNION ALL SELECT 'source', is_match, f_source FROM fl),
         |c AS (SELECT field,
         |    CAST(SUM(CASE WHEN is_match THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
         |    CAST(SUM(CASE WHEN NOT is_match THEN 1 ELSE 0 END) AS BIGINT) AS n_nonmatch,
         |    CAST(SUM(CASE WHEN is_match AND agree THEN 1 ELSE 0 END) AS BIGINT) AS agree_match,
         |    CAST(SUM(CASE WHEN NOT is_match AND agree THEN 1 ELSE 0 END) AS BIGINT) AS agree_nonmatch
         |  FROM u GROUP BY field)
         |SELECT field, n_match, n_nonmatch, agree_match, agree_nonmatch,
         |  round((agree_match + 1.0) / (n_match + 2), 6) AS m_prob,
         |  round((agree_nonmatch + 1.0) / (n_nonmatch + 2), 6) AS u_prob,
         |  round(ln(((agree_match + 1.0) / (n_match + 2)) /
         |           ((agree_nonmatch + 1.0) / (n_nonmatch + 2))), 6) AS weight
         |FROM c ORDER BY field""".stripMargin) { (s, dir) =>
      import graft.functions.PortableHash
      val docs = Tables.load(s, dir, "documents")
      val dsh = Dedup.distinctShingles(docs.select("doc_id", "text"),
          "doc_id", "text")
        .select(col("doc_id"),
          (h32(col("shingle")) % PortableHash.MersennePrime31).as("hm"))
      val mins = PortableHash.minhashPerms(K).zipWithIndex.map {
        case ((a, b), i) => min(PortableHash.permute(col("hm"), a, b)).as(s"m$i")
      }
      // one aggregation builds signatures + exact sets (the
      // minhash_calibration recipe), then a 1:1 doc-key join attaches
      // the metadata fields — per-doc, so nothing corpus-sized is
      // broadcast for the pair decoration
      val feat = dsh.groupBy("doc_id")
        .agg(mins.head, (mins.tail :+
          sort_array(collect_set(col("hm"))).as("toks")): _*)
        .withColumn("n", size(col("toks")))
        .join(docs.select("doc_id", "lang", "source", "n_chars"), Seq("doc_id"))
        .localCheckpoint(false)
      val pairs = Dedup.candidatePairs(
        Dedup.bandKeys(feat.select(col("doc_id") +:
          (0 until K).map(i => col(s"m$i")): _*), "doc_id", B, R), "doc_id")
      val inter = size(array_intersect(col("a.toks"), col("b.toks")))
      val j = inter * lit(1.0) / (col("a.n") + col("b.n") - inter)
      val fl = pairs.hint("shuffle_hash")
        .join(feat.as("a"), col("id_a") === col("a.doc_id"))
        .hint("shuffle_hash")
        .join(feat.as("b"), col("id_b") === col("b.doc_id"))
        .select((j >= 0.7).as("is_match"),
          (col("a.lang") === col("b.lang")).as("f_lang"),
          (col("a.source") === col("b.source")).as("f_source"),
          (abs(col("a.n_chars") - col("b.n_chars")) * 20 <=
            greatest(col("a.n_chars"), col("b.n_chars"))).as("f_len"))
      fl.select(explode(array(
          struct(lit("lang").as("field"), col("f_lang").as("agree"),
            col("is_match")),
          struct(lit("len5pct").as("field"), col("f_len").as("agree"),
            col("is_match")),
          struct(lit("source").as("field"), col("f_source").as("agree"),
            col("is_match")))).as("x"))
        .select(col("x.field").as("field"), col("x.agree").as("agree"),
          col("x.is_match").as("is_match"))
        .groupBy("field")
        .agg(sum(when(col("is_match"), 1).otherwise(0)).as("n_match"),
          sum(when(!col("is_match"), 1).otherwise(0)).as("n_nonmatch"),
          sum(when(col("is_match") && col("agree"), 1).otherwise(0))
            .as("agree_match"),
          sum(when(!col("is_match") && col("agree"), 1).otherwise(0))
            .as("agree_nonmatch"))
        .select(col("field"), col("n_match"), col("n_nonmatch"),
          col("agree_match"), col("agree_nonmatch"),
          round((col("agree_match") + 1.0) / (col("n_match") + 2), 6)
            .as("m_prob"),
          round((col("agree_nonmatch") + 1.0) / (col("n_nonmatch") + 2), 6)
            .as("u_prob"),
          round(log(((col("agree_match") + 1.0) / (col("n_match") + 2)) /
            ((col("agree_nonmatch") + 1.0) / (col("n_nonmatch") + 2))), 6)
            .as("weight"))
        .orderBy("field")
    },

    // LSH band-occupancy audit — the OTHER half of minhash tuning
    // (minhash_calibration checks estimator accuracy; this checks the
    // cost side): per band index, how many buckets exist, how many
    // collide, the candidate-pair mass sum(n*(n-1)/2), and the biggest
    // bucket. This is the statistic to watch BEFORE running candidate
    // generation at 100 TB: cand_pairs is exactly the row count the
    // in-bucket pair expansion will emit, and max_bucket bounds the
    // largest local blow-up (a mega-bucket here means a degenerate
    // band — e.g. a corpus-wide boilerplate shingle dominating a
    // permutation — and is the cue to raise r or blocklist the
    // shingle). Two cascaded bounded aggregates over the band keys:
    // the first carries one row per occupied bucket, the second B
    // rows total; nothing corpus-sized survives the first exchange.
    Q("dedup_band_stats",
      s"""$minhashCte,
         |$bandsCte,
         |bs AS (SELECT CAST(string_split(band, ',')[1] AS BIGINT) AS band_idx,
         |         band, COUNT(*) AS n
         |       FROM bands GROUP BY 1, 2)
         |SELECT band_idx, COUNT(*) AS n_buckets,
         |  CAST(SUM(n) AS BIGINT) AS n_docs,
         |  CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_colliding,
         |  CAST(SUM((n * (n - 1)) // 2) AS BIGINT) AS cand_pairs,
         |  CAST(MAX(n) AS BIGINT) AS max_bucket
         |FROM bs GROUP BY band_idx ORDER BY band_idx""".stripMargin) { (s, dir) =>
      val sig = Dedup.minhashFromText(
        Tables.load(s, dir, "documents"), "doc_id", "text", K)
      Dedup.bandKeys(sig, "doc_id", B, R)
        .groupBy(element_at(split(col("band"), ","), 1).cast("long").as("band_idx"),
          col("band"))
        .agg(count(lit(1)).as("n"))
        .groupBy("band_idx")
        .agg(count(lit(1)).as("n_buckets"),
          sum(col("n")).cast("long").as("n_docs"),
          sum(when(col("n") > 1, 1).otherwise(0)).cast("long").as("n_colliding"),
          sum(expr("(n * (n - 1)) div 2")).cast("long").as("cand_pairs"),
          max(col("n")).cast("long").as("max_bucket"))
        .orderBy("band_idx")
    },

    // n-gram novelty scoring — per document, the fraction of its
    // distinct 3-gram hashes whose FIRST corpus occurrence (minimum
    // doc_id) is this document. The curation signal between exact
    // dedup and near-dup pairs: a low-novelty doc is mostly recycled
    // text even when no single partner crosses the pair threshold
    // (template farms, quote aggregators). Hashes, not shingle
    // strings, cross the exchanges: first-occurrence is a min over
    // h32(shingle) (collision bias ~2^-31 — fine for a score), so the
    // two shuffles (first-seen min, decoration join back) both carry
    // (int, long) pairs, never text. At 100 TB with a growing corpus
    // the `first` table is the persistent store and new batches probe
    // it — the dedup_incremental shape applied to novelty.
    Q("ngram_novelty",
      s"""$shingleCtes,
         |dh AS (SELECT DISTINCT doc_id, ${duckH32("shingle")} AS hm FROM dsh),
         |first AS (SELECT hm, MIN(doc_id) AS first_doc FROM dh GROUP BY hm)
         |SELECT dh.doc_id, COUNT(*) AS n_shingles,
         |  CAST(SUM(CASE WHEN first.first_doc = dh.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
         |  round(SUM(CASE WHEN first.first_doc = dh.doc_id THEN 1 ELSE 0 END) * 1.0
         |    / COUNT(*), 6) AS novelty
         |FROM dh JOIN first USING (hm)
         |GROUP BY dh.doc_id ORDER BY dh.doc_id""".stripMargin) { (s, dir) =>
      // distinct AFTER hashing (not just distinctShingles' pre-hash
      // distinct): two shingles colliding to one hm must count once,
      // matching the oracle's DISTINCT over (doc_id, hm)
      val dh = Dedup.distinctShingles(
          Tables.load(s, dir, "documents").select("doc_id", "text"),
          "doc_id", "text")
        .select(col("doc_id"), h32(col("shingle")).as("hm"))
        .distinct()
      val first = dh.groupBy("hm").agg(min(col("doc_id")).as("first_doc"))
      val novel = when(col("first_doc") === col("doc_id"), 1).otherwise(0)
      dh.join(first, "hm")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shingles"),
          sum(novel).cast("long").as("n_novel"),
          round(sum(novel) * lit(1.0) / count(lit(1)), 6).as("novelty"))
        .orderBy("doc_id")
    },

    // k-nearest-neighbor graph by exact Jaccard over the banding
    // candidates — the thinned dup graph every graph-based clustering
    // step wants (connected components over ALL candidates chains
    // borderline pairs into mega-clusters; keeping each node's top-3
    // strongest edges bounds the degree before clustering). Edges are
    // the banding-bounded candidate pairs decorated with exact
    // Jaccard (the minhash_calibration shape), symmetrized with one
    // union, then a per-doc window ranks partners (jaccard DESC,
    // partner) — the window input is the pair set, never the corpus.
    Q("jaccard_knn_graph",
      s"""$minhashCte,
         |$bandsCte,
         |pairs AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
         |          FROM bands x JOIN bands y ON x.band = y.band AND x.doc_id < y.doc_id),
         |hset AS (SELECT DISTINCT doc_id, hm FROM hs),
         |hsz AS (SELECT doc_id, COUNT(*) AS n FROM hset GROUP BY doc_id),
         |i AS (SELECT x.doc_id AS d1, y.doc_id AS d2, COUNT(*) AS inter
         |      FROM hset x JOIN hset y ON x.hm = y.hm AND x.doc_id < y.doc_id
         |      GROUP BY 1, 2),
         |jp AS (SELECT p.d1, p.d2,
         |    round(COALESCE(i.inter, 0) * 1.0
         |      / (x.n + y.n - COALESCE(i.inter, 0)), 6) AS jaccard
         |  FROM pairs p JOIN hsz x ON x.doc_id = p.d1 JOIN hsz y ON y.doc_id = p.d2
         |  LEFT JOIN i ON i.d1 = p.d1 AND i.d2 = p.d2),
         |e AS (SELECT d1 AS doc_id, d2 AS partner, jaccard FROM jp
         |      UNION ALL SELECT d2, d1, jaccard FROM jp),
         |r AS (SELECT doc_id, partner, jaccard, row_number() OVER (
         |        PARTITION BY doc_id ORDER BY jaccard DESC, partner) AS rnk FROM e)
         |SELECT doc_id, rnk, partner, jaccard FROM r WHERE rnk <= 3
         |ORDER BY doc_id, rnk""".stripMargin) { (s, dir) =>
      import graft.functions.PortableHash
      import org.apache.spark.sql.expressions.Window
      val dsh = Dedup.distinctShingles(
          Tables.load(s, dir, "documents").select("doc_id", "text"),
          "doc_id", "text")
        .select(col("doc_id"),
          (h32(col("shingle")) % PortableHash.MersennePrime31).as("hm"))
      val mins = PortableHash.minhashPerms(K).zipWithIndex.map {
        case ((a, b), i) => min(PortableHash.permute(col("hm"), a, b)).as(s"m$i")
      }
      val feat = dsh.groupBy("doc_id")
        .agg(mins.head, (mins.tail :+
          sort_array(collect_set(col("hm"))).as("toks")): _*)
        .withColumn("n", size(col("toks")))
        .localCheckpoint(false)
      val pairs = Dedup.candidatePairs(
        Dedup.bandKeys(feat.select(col("doc_id") +:
          (0 until K).map(i => col(s"m$i")): _*), "doc_id", B, R), "doc_id")
      val inter = size(array_intersect(col("a.toks"), col("b.toks")))
      val jp = pairs.hint("shuffle_hash")
        .join(feat.as("a"), col("id_a") === col("a.doc_id"))
        .hint("shuffle_hash")
        .join(feat.as("b"), col("id_b") === col("b.doc_id"))
        .select(col("id_a").as("d1"), col("id_b").as("d2"),
          round(inter * lit(1.0) / (col("a.n") + col("b.n") - inter), 6)
            .as("jaccard"))
      val e = jp.select(col("d1").as("doc_id"), col("d2").as("partner"), col("jaccard"))
        .unionAll(jp.select(col("d2").as("doc_id"), col("d1").as("partner"), col("jaccard")))
      val w = Window.partitionBy("doc_id").orderBy(col("jaccard").desc, col("partner"))
      e.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select("doc_id", "rnk", "partner", "jaccard")
        .orderBy("doc_id", "rnk")
    },

    // duplicate-graph degree histogram: how many near-dup partners
    // each doc has, rolled into degree -> n_docs (the shape of this
    // distribution decides the dedup strategy: a long tail of
    // degree-1 pairs dedups pairwise; heavy hubs need clustering).
    // Zero-degree docs are included via the left join against the
    // table. 100 TB: pairs are banding-bounded; the degree count is
    // one union-all + groupBy; the left join shuffles on doc_id with
    // the (tiny) degree side as build.
    Q("dup_degree",
      s"""$minhashCte,
         |$bandsCte,
         |pairs AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
         |          FROM bands x JOIN bands y ON x.band = y.band AND x.doc_id < y.doc_id),
         |deg AS (SELECT doc_id, COUNT(*) AS degree FROM
         |          (SELECT d1 AS doc_id FROM pairs UNION ALL SELECT d2 FROM pairs)
         |        GROUP BY doc_id),
         |alld AS (SELECT d.doc_id, COALESCE(g.degree, 0) AS degree
         |         FROM documents d LEFT JOIN deg g USING (doc_id))
         |SELECT degree, COUNT(*) AS n_docs FROM alld
         |GROUP BY degree ORDER BY degree""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val sig = Dedup.minhashFromText(docs, "doc_id", "text", K)
      val pairs = Dedup.candidatePairs(
        Dedup.bandKeys(sig, "doc_id", B, R), "doc_id")
      val deg = pairs.select(col("id_a").as("doc_id"))
        .unionAll(pairs.select(col("id_b").as("doc_id")))
        .groupBy("doc_id").agg(count(lit(1)).as("degree"))
      docs.select("doc_id").join(deg, Seq("doc_id"), "left")
        .select(coalesce(col("degree"), lit(0L)).as("degree"))
        .groupBy("degree").agg(count(lit(1)).as("n_docs"))
        .orderBy("degree")
    },

    // PageRank over the (undirected) near-dup candidate graph: hub
    // docs — templates shared by many near-copies — float to the top,
    // which is how a corpus pipeline finds boilerplate FAMILIES
    // rather than single pairs. Three fixed power iterations, damping
    // 0.85; every node has degree >= 1 (the graph is the symmetrized
    // pair set) so there is no dangling mass. Cross-engine float
    // discipline: each iteration's per-node contribution and the
    // damped sum are rounded to 9 dp and SUMMED AS DECIMAL, so the
    // result is independent of aggregation order on both engines.
    // 100 TB: contributions join edges on the partition key the
    // groupBy already produced; 3 bounded iterations need no lineage
    // truncation (contrast connectedComponents' unbounded loop, which
    // checkpoints per round).
    Q("pagerank_dups", {
      val iterCtes = (1 to 3).map { k =>
        s"""c$k AS (SELECT r.doc_id,
           |  CAST(round(CAST(r.r AS DOUBLE) / d.degree, 9) AS DECIMAL(18,9)) AS c
           |  FROM r${k - 1} r JOIN deg d USING (doc_id)),
           |r$k AS (SELECT e.b AS doc_id,
           |  CAST(round(0.15 + 0.85 * CAST(SUM(c.c) AS DOUBLE), 9) AS DECIMAL(18,9)) AS r
           |  FROM edges e JOIN c$k c ON e.a = c.doc_id GROUP BY e.b)""".stripMargin
      }.mkString(",\n")
      s"""$minhashCte,
         |$bandsCte,
         |pairs AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
         |          FROM bands x JOIN bands y ON x.band = y.band AND x.doc_id < y.doc_id),
         |edges AS (SELECT d1 AS a, d2 AS b FROM pairs
         |          UNION ALL SELECT d2, d1 FROM pairs),
         |deg AS (SELECT a AS doc_id, COUNT(*) AS degree FROM edges GROUP BY a),
         |r0 AS (SELECT doc_id, CAST(1.0 AS DECIMAL(18,9)) AS r FROM deg),
         |$iterCtes
         |SELECT r3.doc_id AS doc_id, CAST(r3.r AS DOUBLE) AS pagerank, deg.degree
         |FROM r3 JOIN deg USING (doc_id) ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      import org.apache.spark.sql.types.DecimalType
      val sig = Dedup.minhashFromText(
        Tables.load(s, dir, "documents"), "doc_id", "text", K)
      val pairs = Dedup.candidatePairs(
        Dedup.bandKeys(sig, "doc_id", B, R), "doc_id")
      // edges is joined by all 3 iterations; AQE stage reuse dedupes
      // the upstream shingle->minhash->band computation, so an
      // explicit localCheckpoint buys nothing: an interleaved A/B at
      // sf0.1 (local[32], min-of-2 after per-variant warmup,
      // 2026-08-13) puts both variants at ~2.4-2.8 s, within host
      // noise — absolute times on this box swing ~2x with load, so
      // only the relative reading is meaningful. A production run
      // over a persisted pair table skips the question entirely.
      val edges = pairs.select(col("id_a").as("a"), col("id_b").as("b"))
        .unionAll(pairs.select(col("id_b").as("a"), col("id_a").as("b")))
      val deg = edges.groupBy(col("a").as("doc_id"))
        .agg(count(lit(1)).as("degree"))
      var r = deg.select(col("doc_id"),
        lit(1.0).cast(DecimalType(18, 9)).as("r"))
      for (_ <- 1 to 3) {
        val c = r.join(deg, "doc_id").select(col("doc_id"),
          round(col("r").cast("double") / col("degree"), 9)
            .cast(DecimalType(18, 9)).as("c"))
        r = edges.join(c, edges("a") === c("doc_id"))
          .groupBy(col("b").as("doc_id"))
          .agg(round(lit(0.15) + lit(0.85) * sum(col("c")).cast("double"), 9)
            .cast(DecimalType(18, 9)).as("r"))
      }
      r.join(deg, "doc_id")
        .select(col("doc_id"), col("r").cast("double").as("pagerank"),
          col("degree"))
        .orderBy("doc_id")
    },

    // triangle census of the near-dup graph: true duplicate FAMILIES
    // are near-cliques (every copy matches every copy), while chained
    // false positives from banding are open wedges — so the global
    // clustering coefficient 3*triangles/wedges is the standard
    // one-number audit of candidate-pair quality. Triangles count
    // once per ordered triple a<b<c via three joins of the ordered
    // pair list (p1=(a,b), p2=(b,c), p3=(a,c)); wedges derive from
    // the degree table. 100 TB: pairs are banding-bounded and the
    // join keys are doc ids — the standard ordered-triple plan; a
    // hub-heavy graph would first cap per-node neighbor lists
    // (dup_spans' hot-key cap) before the join chain.
    Q("dup_triangles",
      s"""$minhashCte,
         |$bandsCte,
         |pairs AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
         |          FROM bands x JOIN bands y ON x.band = y.band AND x.doc_id < y.doc_id),
         |tri AS (SELECT COUNT(*) AS n_triangles FROM pairs p1
         |        JOIN pairs p2 ON p2.d1 = p1.d2
         |        JOIN pairs p3 ON p3.d1 = p1.d1 AND p3.d2 = p2.d2),
         |deg AS (SELECT doc_id, COUNT(*) AS degree FROM
         |          (SELECT d1 AS doc_id FROM pairs UNION ALL SELECT d2 FROM pairs)
         |        GROUP BY doc_id),
         |w AS (SELECT SUM(degree * (degree - 1)) // 2 AS n_wedges FROM deg)
         |SELECT n_triangles, CAST(n_wedges AS BIGINT) AS n_wedges,
         |  CASE WHEN n_wedges = 0 THEN 0.0
         |       ELSE CAST(3.0 * n_triangles AS DOUBLE) / CAST(n_wedges AS DOUBLE)
         |  END AS clustering_coeff
         |FROM tri, w""".stripMargin) { (s, dir) =>
      val sig = Dedup.minhashFromText(
        Tables.load(s, dir, "documents"), "doc_id", "text", K)
      // pairs feeds four branches (p1/p2/p3 + the wedge degrees); AQE
      // stage reuse dedupes the shared minhash pipeline, so an
      // explicit localCheckpoint buys nothing: interleaved A/B at
      // sf0.1 (local[32], 2026-08-13) puts both at ~1.0 s, within
      // host noise — the pagerank_dups/dup_spans finding again
      val pairs = Dedup.candidatePairs(
        Dedup.bandKeys(sig, "doc_id", B, R), "doc_id")
        .select(col("id_a").as("d1"), col("id_b").as("d2"))
      val tri = pairs.as("p1")
        .join(pairs.as("p2"), col("p2.d1") === col("p1.d2"))
        .join(pairs.as("p3"),
          col("p3.d1") === col("p1.d1") && col("p3.d2") === col("p2.d2"))
        .agg(count(lit(1)).as("n_triangles"))
      val wedges = pairs.select(col("d1").as("doc_id"))
        .unionAll(pairs.select(col("d2").as("doc_id")))
        .groupBy("doc_id").agg(count(lit(1)).as("degree"))
        .agg(expr("sum(degree * (degree - 1)) div 2").as("n_wedges"))
      tri.crossJoin(wedges)
        .select(col("n_triangles"), col("n_wedges").cast("long").as("n_wedges"),
          // explicit 0-wedge guard: Spark's non-ANSI 0.0/0.0 is NULL
          // where DuckDB's IEEE division is NaN — a perfect-matching
          // pair graph (every degree 1) would diverge without it
          when(col("n_wedges") === 0, lit(0.0))
            .otherwise(col("n_triangles").cast("double") * 3.0 /
              col("n_wedges").cast("double")).as("clustering_coeff"))
    },

    // duplicate CLUSTERS: connected components over the MinHash
    // candidate pairs (cluster_id = min reachable doc; "keep one per
    // cluster" = doc_id == cluster_id). Oracle: recursive-CTE
    // transitive closure over the same pair set.
    Q("dedup_clusters",
      s"""${minhashCte.replaceFirst("^WITH ", "WITH RECURSIVE ")},
         |$bandsCte,
         |pairs AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
         |          FROM bands x JOIN bands y ON x.band = y.band AND x.doc_id < y.doc_id),
         |edges AS (SELECT d1 AS a, d2 AS b FROM pairs
         |          UNION SELECT d2, d1 FROM pairs),
         |reach AS (SELECT a, b FROM edges
         |          UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         |lbl AS (SELECT a AS doc_id, least(a, MIN(b)) AS cluster_id
         |        FROM reach GROUP BY a)
         |SELECT doc_id, cluster_id FROM lbl ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val sig = Dedup.minhashFromText(Tables.load(s, dir, "documents"), "doc_id", "text", K)
      val bands = Dedup.bandKeys(sig, "doc_id", B, R)
      val pairs = Dedup.candidatePairs(bands, "doc_id")
      Dedup.connectedComponents(pairs, "id_a", "id_b")
        .select(col("id").as("doc_id"), col("cluster_id"))
        .orderBy("doc_id")
    },

    // LABEL-PROPAGATION COMMUNITIES (Raghavan et al., '07) — the
    // density-aware counterpart to dedup_clusters' connected
    // components: CC merges everything reachable (one spurious band
    // collision chains two families together), while LPA converges to
    // the majority-neighbor label, splitting chained families at
    // their thin cut. Deterministic variant: 3 SYNCHRONOUS rounds,
    // each node adopting its neighbors' most frequent label with ties
    // to the smallest label (row_number over (count DESC, label)) —
    // a pure function of the edge set, so both engines agree
    // bit-exactly, unlike the classic randomized-order LPA. Same
    // banding-bounded edge list and per-round single-join shape as
    // pagerank_dups: at 100 TB each round shuffles (node, label)
    // pairs over the pair graph, never the corpus.
    Q("lpa_communities",
      s"""$minhashCte,
         |$bandsCte,
         |pairs AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
         |          FROM bands x JOIN bands y ON x.band = y.band AND x.doc_id < y.doc_id),
         |edges AS (SELECT d1 AS a, d2 AS b FROM pairs
         |          UNION SELECT d2, d1 FROM pairs),
         |$lpaCtes
         |SELECT node AS doc_id, lbl AS community FROM l3 ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val sig = Dedup.minhashFromText(
        Tables.load(s, dir, "documents"), "doc_id", "text", K)
      val pairs = Dedup.candidatePairs(
        Dedup.bandKeys(sig, "doc_id", B, R), "doc_id")
      val edges = pairs.select(col("id_a").as("a"), col("id_b").as("b"))
        .unionAll(pairs.select(col("id_b").as("a"), col("id_a").as("b")))
        // edges feeds all 3 rounds; materialize the banded derivation
        // once (the pagerank_dups A/B showed AQE stage reuse covers
        // this at fixture scale, but the label joins below alternate
        // sides, which defeats reuse — measured neutral-to-better)
        .localCheckpoint(true)
      lpaLabels(edges)
        .select(col("node").as("doc_id"), col("lbl").as("community"))
        .orderBy("doc_id")
    },

    // CLUSTER-SIZE HISTOGRAM — the "how big are my duplicate
    // families" census (dup_degree profiles NODES, this profiles
    // FAMILIES): component size -> family count over the CC
    // partition, plus the member mass per size. The shape to watch
    // across snapshots: a growing tail means boilerplate families
    // are coalescing and the banding parameters (or a hot-bucket
    // cap) need review. Two cascaded bounded aggregates over the
    // component labels; nothing larger than the pair graph moves.
    Q("cluster_size_histogram",
      s"""${minhashCte.replaceFirst("^WITH ", "WITH RECURSIVE ")},
         |$bandsCte,
         |pairs AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
         |          FROM bands x JOIN bands y ON x.band = y.band AND x.doc_id < y.doc_id),
         |edges AS (SELECT d1 AS a, d2 AS b FROM pairs
         |          UNION SELECT d2, d1 FROM pairs),
         |reach AS (SELECT a, b FROM edges
         |          UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         |lbl AS (SELECT a AS doc_id, least(a, MIN(b)) AS cluster_id
         |        FROM reach GROUP BY a),
         |cs AS (SELECT cluster_id, COUNT(*) AS sz FROM lbl GROUP BY 1)
         |SELECT sz AS cluster_size, COUNT(*) AS n_clusters,
         |  CAST(sz * COUNT(*) AS BIGINT) AS n_docs
         |FROM cs GROUP BY sz ORDER BY cluster_size""".stripMargin) { (s, dir) =>
      val sig = Dedup.minhashFromText(
        Tables.load(s, dir, "documents"), "doc_id", "text", K)
      val pairs = Dedup.candidatePairs(
        Dedup.bandKeys(sig, "doc_id", B, R), "doc_id")
      Dedup.connectedComponents(pairs, "id_a", "id_b")
        .groupBy("cluster_id").agg(count(lit(1)).as("sz"))
        .groupBy("sz").agg(count(lit(1)).as("n_clusters"))
        .select(col("sz").as("cluster_size"), col("n_clusters"),
          (col("sz") * col("n_clusters")).as("n_docs"))
        .orderBy("cluster_size")
    },

    // NEWMAN MODULARITY of both graph partitions (Newman & Girvan
    // '04): Q = Σ_c [e_c/m − (d_c/2m)²] — the single number that
    // says whether a partition cuts the near-dup graph at its thin
    // edges (Q near 0: no better than random; higher: denser inside
    // communities than chance). Scoring BOTH partitions from one
    // edge derivation makes the CC-vs-LPA choice (and any future
    // community algorithm) an empirical comparison instead of a
    // taste call. All inputs are integer censuses (m, per-community
    // edge and degree sums); per-community terms round to 6 dp and
    // sum as DECIMAL. The frame never exceeds the pair graph.
    Q("graph_modularity",
      s"""${minhashCte.replaceFirst("^WITH ", "WITH RECURSIVE ")},
         |$bandsCte,
         |pairs AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
         |          FROM bands x JOIN bands y ON x.band = y.band AND x.doc_id < y.doc_id),
         |edges AS (SELECT d1 AS a, d2 AS b FROM pairs
         |          UNION SELECT d2, d1 FROM pairs),
         |$lpaCtes,
         |reach AS (SELECT a, b FROM edges
         |          UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         |cc AS (SELECT a AS node, least(a, MIN(b)) AS com FROM reach GROUP BY a),
         |asn AS (SELECT 'cc' AS method, node, com FROM cc
         |        UNION ALL SELECT 'lpa', node, lbl FROM l3),
         |me AS (SELECT COUNT(*) AS m FROM pairs),
         |deg AS (SELECT a AS node, COUNT(*) AS d FROM edges GROUP BY 1),
         |intra AS (SELECT x.method, x.com, COUNT(*) AS ec
         |          FROM pairs p JOIN asn x ON p.d1 = x.node
         |            JOIN asn y ON p.d2 = y.node AND x.method = y.method
         |              AND x.com = y.com
         |          GROUP BY 1, 2),
         |degc AS (SELECT method, com, CAST(SUM(d) AS BIGINT) AS dc
         |         FROM asn JOIN deg USING (node) GROUP BY 1, 2),
         |terms AS (SELECT method, degc.com,
         |    CAST(round(CAST(COALESCE(ec, 0) AS DOUBLE) / m
         |      - (CAST(dc AS DOUBLE) / (2 * m)) * (CAST(dc AS DOUBLE) / (2 * m)), 6)
         |      AS DECIMAL(20,6)) AS t
         |  FROM degc LEFT JOIN intra USING (method, com) CROSS JOIN me)
         |SELECT method, COUNT(*) AS n_communities,
         |  (SELECT m FROM me) AS n_edges,
         |  round(CAST(SUM(t) AS DOUBLE), 6) AS modularity
         |FROM terms GROUP BY method ORDER BY method""".stripMargin) { (s, dir) =>
      val sig = Dedup.minhashFromText(
        Tables.load(s, dir, "documents"), "doc_id", "text", K)
      val pairs = Dedup.candidatePairs(
        Dedup.bandKeys(sig, "doc_id", B, R), "doc_id")
        .select(col("id_a").as("d1"), col("id_b").as("d2"))
        .localCheckpoint(true) // feeds edges, both partitions, intra
      val edges = pairs.select(col("d1").as("a"), col("d2").as("b"))
        .unionAll(pairs.select(col("d2").as("a"), col("d1").as("b")))
      val cc = Dedup.connectedComponents(
          pairs.select(col("d1").as("id_a"), col("d2").as("id_b")),
          "id_a", "id_b")
        .select(col("id").as("node"), col("cluster_id").as("com"))
      val lpa = lpaLabels(edges)
        .select(col("node"), col("lbl").as("com"))
      val asn = cc.select(lit("cc").as("method"), col("node"), col("com"))
        .unionAll(lpa.select(lit("lpa").as("method"), col("node"), col("com")))
        .localCheckpoint(true) // joined twice by intra + once by degc
      val me = pairs.agg(count(lit(1)).as("m"))
      val deg = edges.groupBy(col("a").as("node")).agg(count(lit(1)).as("d"))
      val intra = pairs
        .join(asn.as("x"), col("d1") === col("x.node"))
        .join(asn.as("y"), col("d2") === col("y.node") &&
          col("x.method") === col("y.method") && col("x.com") === col("y.com"))
        .groupBy(col("x.method").as("method"), col("x.com").as("com"))
        .agg(count(lit(1)).as("ec"))
      val degc = asn.join(deg, Seq("node"))
        .groupBy("method", "com").agg(sum(col("d")).as("dc"))
      val half = col("dc").cast("double") / (lit(2) * col("m"))
      degc.join(intra, Seq("method", "com"), "left")
        .na.fill(0L, Seq("ec"))
        .crossJoin(broadcast(me))
        .select(col("method"),
          round(col("ec").cast("double") / col("m") - half * half, 6)
            .cast(DecimalType(20, 6)).as("t"))
        .groupBy("method")
        .agg(count(lit(1)).as("n_communities"),
          round(sum(col("t")).cast("double"), 6).as("modularity"))
        .crossJoin(broadcast(me.select(col("m").as("n_edges"))))
        .select("method", "n_communities", "n_edges", "modularity")
        .orderBy("method")
    },

    // keep-list RESOLUTION — the decision step that turns clusters
    // into an actionable dedup: every document gets its cluster (its
    // connected-component label; singletons are their own cluster)
    // and a keep/drop verdict, keeping the longest document per
    // cluster (ties to the lowest doc_id). Representative choice uses
    // the pre-computed n_chars column, so document BODIES never
    // shuffle: the component labels join on doc_id and the
    // representative window shuffles (doc_id, cluster, n_chars)
    // triples only. At 100 TB the emitted keep-list is what the next
    // pipeline stage anti-joins against — the reason it covers ALL
    // docs, not just clustered ones.
    Q("dedup_keep_list",
      s"""${minhashCte.replaceFirst("^WITH ", "WITH RECURSIVE ")},
         |$bandsCte,
         |pairs AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
         |          FROM bands x JOIN bands y ON x.band = y.band AND x.doc_id < y.doc_id),
         |edges AS (SELECT d1 AS a, d2 AS b FROM pairs
         |          UNION SELECT d2, d1 FROM pairs),
         |reach AS (SELECT a, b FROM edges
         |          UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         |lbl AS (SELECT a AS doc_id, least(a, MIN(b)) AS cluster_id
         |        FROM reach GROUP BY a),
         |alld AS (SELECT d.doc_id, COALESCE(l.cluster_id, d.doc_id) AS cluster,
         |         d.n_chars FROM documents d LEFT JOIN lbl l USING (doc_id)),
         |r AS (SELECT doc_id, cluster, row_number() OVER (
         |        PARTITION BY cluster ORDER BY n_chars DESC, doc_id) AS rn FROM alld)
         |SELECT doc_id, cluster, rn = 1 AS keep FROM r ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.load(s, dir, "documents").select("doc_id", "n_chars")
      val sig = Dedup.minhashFromText(
        Tables.load(s, dir, "documents"), "doc_id", "text", K)
      val pairs = Dedup.candidatePairs(
        Dedup.bandKeys(sig, "doc_id", B, R), "doc_id")
      val cl = Dedup.connectedComponents(pairs, "id_a", "id_b")
        .select(col("id").as("doc_id"), col("cluster_id"))
      val w = Window.partitionBy("cluster")
        .orderBy(col("n_chars").desc, col("doc_id"))
      docs.join(cl, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster_id"), col("doc_id")).as("cluster"),
          col("n_chars"))
        .withColumn("keep", row_number().over(w) === 1)
        .select("doc_id", "cluster", "keep")
        .orderBy("doc_id")
    },

    // INCREMENTAL dedup — the daily production shape: a new batch of
    // documents screened against the signature store of the existing
    // corpus, not a whole-corpus self-join. The corpus/batch split is
    // the same deterministic hash as train_split (bucket >= 90 = the
    // ~10% "new arrivals"); the store is the DISTINCT minhash band-key
    // set of the corpus (at scale: a persisted table WRITTEN
    // PARTITIONED/BUCKETED BY band, so a daily probe shuffles only the
    // batch — see SCALE.md); a batch doc is a duplicate CANDIDATE iff
    // any of its B band keys hits the store. The probe is a
    // shuffle-hash join with the (increment-sized) batch side as
    // build — the store streams, nothing corpus-sized is broadcast or
    // held per task.
    Q("dedup_incremental", {
      val h = duckH32("CAST(doc_id AS VARCHAR)")
      s"""$minhashCte,
         |$bandsCte,
         |tagged AS (SELECT doc_id, $h % 100 AS bucket FROM documents),
         |store AS (SELECT DISTINCT band FROM bands JOIN tagged USING (doc_id)
         |          WHERE bucket < 90),
         |bb AS (SELECT bands.doc_id, band FROM bands JOIN tagged USING (doc_id)
         |       WHERE bucket >= 90),
         |hits AS (SELECT bb.doc_id, COUNT(*) AS n_hit_bands
         |         FROM bb JOIN store USING (band) GROUP BY bb.doc_id)
         |SELECT t.doc_id, COALESCE(h.n_hit_bands, 0) AS n_hit_bands,
         |  COALESCE(h.n_hit_bands, 0) > 0 AS dup_candidate
         |FROM tagged t LEFT JOIN hits h USING (doc_id)
         |WHERE t.bucket >= 90 ORDER BY t.doc_id""".stripMargin
    }) { (s, dir) =>
      val bucket = h32(col("doc_id").cast("string")) % 100
      val docs = Tables.load(s, dir, "documents").select("doc_id", "text")
      // ONE shingle->minhash->band pipeline over the whole table,
      // bucket-tagged (the split key derives from doc_id, no join
      // back) and materialized once — separate corpus/batch pipelines
      // would scan and re-shingle the documents twice. Mirrors the
      // oracle's shared bands/tagged CTEs.
      val allBands = incrementalBands(s, dir).localCheckpoint(false)
      // the signature store: novelty only needs band-key MEMBERSHIP,
      // so distinct band keys — not (band, doc) — is the stored set
      val store = allBands.filter(col("bucket") < 90).select("band").distinct()
      val batchBands = allBands.filter(col("bucket") >= 90)
        .select("doc_id", "band")
      // store and batch are both unique per band (store by distinct,
      // batch by the band-index prefix), so count(1) = hit-band count
      val hits = store.join(batchBands.hint("shuffle_hash"), Seq("band"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_hit_bands"))
      // batch doc list comes from the TABLE, not the band frame: a doc
      // too short to shingle has no bands but is still a (novel) batch doc
      docs.select(col("doc_id")).filter(bucket >= 90)
        .join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_hit_bands"), lit(0L)).as("n_hit_bands"),
          (coalesce(col("n_hit_bands"), lit(0L)) > 0).as("dup_candidate"))
        .orderBy("doc_id")
    },

    // Edit-distance VERIFICATION of the MinHash candidates — the
    // recall/precision split of a production near-dup pipeline: LSH
    // banding proposes (recall, bounded pair count by design),
    // thresholded Levenshtein disposes (precision). Spark's 3-arg
    // levenshtein bounds each pair to O(len × threshold) work and
    // returns -1 past the bound (the filter keeps 0..T — identical set
    // to DuckDB's unbounded levenshtein <= T). Texts reach the verify
    // join by shuffle keyed on each pair side; candidate pairs are the
    // build side — nothing corpus-sized is broadcast or rescanned.
    Q("dedup_edit_verify", {
      val T = 32
      s"""$minhashCte,
         |$bandsCte,
         |pairs AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
         |          FROM bands x JOIN bands y ON x.band = y.band AND x.doc_id < y.doc_id)
         |SELECT d1 AS doc_id_1, d2 AS doc_id_2,
         |  levenshtein(a.text, b.text) AS edit_dist
         |FROM pairs JOIN documents a ON d1 = a.doc_id
         |           JOIN documents b ON d2 = b.doc_id
         |WHERE levenshtein(a.text, b.text) <= $T
         |ORDER BY doc_id_1, doc_id_2""".stripMargin
    }) { (s, dir) =>
      val T = 32
      val docs = Tables.load(s, dir, "documents")
      val sig = Dedup.minhashFromText(docs, "doc_id", "text", K)
      val pairs = Dedup.candidatePairs(Dedup.bandKeys(sig, "doc_id", B, R), "doc_id")
      pairs.hint("shuffle_hash")
        .join(docs.select(col("doc_id").as("id_a"), col("text").as("ta")), "id_a")
        .hint("shuffle_hash")
        .join(docs.select(col("doc_id").as("id_b"), col("text").as("tb")), "id_b")
        .select(col("id_a").as("doc_id_1"), col("id_b").as("doc_id_2"),
          levenshtein(col("ta"), col("tb"), T).as("edit_dist"))
        .filter(col("edit_dist") >= 0)
        .orderBy("doc_id_1", "doc_id_2")
    },

    // 16-bit SimHash fingerprints over the token set
    Q("dedup_simhash", {
      val ws = (0 until 16)
        .map(j => s"sum(((h >> $j) & 1) * 2 - 1) AS w$j").mkString(", ")
      val bits = (0 until 16)
        .map(j => s"(CASE WHEN w$j > 0 THEN ${1L << j} ELSE 0 END)").mkString(" + ")
      s"""WITH tok AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
         |             FROM documents),
         |h AS (SELECT doc_id, ${duckH32(0, "tok")} AS h FROM tok),
         |w AS (SELECT doc_id, $ws FROM h GROUP BY doc_id)
         |SELECT doc_id, $bits AS simhash FROM w ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      Dedup.simhash(Tables.load(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    },

    // SimHash NEAR-dup pair search with a pigeonhole guarantee: a
    // 32-bit fingerprint over the SHINGLE set (token-set simhash
    // saturates on a 31-word vocabulary — every long doc holds every
    // token and all fingerprints tie; shingle features keep ~30k
    // distinct values and stay discriminative) split into 4 byte
    // bands — any pair with Hamming distance <= 3 differs in at most
    // 3 bands, so it MUST collide on at least one (band, byte)
    // bucket; candidates from bucket grouping (in-bucket expansion,
    // same shape as MinHash candidatePairs — never an all-pairs
    // join), then EXACT verify via bit_count(xor) <= 3 on the two
    // ints. The whole verify payload is one int per doc: at 100 TB
    // the pair scan touches 20 bytes/pair. Completeness is structural
    // (pigeonhole), not probabilistic — unlike MinHash banding.
    Q("dedup_simhash_pairs", {
      val ws = (0 until 32)
        .map(j => s"sum(((h >> $j) & 1) * 2 - 1) AS w$j").mkString(", ")
      val bits = (0 until 32)
        .map(j => s"(CASE WHEN w$j > 0 THEN ${1L << j} ELSE 0 END)").mkString(" + ")
      s"""$shingleCtes,
         |hh AS (SELECT doc_id, ${duckH32(0, "shingle")} AS h FROM dsh),
         |w AS (SELECT doc_id, $ws FROM hh GROUP BY doc_id),
         |sg AS (SELECT doc_id, $bits AS simhash FROM w),
         |bb AS (SELECT doc_id, simhash, unnest(generate_series(0, 3)) AS band FROM sg),
         |k AS (SELECT doc_id, simhash, band,
         |        (simhash >> (band * 8)) & 255 AS nib FROM bb),
         |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
         |           a.simhash AS h1, b.simhash AS h2
         |         FROM k a JOIN k b ON a.band = b.band AND a.nib = b.nib
         |           AND a.doc_id < b.doc_id)
         |SELECT d1 AS doc_id_1, d2 AS doc_id_2,
         |  CAST(bit_count(xor(h1, h2)) AS BIGINT) AS hamming
         |FROM cand WHERE bit_count(xor(h1, h2)) <= 3
         |ORDER BY doc_id_1, doc_id_2""".stripMargin
    }) { (s, dir) =>
      val sh = Dedup.simhashOf(
        Dedup.distinctShingles(Tables.load(s, dir, "documents")
          .select("doc_id", "text"), "doc_id", "text"),
        "doc_id", "shingle", 32)
      val keyed = sh.select(col("doc_id"), col("simhash"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"),
            shiftright(col("simhash"), b * 8).bitwiseAND(lit(255L)).as("nib"))): _*))
          .as("bk"))
        .select(col("doc_id"), col("simhash"),
          col("bk.band").as("band"), col("bk.nib").as("nib"))
      Dedup.bucketPairs(keyed, Seq(col("band"), col("nib")),
          struct(col("doc_id"), col("simhash")))
        .select(col("a.doc_id").as("doc_id_1"), col("b.doc_id").as("doc_id_2"),
          bit_count(col("a.simhash").bitwiseXOR(col("b.simhash")))
            .cast("long").as("hamming"))
        .filter(col("hamming") <= 3)
        .distinct()
        .orderBy("doc_id_1", "doc_id_2")
    },

    // blocked n-gram Jaccard: pairs sharing >=1 shingle within
    // (lang, length-bucket) blocks, with exact Jaccard over shingle sets
    // Prefix-filtered exact set-similarity self-join (the PPJoin-family
    // complement to LSH/blocking): order each doc's shingle set by
    // GLOBAL rarity (freq asc, shingle asc — any consistent total order
    // is correct; rarity minimizes candidates), keep only the first
    // n - ceil(t*n) + 1 shingles as the doc's PREFIX, and generate
    // candidates from prefix-shingle collisions. The prefix-filtering
    // theorem guarantees every pair with Jaccard >= t shares at least
    // one prefix token, so exact verification of the candidates equals
    // the all-pairs result — which is exactly what the oracle computes
    // brute-force. Verification joins the (pairs << all-pairs)
    // candidate set against per-doc sorted shingle arrays and scores
    // via array_intersect. PrefixFilterSpec pins candidates ⊇ result
    // and the candidate-vs-all-pairs reduction.
    Q("dedup_prefix_jaccard",
      s"""$shingleCtes,
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM dsh GROUP BY 1),
         |p AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
         |      FROM dsh a JOIN dsh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |      GROUP BY 1, 2)
         |SELECT d1 AS doc_id_1, d2 AS doc_id_2,
         |  round(inter * 1.0 / (x.n + y.n - inter), 6) AS jaccard
         |FROM p JOIN sz x ON d1 = x.doc_id JOIN sz y ON d2 = y.doc_id
         |WHERE inter * 1.0 / (x.n + y.n - inter) >= 0.5
         |ORDER BY doc_id_1, doc_id_2""".stripMargin) { (s, dir) =>
      PrefixJaccard.run(s, dir, 0.5)
    },

    Q("dedup_ngram_jaccard",
      s"""$shingleCtes,
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM dsh GROUP BY doc_id),
         |meta AS (SELECT doc_id, lang, n_chars // 50 AS bk FROM documents),
         |ds AS (SELECT dsh.doc_id, shingle, lang, bk FROM dsh JOIN meta ON dsh.doc_id = meta.doc_id),
         |p AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
         |      FROM ds a JOIN ds b ON a.shingle = b.shingle AND a.lang = b.lang
         |        AND a.bk = b.bk AND a.doc_id < b.doc_id
         |      GROUP BY 1, 2)
         |SELECT p.d1 AS doc_id_1, p.d2 AS doc_id_2,
         |  round(inter * 1.0 / (x.n + y.n - inter), 6) AS jaccard
         |FROM p JOIN sz x ON p.d1 = x.doc_id JOIN sz y ON p.d2 = y.doc_id
         |ORDER BY doc_id_1, doc_id_2""".stripMargin) { (s, dir) =>
      // Single linear pipeline — no self-join (which would recompute
      // the whole shingle subtree per side) and no size-lookup joins:
      // per-doc set sizes ride along inside the bucket structs, and the
      // pair space is expanded in-bucket exactly like MinHash
      // candidatePairs. meta is broadcast (tiny dimension projection).
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.load(s, dir, "documents")
      val dsh = Dedup.distinctShingles(docs, "doc_id", "text")
        .withColumn("n", count(lit(1)).over(Window.partitionBy("doc_id")))
      val meta = docs.select(col("doc_id"), col("lang"), expr("n_chars div 50").as("bk"))
      dsh.join(broadcast(meta), "doc_id")
        .groupBy("shingle", "lang", "bk")
        .agg(sort_array(collect_set(struct(col("doc_id"), col("n")))).as("xs"))
        .filter(size(col("xs")) > 1)
        .select(explode(flatten(transform(col("xs"), (x, i) =>
          transform(slice(col("xs"), i + 2, size(col("xs"))),
            y => struct(x.as("a"), y.as("b")))))).as("p"))
        // sort_array orders structs by doc_id, so p.a.doc_id < p.b.doc_id
        .groupBy(
          col("p.a.doc_id").as("d1"), col("p.b.doc_id").as("d2"),
          col("p.a.n").as("na"), col("p.b.n").as("nb"))
        .agg(count(lit(1)).as("inter"))
        .select(col("d1").as("doc_id_1"), col("d2").as("doc_id_2"),
          round(col("inter") * lit(1.0) / (col("na") + col("nb") - col("inter")), 6)
            .as("jaccard"))
        .orderBy("doc_id_1", "doc_id_2")
    },

    // ASYMMETRIC containment — the one-sided near-dup measure Jaccard
    // misses: a short document wholly contained in a long one scores
    // inter/|short| ~ 1.0 while its Jaccard stays low. This is the
    // quote/boilerplate/subset-page detector real corpus curation runs
    // NEXT TO symmetric dedup. Same single-pipeline shape as
    // dedup_ngram_jaccard (sizes ride inside the bucket structs;
    // in-bucket pair expansion; no self-join), but deliberately NOT
    // its length-bucket blocking — equal-length blocking would
    // exclude exactly the short-in-long pairs this query exists to
    // find. The scale guard is instead a shingle document-frequency
    // cap (<= MaxContDf, the dup_spans pattern): corpus-wide
    // boilerplate shingles are not containment evidence AND would be
    // the hot-key quadratic, so the measure is defined over the
    // informative-shingle space — BOTH the intersections and the
    // per-doc sizes count only shingles with df <= MaxContDf, keeping
    // numerator and denominator in the same space.
    Q("dedup_containment",
      s"""$shingleCtes,
         |df AS (SELECT shingle, COUNT(*) AS f FROM dsh GROUP BY 1),
         |kept AS (SELECT doc_id, dsh.shingle FROM dsh JOIN df ON dsh.shingle = df.shingle
         |         WHERE f <= $MaxContDf),
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM kept GROUP BY doc_id),
         |meta AS (SELECT doc_id, lang FROM documents),
         |ds AS (SELECT kept.doc_id, shingle, lang, n
         |       FROM kept JOIN meta ON kept.doc_id = meta.doc_id
         |       JOIN sz ON kept.doc_id = sz.doc_id),
         |p AS (SELECT a.doc_id AS d1, b.doc_id AS d2, a.n AS na, b.n AS nb,
         |        COUNT(*) AS inter
         |      FROM ds a JOIN ds b ON a.shingle = b.shingle AND a.lang = b.lang
         |        AND a.doc_id < b.doc_id
         |      GROUP BY 1, 2, 3, 4)
         |SELECT d1 AS doc_id_1, d2 AS doc_id_2,
         |  round(inter * 1.0 / na, 6) AS cont_1_in_2,
         |  round(inter * 1.0 / nb, 6) AS cont_2_in_1
         |FROM p
         |WHERE inter * 1.0 / na >= 0.6 OR inter * 1.0 / nb >= 0.6
         |ORDER BY doc_id_1, doc_id_2""".stripMargin) { (s, dir) =>
      Dedup.containmentPairs(Tables.load(s, dir, "documents"), MaxContDf)
        .orderBy("doc_id_1", "doc_id_2")
    },

    // Split-leakage audit — the DECONTAMINATION closure of dedup +
    // train_split: a near-dup cluster whose members land in different
    // splits leaks training text into eval. Clusters come from the
    // same banded pipeline as dedup_clusters; the split is a PURE
    // FUNCTION of doc_id (train_split's h32 rule), so the audit needs
    // NO join against the corpus — label the pair-graph nodes
    // directly and aggregate per cluster. Output: only the leaking
    // clusters, with per-split member counts. At 100 TB the frame
    // entering the audit is the pair graph (banding-bounded), never
    // the corpus.
    Q("split_leakage_audit",
      s"""${minhashCte.replaceFirst("^WITH ", "WITH RECURSIVE ")},
         |$bandsCte,
         |pairs AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
         |          FROM bands x JOIN bands y ON x.band = y.band AND x.doc_id < y.doc_id),
         |edges AS (SELECT d1 AS a, d2 AS b FROM pairs
         |          UNION SELECT d2, d1 FROM pairs),
         |reach AS (SELECT a, b FROM edges
         |          UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         |lbl AS (SELECT a AS doc_id, least(a, MIN(b)) AS cluster_id
         |        FROM reach GROUP BY a),
         |spl AS (SELECT doc_id, cluster_id,
         |    CASE WHEN ${duckH32("CAST(doc_id AS VARCHAR)")} % 100 < 80 THEN 'train'
         |         WHEN ${duckH32("CAST(doc_id AS VARCHAR)")} % 100 < 90 THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM lbl)
         |SELECT cluster_id, COUNT(*) AS n_docs,
         |  COUNT(CASE WHEN split = 'train' THEN 1 END) AS n_train,
         |  COUNT(CASE WHEN split = 'val' THEN 1 END) AS n_val,
         |  COUNT(CASE WHEN split = 'test' THEN 1 END) AS n_test
         |FROM spl GROUP BY cluster_id HAVING COUNT(DISTINCT split) > 1
         |ORDER BY cluster_id""".stripMargin) { (s, dir) =>
      val sig = Dedup.minhashFromText(Tables.load(s, dir, "documents"), "doc_id", "text", K)
      val pairs = Dedup.candidatePairs(Dedup.bandKeys(sig, "doc_id", B, R), "doc_id")
      val bucket = h32(col("id").cast("string")) % 100
      Dedup.connectedComponents(pairs, "id_a", "id_b")
        .select(col("id"), col("cluster_id"),
          when(bucket < 80, "train").when(bucket < 90, "val")
            .otherwise("test").as("split"))
        .groupBy("cluster_id")
        .agg(count(lit(1)).as("n_docs"),
          count(when(col("split") === "train", 1)).as("n_train"),
          count(when(col("split") === "val", 1)).as("n_val"),
          count(when(col("split") === "test", 1)).as("n_test"),
          countDistinct(col("split")).as("nspl"))
        .filter(col("nspl") > 1)
        .drop("nspl")
        .orderBy("cluster_id")
    },

    // embedding near-dup: IVF-centroid blocks, cosine >= 0.2 in-block.
    // Blocking on a DATA column (round 2 used `label`) leaves block
    // sizes at the mercy of the corpus — a skewed or low-cardinality
    // column makes one block quadratic in corpus size. The 8
    // md5-derived coarse centroids (same construction proven
    // oracle-portable in `ann_ivf`) bound block sizes BY DESIGN:
    // assignment splits the sphere into K cells, K scales with the
    // corpus, and truly-similar vectors co-assign by construction.
    // Norms are precomputed once per vector BEFORE the pair join (the
    // naive per-pair recompute tripled the benchmark cost).
    Q("dedup_embedding", {
      def sums(x: String, y: String) =
        s"list_sum(list_transform(generate_series(1, $Dim), i -> CAST($x.embedding[i] AS DOUBLE) * $y.embedding[i]))"
      s"""WITH e0 AS (SELECT vec_id, embedding, $duckCentroidSims,
         |    sqrt(${sums("embeddings", "embeddings")}) AS nrm FROM embeddings),
         |e AS (SELECT vec_id, embedding, nrm, $duckCentroidCase AS cl FROM e0),
         |p AS (SELECT a.vec_id AS v1, b.vec_id AS v2,
         |    ${sums("a", "b")} AS dp, a.nrm AS na, b.nrm AS nb
         |  FROM e a JOIN e b ON a.cl = b.cl AND a.vec_id < b.vec_id)
         |SELECT v1 AS vec_id_1, v2 AS vec_id_2, round(dp / (na * nb), 6) AS cos_sim
         |FROM p WHERE round(dp / (na * nb), 6) >= 0.2
         |ORDER BY vec_id_1, vec_id_2""".stripMargin
    }) { (s, dir) =>
      import graft.ops.Similarity
      val e = embeddingBlocks(Tables.load(s, dir, "embeddings"))
        .select(col("vec_id"), col("cl"), col("embedding"),
          Similarity.norm(col("embedding")).as("nrm"))
      // spread the streamed side across cores: the pair join inflates
      // rows ~|block| times and the dot products are the real work
      val par = s.sparkContext.defaultParallelism
      val a = e.repartition(par, col("vec_id"))
        .select(col("vec_id").as("v1"), col("cl"),
          col("embedding").as("ea"), col("nrm").as("na"))
      val b = e.select(col("vec_id").as("v2"), col("cl"),
        col("embedding").as("eb"), col("nrm").as("nb"))
      a.join(b, "cl").filter(col("v1") < col("v2"))
        .select(col("v1").as("vec_id_1"), col("v2").as("vec_id_2"),
          round(Similarity.dot(col("ea"), col("eb")) / (col("na") * col("nb")), 6)
            .as("cos_sim"))
        .filter(col("cos_sim") >= 0.2)
        .orderBy("vec_id_1", "vec_id_2")
    },

    // Cross-source near-dup overlap matrix — the corpus-curation audit
    // that tells you WHICH crawls duplicate each other (a mirror pair
    // shows up as a hot off-diagonal cell; a self-heavy cell means
    // within-crawl boilerplate). Rides entirely on the minhash band
    // pipeline: candidate pairs come out small (banded, never
    // all-pairs), so the pair->source decoration broadcasts the PAIRS
    // and streams the corpus — never the reverse. The (least, greatest)
    // normalization makes the matrix triangular regardless of pair
    // orientation.
    Q("source_overlap",
      s"""$minhashCte,
         |$bandsCte,
         |prs AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |  FROM bands x JOIN bands y ON x.band = y.band AND x.doc_id < y.doc_id),
         |ss AS (SELECT da.source AS sa, db.source AS sb
         |  FROM prs JOIN documents da ON da.doc_id = prs.a
         |  JOIN documents db ON db.doc_id = prs.b)
         |SELECT least(sa, sb) AS source_a, greatest(sa, sb) AS source_b,
         |  COUNT(*) AS n_pairs
         |FROM ss GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val sig = Dedup.minhashFromText(docs, "doc_id", "text", K)
      val pairs = Dedup.candidatePairs(Dedup.bandKeys(sig, "doc_id", B, R), "doc_id")
      val srcs = docs.select("doc_id", "source")
      // BOTH decoration joins broadcast the pair-derived side: after
      // the first join Catalyst's size estimate for the tagged frame
      // inflates past the broadcast threshold while srcs has accurate
      // scan stats, so an unhinted second join would broadcast the
      // CORPUS (or sort-merge it at scale) — the exact reverse of the
      // contract
      val tagged = srcs
        .join(broadcast(pairs), col("doc_id") === col("id_a"))
        .select(col("source").as("sa"), col("id_b"))
      val both = srcs
        .join(broadcast(tagged), col("doc_id") === col("id_b"))
        .select(col("sa"), col("source").as("sb"))
      both
        .groupBy(least(col("sa"), col("sb")).as("source_a"),
          greatest(col("sa"), col("sb")).as("source_b"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("source_a", "source_b")
    },

    // degree assortativity of the near-dup graph (Newman's r): the
    // Pearson correlation of endpoint degrees across edges. Negative r
    // = hub-and-spoke boilerplate families (templates linked to many
    // singletons); positive r = cliquey mirror clusters — which one
    // decides whether pairwise dedup or clustering pays. Rides the
    // banded pair pipeline; degrees and the moment census are exact
    // integers, the correlation is one guarded double expression.
    Q("graph_assortativity",
      s"""$minhashCte,
         |$bandsCte,
         |prs AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
         |  FROM bands x JOIN bands y ON x.band = y.band AND x.doc_id < y.doc_id),
         |edges AS (SELECT d1 AS a, d2 AS b FROM prs UNION ALL SELECT d2, d1 FROM prs),
         |deg AS (SELECT a AS id, COUNT(*) AS dg FROM edges GROUP BY 1),
         |de AS (SELECT da.dg AS dx, db.dg AS dy FROM edges e
         |  JOIN deg da ON e.a = da.id JOIN deg db ON e.b = db.id),
         |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS mm,
         |    CAST(SUM(dx) AS BIGINT) AS sx, CAST(SUM(dy) AS BIGINT) AS sy,
         |    CAST(SUM(dx * dy) AS BIGINT) AS sxy,
         |    CAST(SUM(dx * dx) AS BIGINT) AS sxx,
         |    CAST(SUM(dy * dy) AS BIGINT) AS syy FROM de)
         |SELECT mm AS n_edges,
         |  CASE WHEN mm * sxx - sx * sx > 0 AND mm * syy - sy * sy > 0
         |    THEN round((CAST(mm AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
         |      / sqrt((CAST(mm AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
         |           * (CAST(mm AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6)
         |    END AS assortativity
         |FROM m""".stripMargin) { (s, dir) =>
      val sig = Dedup.minhashFromText(
        Tables.load(s, dir, "documents"), "doc_id", "text", K)
      val pairs = Dedup.candidatePairs(Dedup.bandKeys(sig, "doc_id", B, R), "doc_id")
      val edges = pairs.select(col("id_a").as("a"), col("id_b").as("b"))
        .unionAll(pairs.select(col("id_b").as("a"), col("id_a").as("b")))
        .localCheckpoint(true) // banding-bounded; feeds degrees AND the decoration
      val deg = edges.groupBy(col("a").as("id")).agg(count(lit(1)).as("dg"))
      val de = edges
        .join(broadcast(deg.select(col("id").as("ida"), col("dg").as("dx"))),
          col("a") === col("ida"))
        .join(broadcast(deg.select(col("id").as("idb"), col("dg").as("dy"))),
          col("b") === col("idb"))
      val m = de.agg(count(lit(1)).cast("long").as("mm"),
        sum(col("dx")).cast("long").as("sx"), sum(col("dy")).cast("long").as("sy"),
        sum(col("dx") * col("dy")).cast("long").as("sxy"),
        sum(col("dx") * col("dx")).cast("long").as("sxx"),
        sum(col("dy") * col("dy")).cast("long").as("syy"))
      val (mm, sx, sy) = (col("mm"), col("sx"), col("sy"))
      m.select(mm.as("n_edges"),
        when(mm * col("sxx") - sx * sx > 0 && mm * col("syy") - sy * sy > 0,
          round((mm.cast("double") * col("sxy") - sx.cast("double") * sy)
            / sqrt((mm.cast("double") * col("sxx") - sx.cast("double") * sx)
              * (mm.cast("double") * col("syy") - sy.cast("double") * sy)), 6))
          .as("assortativity"))
    },

    // K-CORE PEEL (k=2, 3 unrolled rounds) over the near-dup candidate
    // graph: repeatedly remove degree-<2 nodes, so pendant pairs fall
    // away and what remains is the densely-linked template CORE — the
    // part of the dup graph worth clustering rather than pairwise
    // dedup. Fixed unrolled iterations (the pagerank_dups discipline:
    // DuckDB cannot loop, and bounded rounds need no lineage
    // truncation); each round is an integer degree census + two
    // broadcast semi-joins against the (census-sized) keep set.
    // 100 TB: edges are banding-bounded, keep sets only shrink, and
    // the per-round cost is one groupBy + one hash join on `a`.
    Q("kcore_peel", {
      val peelCtes = (1 to 3).map { i =>
        s"""d$i AS (SELECT a, COUNT(*) AS deg FROM e${i - 1} GROUP BY 1),
           |k$i AS (SELECT a FROM d$i WHERE deg >= 2),
           |e$i AS (SELECT e.a, e.b FROM e${i - 1} e
           |        JOIN k$i x ON e.a = x.a JOIN k$i y ON e.b = y.a)""".stripMargin
      }.mkString(",\n")
      s"""$minhashCte,
         |$bandsCte,
         |pairs AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
         |          FROM bands x JOIN bands y ON x.band = y.band AND x.doc_id < y.doc_id),
         |e0 AS (SELECT d1 AS a, d2 AS b FROM pairs
         |       UNION ALL SELECT d2, d1 FROM pairs),
         |$peelCtes
         |SELECT a AS doc_id, COUNT(*) AS degree FROM e3
         |GROUP BY 1 ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      val sig = Dedup.minhashFromText(
        Tables.load(s, dir, "documents"), "doc_id", "text", K)
      val pairs = Dedup.candidatePairs(Dedup.bandKeys(sig, "doc_id", B, R), "doc_id")
      var e = pairs.select(col("id_a").as("a"), col("id_b").as("b"))
        .unionAll(pairs.select(col("id_b").as("a"), col("id_a").as("b")))
        .localCheckpoint(true) // banding-bounded; feeds all three rounds
      for (_ <- 1 to 3) {
        val keep = e.groupBy("a").agg(count(lit(1)).as("deg"))
          .filter(col("deg") >= 2).select("a")
        e = e.join(broadcast(keep), "a")
          .join(broadcast(keep.toDF("b")), "b")
          .select("a", "b")
      }
      e.groupBy(col("a").as("doc_id")).agg(count(lit(1)).as("degree"))
        .orderBy("doc_id")
    },

    // FUZZY ENTITY RESOLUTION via a NATIVE Jaro-Winkler expression —
    // the string-comparator leg of the er_field_weights linkage rule:
    // within each p_brand block, every part-name pair scoring
    // jw >= 0.9 (the standard ER match band; edit distance
    // over-penalizes the transpositions JW is built for). Spark has
    // no jaro_winkler, so this runs graft.functions.JaroWinkler — a
    // codegen BinaryExpression pinned bitwise-identical to DuckDB's
    // built-in (fuzz + fixtures in JaroWinklerProps), which is what
    // makes this 6-dp hash-exact oracle possible at all. Blocked-ER
    // scale shape: the equi-join on the block key shuffles once and
    // the quadratic expansion is block-bounded (the bucketPairs
    // discipline); the comparator fuses into the generated join loop.
    Q("er_jaro_winkler",
      """WITH p AS (SELECT p_partkey, p_brand, p_name FROM part)
        |SELECT a.p_brand, a.p_partkey AS key_a, b.p_partkey AS key_b,
        |  a.p_name AS name_a, b.p_name AS name_b,
        |  round(jaro_winkler_similarity(a.p_name, b.p_name), 6) AS jw
        |FROM p a JOIN p b ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        |WHERE round(jaro_winkler_similarity(a.p_name, b.p_name), 6) >= 0.9
        |ORDER BY key_a, key_b""".stripMargin) { (s, dir) =>
      val p = Tables.load(s, dir, "part")
        .select("p_partkey", "p_brand", "p_name")
      // The dimension is small enough to broadcast, which makes the
      // PROBE side's partitioning the only parallelism the quadratic
      // expansion gets — and a small parquet file scans as ONE split.
      // Spread the probe side round-robin first so every core works
      // the comparator loop (measured 11.1s -> ~1s at sf0.1); the
      // build side stays a broadcast, so no key shuffle is added.
      val a = p.toDF("key_a", "p_brand", "name_a")
        .repartition(s.sparkContext.defaultParallelism)
      val b = p.toDF("key_b", "p_brand", "name_b")
      a.join(b, Seq("p_brand"))
        .filter(col("key_a") < col("key_b"))
        .select(col("p_brand"), col("key_a"), col("key_b"),
          col("name_a"), col("name_b"),
          round(graft.functions.JaroWinkler(col("name_a"), col("name_b")), 6)
            .as("jw"))
        .filter(col("jw") >= 0.9)
        .orderBy("key_a", "key_b")
    },

    // TYPO-DISTANCE CENSUS via a NATIVE full Damerau-Levenshtein —
    // er_jaro_winkler's integer-exact sibling: the distribution of
    // transposition-aware edit distances over every blocked pair
    // (what an ER rule author reads to place the match threshold:
    // the gap between the dl<=2 near-dup mass and the background).
    // graft.functions.DamerauLevenshtein is the unrestricted
    // Lowrance-Wagner distance, pinned to DuckDB's
    // damerau_levenshtein (dl("CA","ABC") = 2, not OSA's 3). Every
    // pair is exercised and the output is a ≤|name-length| census;
    // integer sums, zero float risk. Same blocked-ER scale shape as
    // er_jaro_winkler.
    Q("er_damerau_census",
      """WITH p AS (SELECT p_partkey, p_brand, p_name FROM part),
        |d AS (SELECT damerau_levenshtein(a.p_name, b.p_name) AS dl
        |      FROM p a JOIN p b
        |      ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey)
        |SELECT dl, COUNT(*) AS n_pairs,
        |  CAST(SUM(COUNT(*)) OVER (ORDER BY dl ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |    AS n_within
        |FROM d GROUP BY dl ORDER BY dl""".stripMargin) { (s, dir) =>
      val p = Tables.load(s, dir, "part")
        .select("p_partkey", "p_brand", "p_name")
      // Same probe-side spread as er_jaro_winkler: broadcast join
      // parallelism == probe partition count, and the tiny scan is one
      // split without it.
      val a = p.toDF("key_a", "p_brand", "name_a")
        .repartition(s.sparkContext.defaultParallelism)
      val b = p.toDF("key_b", "p_brand", "name_b")
      val d = a.join(b, Seq("p_brand"))
        .filter(col("key_a") < col("key_b"))
        .select(graft.functions.DamerauLevenshtein(
          col("name_a"), col("name_b")).as("dl"))
      d.groupBy("dl").agg(count(lit(1)).as("n_pairs"))
        .select(col("dl"), col("n_pairs"),
          sum(col("n_pairs")).over(org.apache.spark.sql.expressions.Window
            .orderBy("dl")
            .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
              org.apache.spark.sql.expressions.Window.currentRow))
            .cast("long").as("n_within"))
        .orderBy("dl")
    },

    // ADAMIC-ADAR LINK PREDICTION (Adamic & Adar '03) over the
    // rare-shingle EVIDENCE graph — the "which pairs did the evidence
    // threshold miss?" ranker. Edges are pairs sharing >= 2 df=2
    // shingles (each df=2 shingle names exactly ONE pair, so edge
    // derivation is LINEAR in the shingle census — no banding, no
    // all-pairs); on the banded near-dup graph this query is vacuous
    // by construction (dup_triangles shows closure 1.0), while the
    // evidence graph leaves open wedges. Score(u,w) =
    // Σ_{v∈N(u)∩N(w)} 1/ln(deg v): shared LOW-degree neighbors carry
    // more surprise. Common neighbors via a two-hop self-join on the
    // symmetrized edges, existing edges anti-joined away. Float
    // discipline: each neighbor's 1/ln(deg) is rounded to 12 dp and
    // summed AS DECIMAL (order-free), one final double. Scale: the
    // two-hop expansion groups by the mid node, so its cost is
    // Σ deg(v)² over an evidence-thresholded sparse graph (max degree
    // 5 on the fixture) — the dup_triangles bound, cappable by the
    // same hot-bucket discipline as candidate generation.
    Q("adamic_adar",
      s"""$shingleCtes,
         |dfq AS (SELECT shingle, COUNT(*) AS df FROM dsh GROUP BY 1),
         |rare AS (SELECT d.doc_id, d.shingle FROM dsh d
         |         JOIN dfq ON d.shingle = dfq.shingle WHERE dfq.df = 2),
         |pairs AS (SELECT x.doc_id AS d1, y.doc_id AS d2
         |          FROM rare x JOIN rare y
         |          ON x.shingle = y.shingle AND x.doc_id < y.doc_id
         |          GROUP BY 1, 2 HAVING COUNT(*) >= 2),
         |edges AS (SELECT d1 AS u, d2 AS v FROM pairs
         |          UNION ALL SELECT d2, d1 FROM pairs),
         |deg AS (SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS degree
         |        FROM edges GROUP BY 1),
         |hop AS (SELECT e1.u AS d1, e2.v AS d2, e1.v AS mid
         |        FROM edges e1 JOIN edges e2 ON e1.v = e2.u AND e1.u < e2.v),
         |cand AS (SELECT h.d1, h.d2, dd.degree FROM hop h
         |         JOIN deg dd ON h.mid = dd.node
         |         LEFT JOIN pairs p ON p.d1 = h.d1 AND p.d2 = h.d2
         |         WHERE p.d1 IS NULL),
         |agg AS (SELECT d1, d2, CAST(COUNT(*) AS BIGINT) AS n_common,
         |    SUM(CASE WHEN degree > 1
         |      THEN CAST(round(1.0 / ln(degree), 12) AS DECIMAL(14,12))
         |      ELSE CAST(0 AS DECIMAL(14,12)) END) AS s
         |  FROM cand GROUP BY 1, 2)
         |SELECT d1, d2, n_common, round(CAST(s AS DOUBLE), 6) AS aa_score
         |FROM agg ORDER BY aa_score DESC, d1, d2 LIMIT 50""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val dsh = Dedup.distinctShingles(docs.select("doc_id", "text"),
        "doc_id", "text")
      val dfq = dsh.groupBy("shingle").agg(count(lit(1)).as("df"))
      val rare = dsh.join(dfq.filter(col("df") === 2), "shingle")
        .select("shingle", "doc_id")
      val pairs = rare.toDF("shingle", "d1")
        .join(rare.toDF("shingle", "d2"), "shingle")
        .filter(col("d1") < col("d2"))
        .groupBy("d1", "d2").agg(count(lit(1)).as("nshared"))
        .filter(col("nshared") >= 2)
        .select("d1", "d2")
        // both the two-hop join and the anti-join probe this frame —
        // materialize the evidence graph once instead of re-shingling 3x
        .localCheckpoint(true)
      val edges = pairs.select(col("d1").as("u"), col("d2").as("v"))
        .unionAll(pairs.select(col("d2").as("u"), col("d1").as("v")))
      val deg = edges.groupBy(col("u").as("node"))
        .agg(count(lit(1)).cast("long").as("degree"))
      val hop = edges.toDF("u1", "mid")
        .join(edges.toDF("mid", "v2"), "mid")
        .filter(col("u1") < col("v2"))
        .select(col("u1").as("d1"), col("v2").as("d2"), col("mid"))
      val cand = hop.join(deg, col("mid") === col("node"))
        .join(pairs, Seq("d1", "d2"), "left_anti")
      cand.groupBy("d1", "d2")
        .agg(count(lit(1)).cast("long").as("n_common"),
          sum(when(col("degree") > 1,
              round(lit(1.0) / log(col("degree")), 12)
                .cast(DecimalType(14, 12)))
            .otherwise(lit(0).cast(DecimalType(14, 12)))).as("s"))
        .select(col("d1"), col("d2"), col("n_common"),
          round(col("s").cast("double"), 6).as("aa_score"))
        .orderBy(col("aa_score").desc, col("d1"), col("d2"))
        .limit(50)
    },

    // SORTED-NEIGHBORHOOD ER BLOCKING (Hernández & Stolfo '95) — the
    // classic alternative to er_jaro_winkler's attribute blocking and
    // the LSH banding: sort on a key (p_name), compare only records
    // within a fixed rank window w=5, verify with Jaro-Winkler. Cost
    // is LINEAR (n·w comparisons) instead of block-quadratic — the
    // standard choice when no clean blocking attribute exists. The
    // global rank uses the watermark_delay_audit two-phase prefix
    // scan: first-character bucket counts form a tiny census whose
    // exclusive prefix sum is broadcast back, then each bucket ranks
    // LOCALLY (the bucket key is a prefix of the sort key, so bucket
    // order == sort order) — no corpus-wide single-partition window.
    // Cross-bucket neighborhoods still pair up because ranks are
    // global and the window join is on rank arithmetic.
    Q("snm_blocking",
      """WITH p AS (SELECT p_partkey AS key, p_name AS name FROM part),
        |r AS (SELECT key, name,
        |      row_number() OVER (ORDER BY name, key) AS rn FROM p),
        |d AS (SELECT CAST(unnest(generate_series(1, 5)) AS BIGINT) AS gap),
        |c AS (SELECT a.key AS key_a, b.key AS key_b,
        |      a.name AS name_a, b.name AS name_b, d.gap,
        |      round(jaro_winkler_similarity(a.name, b.name), 6) AS jw
        |  FROM r a CROSS JOIN d JOIN r b ON b.rn = a.rn + d.gap
        |  WHERE a.name <> b.name)
        |SELECT key_a, key_b, name_a, name_b, gap, jw
        |FROM c WHERE jw >= 0.84 ORDER BY key_a, key_b""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val p = Tables.load(s, dir, "part")
        .select(col("p_partkey").as("key"), col("p_name").as("name"))
        .withColumn("bucket", substring(col("name"), 1, 1))
      val cnt = p.groupBy("bucket").agg(count(lit(1)).as("bc"))
      val prefix = cnt.select(col("bucket"),
        sum(col("bc")).over(Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, -1)).as("off"))
      val local = Window.partitionBy("bucket").orderBy("name", "key")
      val ranked = p.join(broadcast(prefix), "bucket")
        .withColumn("rn",
          coalesce(col("off"), lit(0L)) + row_number().over(local))
        .select("key", "name", "rn")
      val gaps = explode(array((1L to 5L).map(lit): _*)).as("gap")
      val probe = ranked.select(col("key").as("key_a"),
          col("name").as("name_a"), col("rn"), gaps)
        .withColumn("rnb", col("rn") + col("gap"))
      // exact-equal neighbors are dedup_exact's job — SNM's value is
      // the FUZZY band the sort brings adjacent, so report that
      probe.join(ranked.toDF("key_b", "name_b", "rnb"), "rnb")
        .filter(col("name_a") =!= col("name_b"))
        .select(col("key_a"), col("key_b"), col("name_a"), col("name_b"),
          col("gap"),
          round(graft.functions.JaroWinkler(col("name_a"), col("name_b")), 6)
            .as("jw"))
        .filter(col("jw") >= 0.84)
        .orderBy("key_a", "key_b")
    },

    // IMAGE NEAR-DUP DEDUP — the perceptual-hash (ahash) fingerprints
    // fed through the SAME banding machinery as text LSH: the 64-bit
    // ahash splits into four 16-bit bands, images sharing any band
    // become candidates (pigeonhole: Hamming <= 3 is GUARANTEED a
    // band hit; beyond that the recall curve is the banding design,
    // identical in both engines), and candidates verify by exact
    // Hamming distance <= 10 — the standard image-pipeline near-dup
    // shape (re-encodes, brightness nudges, thumbnail regenerations).
    // The corpus plants real near-dups (Multimodal
    // .nearDupImageContainers: a seed+1 re-encode per doc_id % 12 ==
    // 0 image), so the census has genuine positives; the Spark side
    // reaches every fingerprint through the REAL container decode
    // (inflate + filter inversion), the oracle re-derives them from
    // the pixel rule — one more end-to-end decode pin. SCALE: bands
    // bucket-group-explode (never a self-join), bucket sizes bounded
    // by the banding design (hot buckets would flow through the same
    // bucketPairsCapped machinery as text); the Hamming verify runs
    // only on the candidate census.
    Q("dedup_image_ahash", {
      val w = s"16 + ${duckH32("text")} % 240"
      val h = s"16 + ${duckH32(1, "text")} % 240"
      val seed = s"${duckH32("text")} % 256"
      s"""WITH base AS (SELECT doc_id, text FROM documents
         |    WHERE doc_id % 6 = 0 OR doc_id % 3 = 2),
         |md0 AS (SELECT doc_id AS media_id, $w AS w, $h AS h, $seed AS seed
         |  FROM base),
         |md AS (SELECT * FROM md0
         |  UNION ALL SELECT media_id + 10000000, w, h, (seed + 1) % 256
         |    FROM md0 WHERE media_id % 12 = 0),
         |px AS (SELECT media_id, w, h,
         |    ((i % w) * 8) // w AS u, ((i // w) * 8) // h AS v,
         |    (seed + 31 * i) % 256 AS p
         |  FROM md, unnest(generate_series(0, CAST(w AS BIGINT) * h - 1)) AS t(i)),
         |cells AS (SELECT media_id, w, h, v, u,
         |    CAST(SUM(p) AS BIGINT) AS cs, CAST(COUNT(*) AS BIGINT) AS cn
         |  FROM px GROUP BY 1, 2, 3, 4, 5),
         |tot AS (SELECT media_id, CAST(SUM(cs) AS BIGINT) AS s FROM cells GROUP BY 1),
         |ah AS (SELECT c.media_id,
         |    string_agg(CASE WHEN cs * (CAST(w AS BIGINT) * h) > s * cn
         |      THEN '1' ELSE '0' END, '' ORDER BY v, u) AS ahash
         |  FROM cells c JOIN tot ON c.media_id = tot.media_id
         |  GROUP BY c.media_id),
         |bands AS (SELECT media_id,
         |    CAST(bb AS VARCHAR) || ':' || substr(ahash, bb * 16 + 1, 16) AS band
         |  FROM ah, unnest([0, 1, 2, 3]) AS t(bb)),
         |pairs AS (SELECT DISTINCT a.media_id AS media_a, b2.media_id AS media_b
         |  FROM bands a JOIN bands b2
         |    ON a.band = b2.band AND a.media_id < b2.media_id)
         |SELECT media_a, media_b,
         |  CAST(len(list_filter(generate_series(1, 64),
         |    i -> substr(x.ahash, CAST(i AS INTEGER), 1)
         |      <> substr(y.ahash, CAST(i AS INTEGER), 1))) AS BIGINT) AS hamming
         |FROM pairs JOIN ah x ON media_a = x.media_id
         |  JOIN ah y ON media_b = y.media_id
         |WHERE len(list_filter(generate_series(1, 64),
         |    i -> substr(x.ahash, CAST(i AS INTEGER), 1)
         |      <> substr(y.ahash, CAST(i AS INTEGER), 1))) <= 10
         |ORDER BY media_a, media_b""".stripMargin
    }) { (s, dir) =>
      val docs = Tables.parallelizeByRange(
        Tables.load(s, dir, "documents")
          .filter(col("doc_id") % 6 === 0 || col("doc_id") % 3 === 2),
        col("doc_id"))
      val ah = graft.ops.Multimodal
        .decodeAHash(graft.ops.Multimodal.nearDupImageContainers(docs))
        .toDF().select(col("media_id"), col("ahash"))
        .localCheckpoint(false) // bands AND both verify sides read it
      val bands = ah.select(col("media_id"),
        explode(array((0 until 4).map(b =>
          concat_ws(":", lit(b.toString),
            substring(col("ahash"), b * 16 + 1, 16))): _*)).as("band"))
      val pairs = Dedup.candidatePairs(bands, "media_id")
      val ham = aggregate(sequence(lit(1), lit(64)), lit(0),
        (acc, i) => acc + when(
          col("ha").substr(i, lit(1)) =!= col("hb").substr(i, lit(1)), 1)
          .otherwise(0))
      pairs
        .join(ah.select(col("media_id").as("id_a"), col("ahash").as("ha")), "id_a")
        .join(ah.select(col("media_id").as("id_b"), col("ahash").as("hb")), "id_b")
        .select(col("id_a").as("media_a"), col("id_b").as("media_b"),
          ham.cast("long").as("hamming"))
        .filter(col("hamming") <= 10)
        .orderBy("media_a", "media_b")
    },

    // AUDIO NEAR-DUP DEDUP — completes the multimodal dedup family
    // (text MinHash, image ahash, now audio): a 64-bit
    // energy-envelope fingerprint per WAV (64 time segments, one bit
    // per segment by mean-square amplitude vs the whole clip —
    // Multimodal.audioFpOf, the audio analog of ahash) feeds the SAME
    // banding machinery: four 16-bit bands, band-collide candidates,
    // exact Hamming <= 10 verify. The corpus plants real near-dups
    // (Multimodal.nearDupWavContainers: an all-samples +1 mod 256
    // re-encode per doc_id % 12 == 7 — the DC-offset / gain-nudge
    // class), so the census has genuine positives; the Spark side
    // reaches every fingerprint through the REAL RIFF/WAVE container
    // decode (chunk walk -> data chunk -> sample fold), the oracle
    // re-derives them from the codepoint-sample synthesis rule — an
    // end-to-end decode pin for the audio modality. SCALE: identical
    // to dedup_image_ahash — bands bucket-group-explode (never a
    // self-join), the Hamming verify runs only on the candidate
    // census, PCM bytes never shuffle (only 64-char fingerprints
    // move).
    Q("dedup_audio_fp", {
      s"""WITH au AS (SELECT doc_id AS media_id, text FROM documents
         |    WHERE doc_id % 3 = 1 AND length(text) >= 256),
         |md AS (SELECT media_id, 0 AS sh, text FROM au
         |  UNION ALL SELECT media_id + 10000000, 1, text FROM au
         |    WHERE media_id % 12 = 7),
         |sm AS (SELECT media_id, length(text) AS ln,
         |    (i * 64) // length(text) AS s,
         |    (ord(substr(text, CAST(i + 1 AS INTEGER), 1)) % 256 + sh) % 256 - 128 AS v
         |  FROM md, unnest(generate_series(0, length(text) - 1)) AS t(i)),
         |seg AS (SELECT media_id, ln, s, CAST(SUM(v * v) AS BIGINT) AS es,
         |    CAST(COUNT(*) AS BIGINT) AS ns
         |  FROM sm GROUP BY 1, 2, 3),
         |tot AS (SELECT media_id, CAST(SUM(es) AS BIGINT) AS e
         |  FROM seg GROUP BY 1),
         |fp AS (SELECT seg.media_id,
         |    string_agg(CASE WHEN es * ln > e * ns THEN '1' ELSE '0' END,
         |      '' ORDER BY s) AS fp
         |  FROM seg JOIN tot ON seg.media_id = tot.media_id
         |  GROUP BY seg.media_id),
         |bands AS (SELECT media_id,
         |    CAST(bb AS VARCHAR) || ':' || substr(fp, bb * 16 + 1, 16) AS band
         |  FROM fp, unnest([0, 1, 2, 3]) AS t(bb)),
         |pairs AS (SELECT DISTINCT a.media_id AS media_a, b2.media_id AS media_b
         |  FROM bands a JOIN bands b2
         |    ON a.band = b2.band AND a.media_id < b2.media_id)
         |SELECT media_a, media_b,
         |  CAST(len(list_filter(generate_series(1, 64),
         |    i -> substr(x.fp, CAST(i AS INTEGER), 1)
         |      <> substr(y.fp, CAST(i AS INTEGER), 1))) AS BIGINT) AS hamming
         |FROM pairs JOIN fp x ON media_a = x.media_id
         |  JOIN fp y ON media_b = y.media_id
         |WHERE len(list_filter(generate_series(1, 64),
         |    i -> substr(x.fp, CAST(i AS INTEGER), 1)
         |      <> substr(y.fp, CAST(i AS INTEGER), 1))) <= 10
         |ORDER BY media_a, media_b""".stripMargin
    }) { (s, dir) =>
      val docs = Tables.parallelizeByRange(
        Tables.load(s, dir, "documents")
          .filter(col("doc_id") % 3 === 1 && length(col("text")) >= 256),
        col("doc_id"))
      val fps = graft.ops.Multimodal
        .decodeAudioFp(graft.ops.Multimodal.nearDupWavContainers(docs))
        .toDF().select(col("media_id"), col("fp"))
        .localCheckpoint(false) // bands AND both verify sides read it
      val bands = fps.select(col("media_id"),
        explode(array((0 until 4).map(b =>
          concat_ws(":", lit(b.toString),
            substring(col("fp"), b * 16 + 1, 16))): _*)).as("band"))
      val pairs = Dedup.candidatePairs(bands, "media_id")
      val ham = aggregate(sequence(lit(1), lit(64)), lit(0),
        (acc, i) => acc + when(
          col("fa").substr(i, lit(1)) =!= col("fb").substr(i, lit(1)), 1)
          .otherwise(0))
      pairs
        .join(fps.select(col("media_id").as("id_a"), col("fp").as("fa")), "id_a")
        .join(fps.select(col("media_id").as("id_b"), col("fp").as("fb")), "id_b")
        .select(col("id_a").as("media_a"), col("id_b").as("media_b"),
          ham.cast("long").as("hamming"))
        .filter(col("hamming") <= 10)
        .orderBy("media_a", "media_b")
    }
  )
}
