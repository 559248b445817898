package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.ops.Similarity

/** Sparse-vector retrieval — the inverted-index sibling of the dense
  * ANN family: weighted (tf-idf) cosine nearest neighbors via a
  * term-posting join with stop-term pruning, and graded retrieval
  * evaluation (NDCG@10) over the dense shortlist.
  *
  * Scale shape: the sparse join never materializes doc×doc — the
  * candidate set is Σ_term df², and the df cap bounds every term's
  * fan-out at cap² (the classic stop-term prune; the unpruned tail
  * carries the idf mass anyway). Weights are decimal-quantized
  * (integer tf × 6-dp idf), so dots and norms are exact in any
  * aggregation order; the cosine is the single final double.
  * NDCG's discount table is ONE Scala literal list shared by both
  * engines — DCG and ideal-DCG are exact decimal sums.
  */
object RetrievalQueries {

  /** Stop-term prune: a term in more than this many docs carries
    * negligible idf and quadratic join cost. */
  val DfCap = 50
  val KnnK = 5
  val NdcgK = 10

  /** round(1/log2(r+1), 9) for r = 1..10 — the shared discount table. */
  private val discounts: IndexedSeq[BigDecimal] =
    (1 to NdcgK).map(r => BigDecimal(1.0 / (math.log(r + 1.0) / math.log(2.0)))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP))
  private val discCum: IndexedSeq[BigDecimal] =
    discounts.scanLeft(BigDecimal(0))(_ + _).tail

  def all: Seq[Q] = Seq(

    // TF-IDF COSINE KNN: top-5 weighted-cosine neighbors per document
    // through an inverted index. tf is an exact integer, idf is the
    // 6-dp-rounded ln(N/df) (the suite's decimal-log convention), so
    // every posting weight, dot product, and squared norm is an exact
    // decimal; ranking keys on the ROUNDED cosine with a neighbor-id
    // tie-break, so both engines cut the same top-k.
    Q("tfidf_cosine_knn",
      s"""WITH nn AS (SELECT COUNT(*) AS n FROM documents),
         |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM
         |    (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
         |  GROUP BY 1, 2),
         |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
         |w AS (SELECT tf.doc_id, tf.term,
         |    CAST(tf.tf * CAST(round(ln(CAST(nn.n AS DOUBLE) / df.df), 6) AS DECIMAL(12,6)) AS DECIMAL(18,6)) AS w
         |  FROM tf JOIN df USING (term) CROSS JOIN nn WHERE df.df <= $DfCap),
         |nm AS (SELECT doc_id, CAST(SUM(w * w) AS DECIMAL(30,12)) AS n2 FROM w GROUP BY 1),
         |p AS (SELECT a.doc_id AS d1, b.doc_id AS d2, CAST(SUM(a.w * b.w) AS DECIMAL(30,12)) AS dot
         |      FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
         |      GROUP BY 1, 2),
         |c AS (SELECT d1, d2,
         |    round(CAST(dot AS DOUBLE) / (sqrt(CAST(x.n2 AS DOUBLE)) * sqrt(CAST(y.n2 AS DOUBLE))), 6) AS cos_sim
         |  FROM p JOIN nm x ON p.d1 = x.doc_id JOIN nm y ON p.d2 = y.doc_id
         |  WHERE x.n2 > 0 AND y.n2 > 0),
         |e AS (SELECT d1 AS doc_id, d2 AS neighbor, cos_sim FROM c
         |      UNION ALL SELECT d2, d1, cos_sim FROM c),
         |r AS (SELECT doc_id, neighbor, cos_sim, row_number() OVER (
         |        PARTITION BY doc_id ORDER BY cos_sim DESC, neighbor) AS rnk FROM e)
         |SELECT doc_id, rnk, neighbor, cos_sim FROM r WHERE rnk <= $KnnK
         |ORDER BY doc_id, rnk""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val tf = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val nn = docs.agg(count(lit(1)).as("n"))
      val w = tf.join(df.filter(col("df") <= DfCap), "term")
        .crossJoin(broadcast(nn))
        .select(col("doc_id"), col("term"),
          (col("tf") * round(log(col("n").cast("double") / col("df")), 6)
            .cast(DecimalType(12, 6))).cast(DecimalType(18, 6)).as("w"))
      val nm = w.groupBy("doc_id")
        .agg(sum(col("w") * col("w")).cast(DecimalType(30, 12)).as("n2"))
      val p = w.as("a")
        .join(w.as("b"), col("a.term") === col("b.term")
          && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(sum(col("a.w") * col("b.w")).cast(DecimalType(30, 12)).as("dot"))
      val c = p
        .join(nm.toDF("d1", "na"), Seq("d1")).join(nm.toDF("d2", "nb"), Seq("d2"))
        .filter(col("na") > 0 && col("nb") > 0)
        .select(col("d1"), col("d2"),
          round(col("dot").cast("double")
            / (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))), 6)
            .as("cos_sim"))
      val e = c.select(col("d1").as("doc_id"), col("d2").as("neighbor"), col("cos_sim"))
        .unionAll(c.select(col("d2"), col("d1"), col("cos_sim")))
      val wk = Window.partitionBy("doc_id").orderBy(col("cos_sim").desc, col("neighbor"))
      e.withColumn("rnk", row_number().over(wk))
        .filter(col("rnk") <= KnnK)
        .select("doc_id", "rnk", "neighbor", "cos_sim")
        .orderBy("doc_id", "rnk")
    },

    // NDCG@10 of the brute-force cosine shortlist against label
    // relevance: rel(rank r) = [neighbor label == query label], DCG =
    // Σ rel_r·disc_r, ideal DCG = the first min(10, |relevant|)
    // discounts. The discount and cumulative-discount tables are one
    // Scala literal list in both engines, so both sums are exact
    // decimals; ndcg is the final double. A label with no other
    // members has no ideal ranking — NULL, not a divide-by-zero.
    Q("ndcg_eval", {
      val discList = discounts.mkString("[", ",", "]")
      val cumList = discCum.mkString("[", ",", "]")
      def duckDot(x: String, y: String) =
        s"list_sum(list_transform(generate_series(1, 64), i -> CAST($x.embedding[i] AS DOUBLE) * $y.embedding[i]))"
      s"""WITH q AS (SELECT * FROM embeddings WHERE vec_id < 20),
         |lc AS (SELECT label, COUNT(*) AS nl FROM embeddings GROUP BY 1),
         |p AS (SELECT q.vec_id AS q_id, q.label AS ql, e.vec_id AS n_id, e.label AS nl_,
         |    round(${duckDot("q", "e")} /
         |      (sqrt(${duckDot("q", "q")}) * sqrt(${duckDot("e", "e")})), 6) AS cos_sim
         |  FROM q JOIN embeddings e ON e.vec_id <> q.vec_id),
         |r AS (SELECT q_id, ql, n_id, nl_, cos_sim, row_number() OVER (
         |        PARTITION BY q_id ORDER BY cos_sim DESC, n_id) AS rnk FROM p),
         |d AS (SELECT q_id, ql,
         |    CAST(SUM(CASE WHEN nl_ = ql THEN ($discList)[rnk] ELSE CAST(0 AS DECIMAL(12,9)) END) AS DECIMAL(16,9)) AS dcg,
         |    CAST(SUM(CASE WHEN nl_ = ql THEN 1 ELSE 0 END) AS BIGINT) AS n_rel
         |  FROM r WHERE rnk <= $NdcgK GROUP BY 1, 2),
         |i AS (SELECT d.q_id, d.n_rel, d.dcg, lc.nl - 1 AS avail FROM d
         |      JOIN lc ON d.ql = lc.label)
         |SELECT q_id, n_rel AS n_rel_at10,
         |  CASE WHEN avail > 0
         |    THEN round(CAST(dcg AS DOUBLE) / CAST(($cumList)[least(avail, $NdcgK)] AS DOUBLE), 6)
         |  END AS ndcg10
         |FROM i ORDER BY q_id""".stripMargin
    }) { (s, dir) =>
      val e = Tables.load(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("embedding").as("qe"),
          col("label").as("ql"))
      val lc = e.groupBy("label").agg(count(lit(1)).as("nl"))
      val n = e.repartition(s.sparkContext.defaultParallelism, col("vec_id"))
        .select(col("vec_id").as("n_id"), col("embedding").as("ne"),
          col("label").as("nl_"))
      val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("n_id"))
      val discArr = array(discounts.map(d => lit(d.toString).cast(DecimalType(12, 9))): _*)
      val cumArr = array(discCum.map(d => lit(d.toString).cast(DecimalType(12, 9))): _*)
      val d = n.join(broadcast(q), col("n_id") =!= col("q_id"))
        .select(col("q_id"), col("ql"), col("n_id"), col("nl_"),
          Similarity.cosine(col("qe"), col("ne")).as("cos_sim"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= NdcgK)
        .groupBy("q_id", "ql")
        .agg(sum(when(col("nl_") === col("ql"),
            element_at(discArr, col("rnk").cast("int")))
            .otherwise(lit(0).cast(DecimalType(12, 9))))
            .cast(DecimalType(16, 9)).as("dcg"),
          sum(when(col("nl_") === col("ql"), 1).otherwise(0))
            .cast("long").as("n_rel"))
      d.join(broadcast(lc), col("ql") === col("label"))
        .select(col("q_id"), col("n_rel").as("n_rel_at10"),
          when(col("nl") - 1 > 0,
            round(col("dcg").cast("double")
              / element_at(cumArr, least(col("nl") - 1, lit(NdcgK)).cast("int"))
                .cast("double"), 6)).as("ndcg10"))
        .orderBy("q_id")
    },

    // MAP / MRR / RECALL@10 — ndcg_eval's rank-UNWEIGHTED siblings
    // over the same query set, shortlist, and label-relevance rule
    // (the three numbers every retrieval eval reports side by side):
    // reciprocal rank of the FIRST relevant hit (0.0 when the top-10
    // has none — the MRR convention), average precision as the mean
    // of precision@r at each relevant rank r over min(avail, 10), and
    // recall against all available same-label neighbors. Float
    // discipline: each precision@r = crel/r is rounded to 9 dp and
    // summed AS DECIMAL (order-free); rr and the final ratios are
    // single identically-written doubles. A label with no other
    // members has no relevant set — NULL, not a divide-by-zero.
    Q("map_mrr_eval", {
      def duckDot(x: String, y: String) =
        s"list_sum(list_transform(generate_series(1, 64), i -> CAST($x.embedding[i] AS DOUBLE) * $y.embedding[i]))"
      s"""WITH q AS (SELECT * FROM embeddings WHERE vec_id < 20),
         |lc AS (SELECT label, COUNT(*) AS nl FROM embeddings GROUP BY 1),
         |p AS (SELECT q.vec_id AS q_id, q.label AS ql, e.vec_id AS n_id, e.label AS nl_,
         |    round(${duckDot("q", "e")} /
         |      (sqrt(${duckDot("q", "q")}) * sqrt(${duckDot("e", "e")})), 6) AS cos_sim
         |  FROM q JOIN embeddings e ON e.vec_id <> q.vec_id),
         |r AS (SELECT q_id, ql, cos_sim, n_id, row_number() OVER (
         |        PARTITION BY q_id ORDER BY cos_sim DESC, n_id) AS rnk,
         |      CASE WHEN nl_ = ql THEN 1 ELSE 0 END AS rel FROM p),
         |c AS (SELECT q_id, ql, rnk, rel, SUM(rel) OVER (
         |        PARTITION BY q_id ORDER BY rnk ROWS UNBOUNDED PRECEDING) AS crel
         |      FROM r WHERE rnk <= $NdcgK),
         |d AS (SELECT q_id, ql, CAST(SUM(rel) AS BIGINT) AS n_rel,
         |    MIN(CASE WHEN rel = 1 THEN rnk END) AS first_rel,
         |    SUM(CASE WHEN rel = 1
         |      THEN CAST(round(CAST(crel AS DOUBLE) / rnk, 9) AS DECIMAL(12,9))
         |      ELSE CAST(0 AS DECIMAL(12,9)) END) AS psum
         |  FROM c GROUP BY 1, 2),
         |i AS (SELECT d.q_id, d.n_rel, d.first_rel, d.psum, lc.nl - 1 AS avail
         |      FROM d JOIN lc ON d.ql = lc.label)
         |SELECT q_id, n_rel AS n_rel_at10,
         |  CASE WHEN first_rel IS NULL THEN 0.0
         |    ELSE round(1.0 / first_rel, 6) END AS rr,
         |  CASE WHEN avail > 0
         |    THEN round(CAST(psum AS DOUBLE) / least(avail, $NdcgK), 6) END AS ap10,
         |  CASE WHEN avail > 0
         |    THEN round(CAST(n_rel AS DOUBLE) / avail, 6) END AS recall10
         |FROM i ORDER BY q_id""".stripMargin
    }) { (s, dir) =>
      val e = Tables.load(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("embedding").as("qe"),
          col("label").as("ql"))
      val lc = e.groupBy("label").agg(count(lit(1)).as("nl"))
      val n = e.repartition(s.sparkContext.defaultParallelism, col("vec_id"))
        .select(col("vec_id").as("n_id"), col("embedding").as("ne"),
          col("label").as("nl_"))
      val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("n_id"))
      val cw = Window.partitionBy("q_id").orderBy("rnk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val c = n.join(broadcast(q), col("n_id") =!= col("q_id"))
        .select(col("q_id"), col("ql"), col("nl_"),
          Similarity.cosine(col("qe"), col("ne")).as("cos_sim"), col("n_id"))
        .withColumn("rnk", row_number().over(w))
        .withColumn("rel",
          when(col("nl_") === col("ql"), 1).otherwise(0))
        .filter(col("rnk") <= NdcgK)
        .withColumn("crel", sum(col("rel")).over(cw))
      val d = c.groupBy("q_id", "ql")
        .agg(sum(col("rel")).cast("long").as("n_rel"),
          min(when(col("rel") === 1, col("rnk"))).as("first_rel"),
          sum(when(col("rel") === 1,
              round(col("crel").cast("double") / col("rnk"), 9)
                .cast(DecimalType(12, 9)))
            .otherwise(lit(0).cast(DecimalType(12, 9)))).as("psum"))
      d.join(broadcast(lc), col("ql") === col("label"))
        .select(col("q_id"), col("n_rel").as("n_rel_at10"),
          when(col("first_rel").isNull, lit(0.0))
            .otherwise(round(lit(1.0) / col("first_rel"), 6)).as("rr"),
          when(col("nl") - 1 > 0,
            round(col("psum").cast("double")
              / least(col("nl") - 1, lit(NdcgK)), 6)).as("ap10"),
          when(col("nl") - 1 > 0,
            round(col("n_rel").cast("double") / (col("nl") - 1), 6))
            .as("recall10"))
        .orderBy("q_id")
    }
  )
}
