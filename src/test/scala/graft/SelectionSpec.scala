package graft

import org.apache.spark.sql.functions._

import graft.queries.SelectionQueries

/** Value-level behavior of the data-selection family (dsir_select /
  * mix_temperature / semdedup_keep / hard_negatives) — corpus-level
  * exactness is pinned by the DuckDB oracle gate; these tests pin the
  * INVARIANTS the oracle can't express (set relationships, bounds).
  */
class SelectionSpec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf001)

  test("dsir_select: only raw-pool (non-en) docs are selected, scores sorted") {
    val rows = q("dsir_select").collect()
    assert(rows.length === SelectionQueries.DsirTopK)
    assert(rows.forall(_.getAs[String]("lang") != "en"))
    val scores = rows.map(_.getAs[Long]("score_u")).toSeq
    assert(scores === scores.sorted(Ordering[Long].reverse))
    // score is the micro-unit value scaled back — exactly
    rows.foreach { r =>
      assert(r.getAs[Double]("score") === r.getAs[Long]("score_u") / 1e7)
    }
  }

  test("dsir_select: hash-derived selection is bit-stable across reruns") {
    // the whole point of integer micro-unit scores: membership is a
    // pure function of the corpus, never of partitioning or run order
    val a = q("dsir_select").select("doc_id", "score_u").as[(Long, Long)].collect().toSeq
    val b = q("dsir_select").select("doc_id", "score_u").as[(Long, Long)].collect().toSeq
    assert(a === b)
  }

  test("mix_temperature: quotas respect the budget and temper the skew") {
    val rows = q("mix_temperature").collect()
    val budget = SelectionQueries.MixBudget
    val quotas = rows.map(_.getAs[Long]("quota"))
    assert(quotas.sum <= budget) // floor division never over-allocates
    assert(quotas.sum >= budget - rows.length) // and wastes < 1 per source
    // alpha = 1/2 compresses the ratio: quota ratio < count ratio
    val byN = rows.sortBy(_.getAs[Long]("n"))
    val (lo, hi) = (byN.head, byN.last)
    if (lo.getAs[Long]("n") < hi.getAs[Long]("n")) {
      val countRatio = hi.getAs[Long]("n").toDouble / lo.getAs[Long]("n")
      val quotaRatio = hi.getAs[Long]("quota").toDouble /
        math.max(1L, lo.getAs[Long]("quota"))
      assert(quotaRatio <= countRatio + 1e-9)
    }
    // kept docs can never exceed the quota gate's range
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n"))
    }
  }

  test("semdedup_keep: kept set is maximal-greedy — every dropped vector has a kept-or-earlier near-dup") {
    val kept = q("semdedup_keep").select("vec_id").as[Long].collect().toSet
    val all = Tables.load(spark, sf001, "embeddings")
      .select("vec_id").as[Long].collect().toSet
    val dropped = all -- kept
    assert(kept.nonEmpty && dropped.nonEmpty, "fixture should split both ways")
    // re-derive the pair list and check the greedy rule directly
    val coefs = graft.ops.Similarity.centroidCoefs(
      SelectionQueries.SemK, SelectionQueries.SemDim)
    val e = Tables.load(spark, sf001, "embeddings")
      .select(col("vec_id"), col("embedding"),
        graft.functions.CentroidAssign(col("embedding"), coefs).as("cl"))
    val a = e.select(col("cl"), col("vec_id").as("va"), col("embedding").as("ea"))
    val b = e.select(col("cl"), col("vec_id").as("vb"), col("embedding").as("eb"))
    val near = a.join(b, Seq("cl")).filter(col("va") < col("vb"))
      .filter(graft.ops.Similarity.cosine(col("ea"), col("eb")) >= SelectionQueries.SemTau)
      .select("va", "vb").as[(Long, Long)].collect()
    val hasEarlierNeighbor = near.map(_._2).toSet
    assert(dropped === hasEarlierNeighbor, "drop set = vectors with a lower-id near-dup clustermate")
  }

  test("dsir lam: empty target domain still yields finite scores (smoothing floor)") {
    // tb = 0 everywhere must not produce NULL/NaN/-Inf — the +1/2
    // smoothing floors the ratio; scores just become uniformly negative
    import org.apache.spark.sql.functions._
    val dc = Seq(
      (1L, "fr", 3L, 5L), (2L, "fr", 7L, 2L), (3L, "zh", 3L, 1L)
    ).toDF("doc_id", "lang", "bk", "c")
    val lam = graft.queries.SelectionQueries.dsirLam(dc).collect()
    assert(lam.length === 2) // buckets 3 and 7
    lam.foreach { r =>
      val v = r.getAs[Long]("lam_u")
      assert(v < 0, "no-target buckets must score negative, not null")
    }
  }

  test("semdedupBatch: tau above max cosine keeps everything; empty store is safe") {
    import graft.streaming.StreamSelect
    val coefs = graft.ops.Similarity.centroidCoefs(
      SelectionQueries.SemK, SelectionQueries.SemDim)
    val batch = Tables.load(spark, sf001, "embeddings")
      .select("vec_id", "embedding").limit(50)
    val store = Seq.empty[(Long, Array[Float], Int)]
      .toDF("vec_id", "embedding", "cl")
    val (assigned, kept) = StreamSelect.semdedupBatch(batch, store, coefs, 1.1)
    assert(kept.count() === batch.count(), "tau > 1 must drop nothing")
    assert(assigned.columns.toSet === Set("vec_id", "embedding", "cl"))
  }

  test("hard_negatives: every mined negative carries a different label than its anchor") {
    val labels = Tables.load(spark, sf001, "embeddings")
      .select("vec_id", "label").as[(Long, Int)].collect().toMap
    val rows = q("hard_negatives").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val qid = r.getAs[Long]("q_id")
      val nid = r.getAs[Long]("n_id")
      assert(labels(nid) === r.getAs[Int]("n_label"))
      assert(labels(nid) !== labels(qid), s"negative $nid shares label with anchor $qid")
    }
    // per anchor: exactly k, ranked by descending similarity
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (_, g) =>
      assert(g.length === SelectionQueries.HardNegK)
      val sims = g.sortBy(_.getAs[Int]("rnk")).map(_.getAs[Double]("cos_sim")).toSeq
      assert(sims === sims.sorted(Ordering[Double].reverse))
    }
  }

  test("semantic_decontamination: sweep is monotone, rates consistent, eval slice excluded") {
    val rows = SparkEntry.queries("semantic_decontamination")(spark, sf001)
      .collect().sortBy(_.getDouble(0))
    assert(rows.length === 3)
    val nTrain = rows.head.getLong(1)
    rows.foreach { r =>
      assert(r.getLong(1) === nTrain, "n_train must not vary with tau")
      assert(r.getDouble(3) === r.getLong(2).toDouble / nTrain)
      if (r.getLong(2) > 0) {
        // the mean max-cos of contaminated docs must sit at or above tau
        assert(r.getDouble(4) >= r.getDouble(0))
      }
    }
    // monotone: a higher threshold can only shrink the contaminated set
    val ns = rows.map(_.getLong(2)).toSeq
    assert(ns === ns.sorted.reverse, s"sweep not monotone: $ns")
    assert(ns.head > 0, "the lowest threshold must catch something")
    // train + eval partition the table
    val total = spark.read.parquet(s"$sf001/embeddings.parquet").count()
    val eval = spark.read.parquet(s"$sf001/embeddings.parquet")
      .filter(col("vec_id") % 41 === 0 && col("vec_id") < 2000).count()
    assert(nTrain === total - eval)
  }
}
