package graft

import org.apache.spark.sql.functions._

import graft.ops.Similarity

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8

  private def vecs(n: Int): Seq[(Long, Array[Float])] =
    (0 until n).map { i =>
      // two well-separated blobs: +1-ish and -1-ish, deterministic jitter
      val sign = if (i % 2 == 0) 1f else -1f
      (i.toLong, Array.tabulate(dim)(d => sign * (1f + ((i * 31 + d * 7) % 10) / 100f)))
    }

  test("native CentroidAssign matches composed ivfAssign(centroidSims) exactly") {
    import graft.functions.CentroidAssign
    import graft.ops.Similarity.{centroidSims, ivfAssign}
    // real float vectors (the fixture) — any rounding or tie-break
    // divergence between the native loop and the composed columns
    // would surface as a differing assignment
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val cents = Similarity.centroidCoefs(8, 64)
    val both = emb.select(
      CentroidAssign(col("embedding"), cents).as("native"),
      ivfAssign(centroidSims(col("embedding"), cents)).as("composed"))
    assert(both.filter(col("native") =!= col("composed")).count() === 0)
    // and after one data-dependent (non-±1) update, still equal
    val (c1, _) = Similarity.kmeansStep(emb, "embedding", cents)
    val both1 = emb.select(
      CentroidAssign(col("embedding"), c1).as("native"),
      ivfAssign(centroidSims(col("embedding"), c1)).as("composed"))
    assert(both1.filter(col("native") =!= col("composed")).count() === 0)
  }

  test("native PqLut matches the composed round(subDot) columns exactly") {
    import graft.functions.PqLut
    // same parity contract as CentroidAssign above: the native loop
    // must reproduce the unrolled element_at fold bit-for-bit on real
    // float vectors, entry by entry, or the ADC scores drift
    val pqM = 8; val pqSub = 8; val pqK = 4
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val cbs: Array[Array[Array[Double]]] =
      Array.tabulate(pqM)(m => Similarity.pqInitCoefs(m, pqK, pqSub))
    def subDot(m: Int, cen: Array[Double]) =
      cen.zipWithIndex.map { case (cv, i) =>
        element_at(col("embedding"), m * pqSub + i + 1).cast("double") * lit(cv)
      }.reduceLeft(_ + _)
    val lutCols = for { m <- 0 until pqM; c <- 0 until pqK }
      yield round(subDot(m, cbs(m)(c)), 6)
    val both = emb.select(PqLut(col("embedding"), cbs).as("native"),
      array(lutCols: _*).as("composed"))
    assert(both.filter(col("native") =!= col("composed")).count() === 0)
  }

  test("LloydUpdateAgg step equals the exploded decimal-sum step, bit-exactly") {
    // the r14 rewrite: one TypedImperativeAggregate buffer instead of
    // posexplode + groupBy(cluster, idx) decimal sums. Pin both Lloyd
    // variants against the retained exploded formulation on the REAL
    // float fixture — centroids AND counts must match bit-for-bit,
    // from the md5 init and again from a data-dependent matrix.
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    var cents = Similarity.centroidCoefs(8, 64)
    (0 until 2).foreach { _ =>
      val (na, nn) = Similarity.kmeansStep(emb, "embedding", cents)
      val (ea, en) = Similarity.kmeansStepExploded(emb, "embedding", cents)
      assert(nn.toSeq === en.toSeq)
      assert(na.map(_.toSeq).toSeq === ea.map(_.toSeq).toSeq)
      cents = na
    }
    val (pqM, pqK, pqSub) = (8, 4, 8)
    var cbs: IndexedSeq[Array[Array[Double]]] =
      (0 until pqM).map(m => Similarity.pqInitCoefs(m, pqK, pqSub))
    (0 until 2).foreach { _ =>
      val agg = Similarity.pqStep(emb, "embedding", cbs, pqSub)
      val exp = Similarity.pqStepExploded(emb, "embedding", cbs, pqSub)
      assert(agg.map(_.map(_.toSeq).toSeq) === exp.map(_.map(_.toSeq).toSeq))
      cbs = agg
    }
  }

  test("kmeansStep is exactly deterministic under repartitioning") {
    val df = vecs(200).toDF("vec_id", "embedding")
    val init = Similarity.centroidCoefs(4, dim)
    val (c1, n1) = Similarity.kmeansStep(df.repartition(13), "embedding", init)
    val (c2, n2) = Similarity.kmeansStep(df.coalesce(1), "embedding", init)
    assert(n1.toSeq === n2.toSeq)
    // decimal-exact sums: bit-identical, not approximately equal
    assert(c1.map(_.toSeq).toSeq === c2.map(_.toSeq).toSeq)
  }

  test("pqStep (all subspaces in one job) equals kmeansTrainFrom per slice, bit-exactly") {
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val (pqM, pqK, pqSub) = (8, 4, 8)
    var batched: IndexedSeq[Array[Array[Double]]] =
      (0 until pqM).map(m => Similarity.pqInitCoefs(m, pqK, pqSub))
    batched = Similarity.pqStep(emb, "embedding", batched, pqSub)
    batched = Similarity.pqStep(emb, "embedding", batched, pqSub)
    (0 until pqM).foreach { m =>
      val (perSlice, _) = Similarity.kmeansTrainFrom(
        emb.select(slice(col("embedding"), m * pqSub + 1, pqSub).as("sub")),
        "sub", Similarity.pqInitCoefs(m, pqK, pqSub), 2)
      assert(batched(m).map(_.toSeq).toSeq === perSlice.map(_.toSeq).toSeq,
        s"subspace $m codebooks diverge between batched and per-slice training")
    }
  }

  test("empty clusters keep their previous centroid") {
    // all vectors identical -> they all land in ONE cluster; the other
    // three centroids must come through unchanged
    val df = Seq.fill(50)(1L -> Array.fill(dim)(0.5f))
      .zipWithIndex.map { case ((_, v), i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    val init = Similarity.centroidCoefs(4, dim)
    val (next, counts) = Similarity.kmeansStep(df, "embedding", init)
    assert(counts.count(_ == 0L) === 3)
    assert(counts.sum === 50L)
    val winner = counts.indexWhere(_ == 50L)
    (0 until 4).filter(_ != winner).foreach { c =>
      assert(next(c).toSeq === init(c).toSeq, s"empty cluster $c drifted")
    }
    // the occupied centroid moved to the common point (up to 6-dp quantization)
    assert(next(winner).forall(v => math.abs(v - 0.5) < 1e-6))
  }

  test("trained IVF probe: recall vs brute force, floor pinned, vs untrained reported") {
    import org.apache.spark.sql.expressions.Window
    val byName = SparkEntry.allQueries.map(q => q.name -> q).toMap
    // exact top-5 for the SAME probe set (vec_id < 20) as the IVF queries
    val e = Tables.load(spark, sf0001, "embeddings")
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
    val n = e.select(col("vec_id").as("n_id"), col("embedding").as("ne"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("n_id"))
    val exact = n.join(broadcast(q), col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"),
        Similarity.cosine(col("qe"), col("ne")).as("cos_sim"))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    def recall(name: String): Double = {
      val got = byName(name).run(spark, sf0001)
        .select("q_id", "n_id").as[(Long, Long)].collect().toSet
      (exact & got).size.toDouble / exact.size
    }
    val trained = recall("ann_ivf_trained")
    val untrained = recall("ann_ivf")
    info(f"recall@5: trained=$trained%.3f untrained=$untrained%.3f (nprobe 2 of 4 lists)")
    // floor: nprobe/K of the corpus is searched; trained lists must not
    // collapse below the untrained baseline's neighborhood quality
    assert(trained >= 0.5, f"trained IVF recall collapsed: $trained%.3f")
  }

  test("training improves within-cluster cosine cohesion over the md5 init") {
    val df = vecs(200).toDF("vec_id", "embedding")
    def cohesion(cents: Array[Array[Double]]): Double = {
      val sims = Similarity.centroidSims(col("embedding"), cents)
      df.select(greatest(sims: _*).as("best"))
        .agg(avg(col("best"))).as[Double].head()
    }
    val init = Similarity.centroidCoefs(2, dim)
    val (trained, counts) = Similarity.kmeansTrain(df, "embedding", 2, dim, 2)
    assert(counts.sum === 200L)
    assert(cohesion(trained) > cohesion(init),
      "two Lloyd steps should raise mean best-centroid dot product")
  }
}
