package graft.ops

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Embedding similarity search (north-star extension set): brute-force
  * cosine top-k as the exactness baseline, random-hyperplane LSH
  * bucketing as the scale path, and IVF-style blocking by cluster id.
  *
  * Float determinism: dot products fold left-to-right over the array
  * index with each float promoted to double BEFORE multiplying, and
  * outputs are rounded — this is what lets a cosine computed by Spark
  * hash-match one computed by DuckDB.
  *
  * Scale design (100 TB of vectors): brute-force is O(Q*N) and only for
  * tests/small Q; the LSH path reduces the candidate set to one bucket
  * (and is embarrassingly partitionable on bucket id — at cluster scale
  * the vectors would be written bucketed/partitioned by `lshBucket` so
  * a query touches one partition). The hyperplane coefficients are
  * md5-derived constants, reproducible everywhere with no RNG state.
  */
object Similarity {

  /** Index-ordered dot product of two array columns, in double.
    *
    * r14: native codegen'd [[graft.functions.DotProduct]] — the
    * previous `aggregate(zip_with(...))` form (kept as [[dotHof]], the
    * parity reference DotProductSpec pins against) is CodegenFallback
    * and interprets two lambdas per ELEMENT; a cosine paid three such
    * evaluations per pair, the dominant per-task work of every
    * block-pair similarity join. Identical float semantics and null
    * semantics (see DotProduct doc), so every consumer's oracle hash
    * is unchanged.
    */
  def dot(a: Column, b: Column): Column = graft.functions.DotProduct(a, b)

  /** The pre-r14 higher-order-function formulation of [[dot]] — the
    * parity reference DotProductSpec pins [[dot]] against.
    */
  private[graft] def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y),
      lit(0.0), (acc, x) => acc + x)

  /** Dot product against CONSTANT coefficients, unrolled as a
    * left-to-right multiply-add chain of `element_at` terms. Higher-
    * order functions (zip_with/aggregate) have no codegen — they
    * interpret a lambda per element (~2.5 ms/row for 8x64-dim sims,
    * measured), which at corpus scale is hours of pure interpreter
    * overhead. The unrolled chain is whole-stage-codegen'd flops.
    * Identical float semantics to [[dot]]: same element order, cast
    * before multiply, left-fold addition from 0.0 (0.0+t0 == t0), so
    * oracle parity is unchanged.
    *
    * Use with care: an expression that DUPLICATES its sim operands
    * (ivfAssign's O(k^2) CASE chain) multiplies the unrolled terms
    * into janino-blowup territory — measured 12s compiles at k=8.
    * For argmax-only use [[graft.functions.CentroidAssign]] (one
    * reference object, constant-size code); for sims materialized
    * ONCE as columns the HOF [[dot]] stays the better trade at low
    * row counts and this unrolled form at high row counts.
    */
  def dotLit(a: Column, coefs: Array[Double]): Column =
    coefs.zipWithIndex.map { case (c, i) =>
      element_at(a, i + 1).cast("double") * lit(c)
    }.reduceLeft(_ + _)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** [[norm]] with the self-dot unrolled to `element_at` terms —
    * whole-stage-codegen'd flops instead of the HOF's per-element
    * interpreter (the [[dotLit]] trade; safe here because the terms
    * appear once). Bit-identical to [[norm]]: same element order,
    * float widened to double in each multiply, left-fold addition.
    */
  def normUnrolled(a: Column, dim: Int): Column =
    sqrt((0 until dim).map { i =>
      element_at(a, i + 1).cast("double") * element_at(a, i + 1)
    }.reduceLeft(_ + _))

  /** Cosine similarity rounded to 6 dp (cross-engine safe). */
  def cosine(a: Column, b: Column): Column =
    round(dot(a, b) / (norm(a) * norm(b)), 6)

  /** Deterministic ±1 hyperplane coefficients: sign of bit 0 of
    * md5("p,i"). Same construction is inlined as literals into the
    * DuckDB oracle, so both engines use the exact same planes.
    */
  def planeCoefs(planes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(planes, dim) { (p, i) =>
      val d = MessageDigest.getInstance("MD5")
        .digest(s"$p,$i".getBytes(StandardCharsets.UTF_8))
      if ((d(0) & 1) == 0) 1.0 else -1.0
    }

  /** LSH bucket id in [0, 2^planes): bit p set iff dot(v, plane_p) > 0. */
  def lshBucket(embedding: Column, coefs: Array[Array[Double]]): Column =
    coefs.zipWithIndex.map { case (plane, p) =>
      val planeArr = array(plane.map(lit(_)): _*)
      when(dot(embedding, planeArr) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** IVF coarse-quantizer centroids: K deterministic ±1 vectors
    * (md5-derived like [[planeCoefs]], distinct seed namespace). All
    * centroids share the same norm (sqrt(dim)), so ranking by raw dot
    * product equals ranking by cosine — [[centroidSims]] therefore
    * skips the normalization.
    */
  def centroidCoefs(k: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(k, dim) { (c, i) =>
      val d = MessageDigest.getInstance("MD5")
        .digest(s"ivf:$c,$i".getBytes(StandardCharsets.UTF_8))
      if ((d(0) & 1) == 0) 1.0 else -1.0
    }

  /** Rounded similarity of a vector to each centroid (cross-engine
    * comparable, so argmax/probe ranking agrees bit-for-bit).
    */
  def centroidSims(embedding: Column, coefs: Array[Array[Double]]): Seq[Column] =
    coefs.toSeq.map { cen =>
      round(dot(embedding, array(cen.map(lit(_)): _*)), 6)
    }

  /** IVF list assignment: index of the most-similar centroid, ties to
    * the lowest index (a pure CASE chain — map-only, no exchange; at
    * scale the table is written partitioned by this id and a probe
    * reads only its nprobe nearest lists).
    */
  def ivfAssign(sims: Seq[Column]): Column = {
    val k = sims.size
    (0 until k - 1).foldRight(lit(k - 1): Column) { (c, rest) =>
      when((c + 1 until k).map(o => sims(c) >= sims(o)).reduce(_ && _), lit(c))
        .otherwise(rest)
    }
  }

  /** One Lloyd (k-means) update step — the TRAINED coarse quantizer
    * the md5 centroids of [[centroidCoefs]] only approximate. Returns
    * (new centroids, member counts); an empty cluster keeps its
    * previous centroid.
    *
    * Distributed shape: centroids ride into the plan as literals (the
    * broadcast step of distributed Lloyd), assignment is the same
    * map-only CASE chain as [[ivfAssign]], and the update is a
    * posexplode -> groupBy(cluster, dim) partial aggregate — map-side
    * combine reduces each task's contribution to k*dim partials, so
    * the shuffle and the driver collect are k*dim scalars regardless
    * of corpus size.
    *
    * Determinism: per-dimension sums are DECIMAL(20,10) (exact,
    * order-independent — double sums would drift with partitioning),
    * so the new centroids are identical under any repartitioning and
    * reproducible by any engine with decimal arithmetic; means convert
    * to double only at the end (exact-decimal-to-double, the same
    * parity rule as every avg in this repo). Each component is
    * round(v, 6) BEFORE the decimal cast: v*10^6 is exactly
    * representable in double for float inputs (mantissa fits well
    * under 53 bits), so the 6-dp round is computed on the exact
    * product by every engine, and the decimal cast of the result sits
    * ~0.5e-10 from any rounding boundary — engines that implement
    * double->decimal via approximate double multiplication (vs exact
    * BigDecimal scaling) still agree. Without the pre-round, a raw
    * float component whose exact decimal expansion nears the scale-10
    * tie makes the two cast implementations disagree by 1 ulp
    * (observed once in 32k casts on the fixture).
    */
  def kmeansStep(df: DataFrame, embCol: String,
                 centroids: Array[Array[Double]]): (Array[Array[Double]], Array[Long]) = {
    // One LloydUpdateAgg partial aggregate (assignment + decimal-exact
    // per-dimension sums + counts in a single flat Long buffer): no
    // posexplode row inflation exists at any scale — each task folds
    // its rows into k·dim scalars, the single-partition exchange
    // carries n_partitions buffers, and the collect is ONE row. The
    // previous exploded formulation (kept as [[kmeansStepExploded]],
    // equality pinned by KMeansSpec) materialized dim·N (idx, v) rows
    // per iteration through the aggregation hash map. Assignment and
    // sums replay the identical quantized ops (see LloydUpdateAgg doc),
    // so the centroids are bit-identical.
    val k = centroids.length
    val dim = centroids(0).length
    val buf = df
      .select(graft.functions.LloydUpdateAgg(
        col(embCol), IndexedSeq(centroids), dim).as("b"))
      .head().getSeq[Long](0)
    val next = centroids.map(_.clone())
    val counts = new Array[Long](k)
    var c = 0
    while (c < k) {
      val n = buf(k * dim + c)
      if (n > 0) {
        counts(c) = n
        var i = 0
        while (i < dim) {
          // exact replay of CAST(sum_decimal AS DOUBLE) / n
          next(c)(i) = new java.math.BigDecimal(
            java.math.BigInteger.valueOf(buf(c * dim + i)), 10)
            .doubleValue() / n.toDouble
          i += 1
        }
      }
      c += 1
    }
    (next, counts)
  }

  /** The pre-r14 posexplode formulation of [[kmeansStep]] — retained
    * as the parity reference KMeansSpec pins the aggregate against
    * (same convention as censor_fold's two-step literal path).
    */
  private[graft] def kmeansStepExploded(df: DataFrame, embCol: String,
      centroids: Array[Array[Double]]): (Array[Array[Double]], Array[Long]) = {
    val k = centroids.length
    val cluster =
      graft.functions.CentroidAssign(col(embCol), centroids).as("c")
    val agg = df
      .select(cluster, posexplode(col(embCol)).as(Seq("idx", "v")))
      .groupBy("c", "idx")
      .agg(sum(round(col("v").cast("double"), 6).cast(DecimalType(20, 10))).as("s"),
        count(lit(1)).as("n"))
      .select(col("c"), col("idx"),
        (col("s").cast("double") / col("n")).as("m"), col("n"))
      .collect()
    val next = centroids.map(_.clone())
    val counts = new Array[Long](k)
    agg.foreach { r =>
      val c = r.getInt(0)
      next(c)(r.getInt(1)) = r.getDouble(2)
      counts(c) = r.getLong(3)
    }
    (next, counts)
  }

  /** `iters` Lloyd steps from the deterministic md5 init. */
  def kmeansTrain(df: DataFrame, embCol: String, k: Int, dim: Int,
                  iters: Int): (Array[Array[Double]], Array[Long]) =
    kmeansTrainFrom(df, embCol, centroidCoefs(k, dim), iters)

  /** [[kmeansTrain]] from an explicit init — product quantization
    * trains one codebook per subvector slice, each from its own
    * namespaced init ([[pqInitCoefs]]) so slices don't share a seed.
    */
  def kmeansTrainFrom(df: DataFrame, embCol: String,
                      init: Array[Array[Double]],
                      iters: Int): (Array[Array[Double]], Array[Long]) = {
    var cents = init
    var counts = new Array[Long](init.length)
    (0 until iters).foreach { _ =>
      val (nc, cn) = kmeansStep(df, embCol, cents)
      cents = nc; counts = cn
    }
    (cents, counts)
  }

  /** Deterministic ±1 codebook init for PQ subspace `m` (md5 like
    * [[centroidCoefs]], distinct seed namespace per subspace).
    */
  def pqInitCoefs(m: Int, k: Int, subDim: Int): Array[Array[Double]] =
    Array.tabulate(k, subDim) { (c, i) =>
      val d = MessageDigest.getInstance("MD5")
        .digest(s"pq:$m:$c,$i".getBytes(StandardCharsets.UTF_8))
      if ((d(0) & 1) == 0) 1.0 else -1.0
    }

  /** One Lloyd step for ALL product-quantization subspaces in a single
    * distributed job — per-subspace math identical to [[kmeansStep]]
    * on the slice (pinned by KMeansSpec), but M codebooks train in 1
    * scan + 1 shuffle + 1 collect instead of M of each: per row,
    * explode to one (subspace, assigned cluster, subvector) struct per
    * subspace, then a (m, c, idx)-grouped decimal-exact mean. Shuffle
    * and collect carry M*k*subDim scalars regardless of corpus size —
    * the same contract as kmeansStep, M times fewer jobs (ann_pq at
    * sf0.1: 6.4 s -> 4.2 s, 16 training jobs -> 2).
    */
  def pqStep(df: DataFrame, embCol: String,
             cbs: IndexedSeq[Array[Array[Double]]],
             subDim: Int): IndexedSeq[Array[Array[Double]]] = {
    // Same LloydUpdateAgg rewrite as [[kmeansStep]], M subspaces in the
    // one buffer: the old form (kept as [[pqStepExploded]], pinned by
    // KMeansSpec) exploded each row M ways and then posexploded each
    // subvector — M·subDim·N materialized rows per iteration; here the
    // scan folds straight into M·k·subDim scalars per task.
    val m = cbs.length
    val k = cbs.head.length
    val buf = df
      .select(graft.functions.LloydUpdateAgg(col(embCol), cbs, subDim).as("b"))
      .head().getSeq[Long](0)
    val next = cbs.map(_.map(_.clone()))
    var mm = 0
    while (mm < m) {
      var c = 0
      while (c < k) {
        val n = buf(m * k * subDim + mm * k + c)
        if (n > 0) {
          var i = 0
          while (i < subDim) {
            next(mm)(c)(i) = new java.math.BigDecimal(
              java.math.BigInteger.valueOf(buf((mm * k + c) * subDim + i)), 10)
              .doubleValue() / n.toDouble
            i += 1
          }
        }
        c += 1
      }
      mm += 1
    }
    next
  }

  /** The pre-r14 explode formulation of [[pqStep]] — the parity
    * reference KMeansSpec pins the aggregate against.
    */
  private[graft] def pqStepExploded(df: DataFrame, embCol: String,
      cbs: IndexedSeq[Array[Array[Double]]],
      subDim: Int): IndexedSeq[Array[Array[Double]]] = {
    val entries = cbs.indices.map { m =>
      struct(lit(m).as("m"),
        graft.functions.CentroidAssign(
          slice(col(embCol), m * subDim + 1, subDim), cbs(m)).as("c"),
        slice(col(embCol), m * subDim + 1, subDim).as("sub"))
    }
    val agg = df.select(explode(array(entries: _*)).as("e"))
      .select(col("e.m").as("m"), col("e.c").as("c"),
        posexplode(col("e.sub")).as(Seq("idx", "v")))
      .groupBy("m", "c", "idx")
      .agg(sum(round(col("v").cast("double"), 6).cast(DecimalType(20, 10))).as("s"),
        count(lit(1)).as("n"))
      .select(col("m"), col("c"), col("idx"),
        (col("s").cast("double") / col("n")).as("mean"))
      .collect()
    val next = cbs.map(_.map(_.clone()))
    agg.foreach { r =>
      next(r.getInt(0))(r.getInt(1))(r.getInt(2)) = r.getDouble(3)
    }
    next
  }
}
