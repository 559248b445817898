package graft.queries

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Distributed linear algebra over the embedding table — the two
  * classics a vector pipeline runs before/beside ANN: principal
  * component extraction (the one-pass Gramian-census + power-iteration
  * scheme; MLlib's RowMatrix computes the same Gramian then
  * eigendecomposes on the driver — here the iteration stays IN the
  * dataflow so the oracle can check it) and Johnson–Lindenstrauss
  * random projection with a measured distortion audit.
  *
  * Scale shape: ONE corpus pass reduces N×d vectors to the d×d
  * second-moment census via a single partial aggregate
  * ([[graft.functions.GramMatrixAgg]] — each task folds rows into one
  * flat d²-ish Long buffer; the exchange carries n_partitions buffers
  * of scalars, never rows or vectors), and every iteration/projection
  * step after that is census-sized broadcast algebra. At 100 TB only
  * the first pass touches the corpus.
  *
  * Determinism: embeddings quantize to integer micro-units with the
  * suite's floor(x*1e6 + 0.5) rule; all sums are exact integer/DECIMAL
  * with explicit widths chosen so every product stays under DuckDB's
  * 38-digit multiply cap; the per-iteration renormalization is the one
  * double step, written identically in both engines.
  */
object LinAlgQueries {

  private val Dim = SimilarityQueries.Dim // 64
  private val Iters = 10 // power-iteration rounds (census-sized each)

  /** Deterministic ±1 sign matrix for the JL projection, j*Dim+d flat:
    * parity of the PortableHash-style md5-derived 32-bit value. */
  private val RpK = 16
  private lazy val rpSigns: IndexedSeq[Long] = {
    def h(tag: String): Long = {
      val d = MessageDigest.getInstance("MD5")
        .digest(tag.getBytes(StandardCharsets.UTF_8))
      ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    }
    for (j <- 0 until RpK; d <- 0 until Dim)
      yield if ((h(s"rp|$j|$d") & 1L) == 0L) 1L else -1L
  }

  /** Micro-unit quantization of the embedding array, both engines. */
  private val duckU =
    "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT))"
  private val sparkU =
    "transform(embedding, x -> cast(floor(cast(x as double) * 1000000.0 + 0.5) as bigint))"

  def all: Seq[Q] = Seq(

    // top principal direction via `Iters` power iterations on the
    // CENTERED second-moment matrix M = n·Σuuᵀ − (Σu)(Σu)ᵀ (all exact
    // integer censuses — covariance without ever materializing means).
    // Each iterate renormalizes to integer micro-units by its max-|w|
    // component, so iterates are engine-exact; GovernanceSpec replays
    // the identical integer algorithm in plain JVM loops and checks
    // the Rayleigh quotient approaches the converged one.
    {
      // each iteration references its predecessor exactly ONCE (the
      // max-|w| renormalizer is a whole-frame window over the 64-row
      // iterate, not a second scalar branch), so the plan grows
      // LINEARLY in Iters — a scalar-subquery form doubles the
      // subtree per round and goes exponential
      val iterSql = (1 to Iters).map { t =>
        val pv = if (t == 1) "v0" else s"v${t - 1}"
        s"""w$t AS (SELECT mm.i, CAST(SUM(mm.mv * CAST($pv.v AS DECIMAL(8,0))) AS DECIMAL(32,0)) AS w
           |  FROM mm JOIN $pv ON mm.j = $pv.i GROUP BY 1),
           |v$t AS (SELECT i, CASE WHEN MAX(abs(w)) OVER () > 0
           |    THEN CAST(floor(CAST(w AS DOUBLE) / CAST(MAX(abs(w)) OVER () AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
           |    ELSE CAST(0 AS BIGINT) END AS v
           |  FROM w$t)""".stripMargin
      }.mkString(",\n")
      Q("pca_power_iteration",
        s"""WITH e AS (SELECT $duckU AS u FROM embeddings),
          |n AS (SELECT CAST(COUNT(*) AS DECIMAL(8,0)) AS n FROM e),
          |m AS (SELECT di.i AS i, CAST(SUM(u[di.i]) AS DECIMAL(18,0)) AS s
          |  FROM e, range(1, ${Dim + 1}) di(i) GROUP BY 1),
          |p AS (SELECT di.i AS i, dj.j AS j,
          |    CAST(SUM(CAST(u[di.i] AS DECIMAL(17,0)) * u[dj.j]) AS DECIMAL(18,0)) AS sp
          |  FROM e, range(1, ${Dim + 1}) di(i), range(1, ${Dim + 1}) dj(j)
          |  GROUP BY 1, 2),
          |mm AS (SELECT p.i, p.j,
          |    CAST(n.n * p.sp - mi.s * mj.s AS DECIMAL(22,0)) AS mv
          |  FROM p JOIN m mi ON p.i = mi.i JOIN m mj ON p.j = mj.i CROSS JOIN n),
          |v0 AS (SELECT r.i AS i, CAST(1000000 AS BIGINT) AS v FROM range(1, ${Dim + 1}) r(i)),
          |$iterSql
          |SELECT i - 1 AS dim_idx, v AS v_scaled FROM v$Iters ORDER BY dim_idx""".stripMargin) { (s, dir) =>
        // spread the scan: the d(d+1)/2 multiply-adds per row are the
        // heavy stage and must not run in the fixture's single
        // row-group task
        val e = Tables.parallelize(
          Tables.load(s, dir, "embeddings").select(expr(sparkU).as("u")))
        // ONE corpus pass -> the full second-moment census as a single
        // partial aggregate (graft.functions.GramMatrixAgg): each task
        // folds its rows into a flat Long buffer (triangle Gram +
        // per-dim sums + count), the exchange carries n_partitions
        // buffers of d²+d+1 scalars — no row inflation exists at any
        // scale (the prior d²-cell explode materialized d²·N rows and
        // went GC-bound at the 30× probe). Exact-Long sums == the
        // oracle's DECIMAL sums, reassociated order-independently.
        val d2 = Dim * Dim
        val packed = e
          .agg(graft.functions.GramMatrixAgg(col("u"), Dim).as("g"))
          .localCheckpoint(true) // ONE row; every consumer below re-slices it
        val pairs = packed
          .select(posexplode(slice(col("g"), 1, d2)).as(Seq("pidx", "sp_l")))
          .select((col("pidx") / Dim).cast("int").as("i"),
            pmod(col("pidx"), lit(Dim)).cast("int").as("j"),
            col("sp_l").cast(DecimalType(18, 0)).as("sp"))
        val means = packed
          .select(posexplode(slice(col("g"), d2 + 1, Dim)).as(Seq("i", "s_l")))
          .select(col("i"), col("s_l").cast(DecimalType(18, 0)).as("s"))
        val nRow = packed.select(
          element_at(col("g"), d2 + Dim + 1).cast(DecimalType(8, 0)).as("n"))
        val mi = means.select(col("i").as("mi_i"), col("s").as("mi_s"))
        val mj = means.select(col("i").as("mj_i"), col("s").as("mj_s"))
        // materialize the census ONCE (the pagerank/CC per-round
        // pattern): every iteration re-reads 4096 checkpointed rows
        // instead of re-running the corpus pass
        val mm = pairs
          .join(broadcast(mi), col("i") === col("mi_i"))
          .join(broadcast(mj), col("j") === col("mj_i"))
          .crossJoin(broadcast(nRow))
          .select(col("i"), col("j"),
            (col("n") * col("sp") - col("mi_s") * col("mj_s"))
              .cast(DecimalType(22, 0)).as("mv"))
          .localCheckpoint(true)
        val spark = s
        import spark.implicits._
        var v: DataFrame = (0 until Dim).map(i => (i, 1000000L))
          .toDF("vi", "v")
        // the renormalizer is a whole-frame window (single reference
        // to w per round -> linear plan growth; see the oracle note).
        // NB: Spark's transform/posexplode indices are 0-based (DuckDB
        // lists are 1-based; its SQL subtracts 1 only at the end)
        val whole = org.apache.spark.sql.expressions.Window
          .rowsBetween(Long.MinValue, Long.MaxValue)
        for (_ <- 1 to Iters) {
          val w = mm.join(broadcast(v), col("j") === col("vi"))
            .groupBy("i")
            .agg(sum(col("mv") * col("v").cast(DecimalType(8, 0)))
              .cast(DecimalType(32, 0)).as("w"))
          // an all-identical corpus gives M = 0 -> max|w| = 0: emit the
          // zero iterate instead of an ANSI divide-by-zero
          v = w.select(col("i").as("vi"),
            when(max(abs(col("w"))).over(whole) > 0,
              floor(col("w").cast("double")
                / max(abs(col("w"))).over(whole).cast("double")
                * 1000000.0 + 0.5).cast("long")).otherwise(lit(0L)).as("v"))
        }
        v.select(col("vi").as("dim_idx"), col("v").as("v_scaled"))
          .orderBy("dim_idx")
      }
    },

    // JL random-projection distortion audit: project to RpK dims with
    // the deterministic ±1 sign matrix (ONE Scala-derived literal for
    // both engines), then histogram the per-vector energy ratio
    // ‖p‖²/(k·‖u‖²) — concentrated near 1.0 when the projection
    // preserves geometry (the JL lemma's norm-preservation form, which
    // extends to pairwise distances by linearity). All inner products
    // are exact integer sums; the ratio quantizes to micro-units
    // before the census so the mean is order-free.
    {
      val smLit = rpSigns.mkString("[", ", ", "]")
      Q("rp_project_audit",
        s"""WITH sm AS (SELECT $smLit AS sm),
          |e AS (SELECT vec_id, $duckU AS u FROM embeddings),
          |pj AS (SELECT vec_id, r.j AS j,
          |    list_sum(list_transform(range(1, ${Dim + 1}), k -> u[k] * sm[r.j * $Dim + k])) AS p
          |  FROM e, sm, range(0, $RpK) r(j)),
          |pv AS (SELECT vec_id, CAST(SUM(p * p) AS BIGINT) AS pp FROM pj GROUP BY 1),
          |uv AS (SELECT vec_id, CAST(list_sum(list_transform(u, x -> x * x)) AS BIGINT) AS uu FROM e),
          |r AS (SELECT pv.vec_id,
          |    CASE WHEN uu > 0
          |      THEN CAST(floor(CAST(pp AS DOUBLE) / ($RpK.0 * CAST(uu AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
          |      END AS r_u
          |  FROM pv JOIN uv ON pv.vec_id = uv.vec_id)
          |SELECT r_u // 100000 AS ratio_bin, COUNT(*) AS n_vecs,
          |  round(CAST(SUM(r_u) AS DOUBLE) / COUNT(*) / 1000000.0, 6) AS mean_ratio
          |FROM r GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
        val sm = typedLit(rpSigns)
        val e = Tables.load(s, dir, "embeddings")
          .select(col("vec_id"), expr(sparkU).as("u"))
          .withColumn("uu",
            aggregate(transform(col("u"), x => x * x), lit(0L), _ + _))
        val pj = e
          .select(col("vec_id"), col("uu"), col("u"),
            explode(sequence(lit(0), lit(RpK - 1))).as("j"))
          .select(col("vec_id"), col("uu"),
            aggregate(
              zip_with(col("u"), slice(sm, col("j") * Dim + 1, lit(Dim)),
                (a, b) => a * b),
              lit(0L), _ + _).as("p"))
        val r = pj.groupBy("vec_id")
          .agg(sum(col("p") * col("p")).cast("long").as("pp"),
            first(col("uu")).as("uu"))
          // a zero vector has no energy ratio: NULL, not divide-by-zero
          .select(when(col("uu") > 0, floor(col("pp").cast("double")
            / (lit(RpK.toDouble) * col("uu").cast("double"))
            * 1000000.0 + 0.5).cast("long")).as("r_u"))
        r.groupBy(expr("r_u div 100000").as("ratio_bin"))
          .agg(count(lit(1)).as("n_vecs"),
            round(sum(col("r_u")).cast("double") / count(lit(1)) / 1000000.0, 6)
              .as("mean_ratio"))
          .orderBy("ratio_bin")
      }
    }
  )
}
