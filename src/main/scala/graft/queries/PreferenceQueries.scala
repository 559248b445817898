package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** PREFERENCE-DATA PREP — the reward-modeling stage of an LLM
  * pipeline (RLHF / DPO): construct (chosen, rejected) preference
  * pairs from ranked candidate groups, fit a Bradley–Terry strength
  * per competitor from the pairwise-win census (the preference model
  * reward modeling rests on; Hunter 2004's MM algorithm), and audit
  * the pairwise win-rate matrix with a Wilson lower bound (the
  * annotator/policy comparison grid). The reference has no analogue
  * (single moderation topology); this is north-star widening.
  *
  * The corpus carries no prompt/candidate structure, so it is derived
  * DETERMINISTICALLY: documents bucket into prompt groups of 8 by
  * doc_id, and a candidate's score is the integer quality proxy
  * (Gopher-pass bonus + token count) computed by the suite's shared
  * scan-fused profile projection ([[SelectionQueries
  * .curationProfiles]] — text parsed once). Same expressions verbatim
  * in DuckDB.
  *
  * SCALE SHAPES: the in-group rank/self-join is keyed on the prompt
  * group (corpus-wide exchanges hash-partition on pg; groups are 8
  * wide, so the match explode is a bounded 28 pairs/group); every
  * downstream censusis keyed on the 10-source grid. The
  * Bradley–Terry MM iteration runs entirely on the |sources|²-bounded
  * win/match census — census-only at 100 TB once the match census is
  * persisted. Float discipline: strengths live in fixed-point BIGINT
  * nano-units (the host_link_rank discipline); each MM term is
  * quantized to an integer micro-unit BEFORE summation, so both
  * engines sum exact integers and every float op runs on identical
  * inputs.
  */
object Preference {

  /** Candidates: (doc_id, source, pg, score) — prompt group of 8,
    * integer quality score (Gopher-pass bonus 1000 + token count).
    * Works on any frame carrying (doc_id, lang, source, text) — incl.
    * a streaming one ([[graft.streaming.StreamPreference]] applies it
    * per micro-batch; narrow ops only, so it is streaming-legal).
    */
  private[graft] def candidatesOf(docs: DataFrame): DataFrame = {
    val prof = SelectionQueries.curationProfiles(
      docs.select("doc_id", "lang", "source", "text"))
    val q = SelectionQueries.gopherQuality
    // exact LONG division (the engine-pairing convention for DuckDB's
    // `//`): floor(doc_id / 8) would round-trip through a double and
    // diverge from the oracle once doc_id exceeds 2^53
    prof.select(col("doc_id"), col("source"),
      expr("doc_id div 8").as("pg"),
      (when(q, lit(1000L)).otherwise(lit(0L)) + col("n_tokens")).as("score"))
  }

  private[graft] def candidates(s: SparkSession, dir: String): DataFrame =
    candidatesOf(Tables.parallelize(Tables.load(s, dir, "documents")))

  /** DuckDB twin — CTE chain (expects [[WebCuration.duckProfiles]]'
    * `fd` in scope) ending in `sc` (doc_id, source, pg, score).
    */
  private[graft] val duckCandidates: String =
    """sc AS (SELECT doc_id, source, doc_id // 8 AS pg,
      |    (CASE WHEN q THEN 1000 ELSE 0 END + n_tokens) AS score FROM fd)""".stripMargin

  /** Unordered-pair win census between sources: one row per source
    * pair {s1 < s2} with total matches and s1's wins. A match is any
    * two candidates sharing a prompt group (bounded 28/group); the
    * winner is the higher score, doc_id ascending on ties. Self-pairs
    * (both candidates from one source) are uninformative for
    * cross-source strength and are excluded.
    */
  private[graft] def matchCensus(cand: DataFrame): DataFrame = {
    // in-group pairs via the in-bucket group-explode (Dedup.bucketPairs
    // — the repo's candidate-generation idiom) instead of a pg
    // self-join: the self-join re-derived the candidate pipeline (the
    // scan-fused profile projection, i.e. a full text parse) for BOTH
    // sides and shuffled it twice; the group-explode derives it once
    // and exchanges once on pg (guide §2.4). Groups are 8 wide by
    // construction, so the local expansion is a bounded 28 pairs/group.
    // Payload sorts by its first field (doc_id, unique per group), so
    // a.doc_id < b.doc_id — exactly the self-join's da < db half-pairs,
    // making the original tie-break `da < db` identically true here.
    val pairs = graft.ops.Dedup.bucketPairs(cand, Seq(col("pg")),
      struct(col("doc_id"), col("source"), col("score")))
    val wsrc = when(col("a.score") > col("b.score") ||
      (col("a.score") === col("b.score") &&
        col("a.doc_id") < col("b.doc_id")), col("a.source"))
      .otherwise(col("b.source"))
    pairs.filter(col("a.source") =!= col("b.source"))
      .select(least(col("a.source"), col("b.source")).as("s1"),
        greatest(col("a.source"), col("b.source")).as("s2"),
        wsrc.as("wsrc"))
      .groupBy("s1", "s2")
      .agg(count(lit(1)).cast("long").as("m"),
        sum(when(col("wsrc") === col("s1"), 1).otherwise(0))
          .cast("long").as("w1"))
  }

  /** DuckDB twin of [[matchCensus]] — ends in `mc` (s1, s2, m, w1);
    * expects `sc`.
    */
  private[graft] val duckMatchCensus: String =
    """mt AS (SELECT least(a.source, b.source) AS s1,
      |    greatest(a.source, b.source) AS s2,
      |    CASE WHEN a.score > b.score
      |        OR (a.score = b.score AND a.doc_id < b.doc_id)
      |      THEN a.source ELSE b.source END AS wsrc
      |  FROM sc a JOIN sc b ON a.pg = b.pg AND a.doc_id < b.doc_id
      |  WHERE a.source <> b.source),
      |mc AS MATERIALIZED (SELECT s1, s2, CAST(COUNT(*) AS BIGINT) AS m,
      |    CAST(SUM(CASE WHEN wsrc = s1 THEN 1 ELSE 0 END) AS BIGINT) AS w1
      |  FROM mt GROUP BY s1, s2)""".stripMargin

  private[graft] val BtIters = 8

  /** Hunter-2004 MM fit over the match census — the shared engine of
    * bradley_terry_rank and bt_confidence (see bradley_terry_rank's
    * header for the fixed-point/lineage discipline). Returns
    * (mm directed-census, wins, mtot, r) where r = (i, r BIGINT nanos)
    * after [[BtIters]] iterations, mean-1-normalized.
    */
  private[graft] def btFit(mc: DataFrame)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val spark = mc.sparkSession
    import spark.implicits._
    // CENSUS-BOUNDED COLLECT (the repo's established convention): mc is
    // |sources|²-bounded by construction (≤ 190 rows on the 10-source
    // grid at ANY corpus scale — the corpus was already reduced by the
    // match-census pass). The MM iteration used to run 8 rounds of
    // joins + eager localCheckpoints through the scheduler: ~16 jobs
    // of pure fixed overhead iterating a 20-row frame (measured r14:
    // the two BT queries spent ~2.4 s each on it at sf0.1). The local
    // replay below performs the EXACT same quantized operations in the
    // exact same order — floor(x + 0.5) on IEEE doubles with the same
    // long→double coercion points, exact Long sums (order-independent)
    // — so every strength is bit-identical to the dataflow version
    // (oracle hash unchanged; proven against the DuckDB oracle).
    val mcL = mc.select(col("s1"), col("s2"), col("m"), col("w1"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    val mmL: Seq[(String, String, Long)] =
      mcL.map(t => (t._1, t._2, t._3)) ++ mcL.map(t => (t._2, t._1, t._3))
    val winsL: Map[String, Long] =
      (mcL.map(t => (t._1, t._4)) ++ mcL.map(t => (t._2, t._3 - t._4)))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    val mtotL: Map[String, Long] =
      mmL.groupBy(_._1).map { case (k, v) => k -> v.map(_._3).sum }
    var rL: Map[String, Long] = winsL.map { case (k, _) => k -> 1000000000L }
    for (_ <- 1 to BtIters) {
      // tq = floor(m * 1.0e15 / greatest(rI + rJ, 1) + 0.5): long m
      // widens to double at the multiply, the long denominator at the
      // divide — the same coercions Catalyst inserted
      val d: Map[String, Long] = mmL.groupBy(_._1).map { case (i, es) =>
        i -> es.map { case (_, j, m) =>
          math.floor(m.toDouble * 1.0e15 /
            math.max(rL(i) + rL(j), 1L).toDouble + 0.5).toLong
        }.sum
      }
      val u: Map[String, Long] = winsL.map { case (i, w) =>
        i -> math.floor(w.toDouble * 1.0e15 /
          math.max(d(i), 1L).toDouble + 0.5).toLong
      }
      val sr = u.values.sum
      val nk = u.size.toLong
      // r = floor(r * nk * 1.0e9 / sr + 0.5): r*nk is a LONG multiply
      // (as Catalyst planned it), widening to double at * 1.0e9
      rL = u.map { case (i, x) =>
        i -> math.floor((x * nk).toDouble * 1.0e9 / sr.toDouble + 0.5).toLong
      }
    }
    val mm = mmL.toDF("i", "j", "m")
    val wins = winsL.toSeq.sortBy(_._1).toDF("i", "W")
    val mtot = mtotL.toSeq.sortBy(_._1).toDF("i", "M")
    val r = rL.toSeq.sortBy(_._1).toDF("i", "r")
    (mm, wins, mtot, r)
  }

  /** bt_confidence's whole computation over a match census — shared
    * by the query and PreferenceSpec's census-doubling pin (doubling
    * every (m, w1) cell leaves the scale-free MM fixed point in place
    * but doubles every Fisher term, so se_log must shrink by 1/√2).
    */
  private[graft] def btConfidence(mc: DataFrame): DataFrame = {
    val (mm, _, mtot, r) = btFit(mc)
    val ri = r.select(col("i").as("ii"), col("r").as("rI"))
    val rj = r.select(col("i").as("jj"), col("r").as("rJ"))
    val p = col("rI").cast("double") / (col("rI") + col("rJ"))
    val fi = mm.join(broadcast(ri), mm("i") === ri("ii"))
      .join(broadcast(rj), mm("j") === rj("jj"))
      .select(col("i"),
        floor(col("m") * (p * (lit(1) - p)) * lit(1.0e12) + lit(0.5))
          .cast("long").as("fq"))
    val info = fi.groupBy("i").agg(sum("fq").as("fsum"))
    val seLog = lit(1.0) /
      sqrt(greatest(col("fsum"), lit(1L)).cast("double") / lit(1.0e12))
    r.join(broadcast(info), "i").join(broadcast(mtot), "i")
      .select(col("i").as("source"),
        (col("r").cast("double") / lit(1000000000L)).as("strength"),
        col("M").as("matches"), seLog.as("se_log"))
      .select(col("source"), col("strength"), col("matches"), col("se_log"),
        (col("strength") - lit(1.96) * col("strength") * col("se_log"))
          .as("lo95"),
        (col("strength") + lit(1.96) * col("strength") * col("se_log"))
          .as("hi95"))
      .orderBy("source")
  }

  /** DuckDB twin of [[btFit]] — CTE chain (expects `mc`) defining mm,
    * wins, mtot and ending in r[[BtIters]] (i, r).
    */
  private[graft] val duckBtCtes: String = {
    val iters = (1 to BtIters).map { k =>
      s"""t$k AS (SELECT mm.i,
         |  CAST(floor(mm.m * 1.0e15 / greatest(ri.r + rj.r, 1) + 0.5) AS BIGINT) AS tq
         |  FROM mm JOIN r${k - 1} ri ON mm.i = ri.i
         |  JOIN r${k - 1} rj ON mm.j = rj.i),
         |d$k AS (SELECT i, SUM(tq) AS d FROM t$k GROUP BY i),
         |u$k AS MATERIALIZED (SELECT w.i, CAST(floor(w.W * 1.0e15 / greatest(d.d, 1) + 0.5) AS BIGINT) AS r
         |  FROM wins w JOIN d$k d ON w.i = d.i),
         |n$k AS (SELECT SUM(r) AS sr, COUNT(*) AS nk FROM u$k),
         |r$k AS MATERIALIZED (SELECT u.i,
         |  CAST(floor(u.r * n.nk * 1.0e9 / n.sr + 0.5) AS BIGINT) AS r
         |  FROM u$k u, n$k n)""".stripMargin
    }.mkString(",\n")
    s"""mm AS (SELECT s1 AS i, s2 AS j, m FROM mc
       |       UNION ALL SELECT s2, s1, m FROM mc),
       |wins AS (SELECT i, CAST(SUM(w) AS BIGINT) AS W FROM
       |    (SELECT s1 AS i, w1 AS w FROM mc
       |     UNION ALL SELECT s2, m - w1 FROM mc)
       |  GROUP BY i),
       |mtot AS (SELECT i, CAST(SUM(m) AS BIGINT) AS M FROM mm GROUP BY i),
       |r0 AS (SELECT i, CAST(1000000000 AS BIGINT) AS r FROM wins),
       |$iters""".stripMargin
  }
}

object PreferenceQueries {
  import Preference._

  def all: Seq[Q] = Seq(

    // PREFERENCE PAIRS — the DPO/RLHF dataset constructor: per prompt
    // group, chosen = best candidate (score DESC, doc_id ASC) and
    // rejected = worst (score ASC, doc_id DESC — the exact mirror, so
    // a one-candidate group picks the same doc and is dropped by the
    // inequality filter). Census: per (chosen_source, rejected_source)
    // pair count and mean score margin — the grid a data curator
    // reads to spot source-level preference bias before training a
    // reward model on the pairs. SCALE: both ranks hash-partition on
    // the prompt group; the census is |sources|²-bounded.
    Q("preference_pairs",
      s"""WITH ${WebCuration.duckProfiles},
         |$duckCandidates,
         |rb AS (SELECT *, row_number() OVER (PARTITION BY pg
         |    ORDER BY score DESC, doc_id) AS r FROM sc),
         |rw AS (SELECT *, row_number() OVER (PARTITION BY pg
         |    ORDER BY score ASC, doc_id DESC) AS r FROM sc),
         |pr AS (SELECT c.source AS chosen_source, j.source AS rejected_source,
         |    c.score - j.score AS margin
         |  FROM rb c JOIN rw j ON c.pg = j.pg
         |  WHERE c.r = 1 AND j.r = 1 AND c.doc_id <> j.doc_id)
         |SELECT chosen_source, rejected_source,
         |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |  CAST(SUM(margin) AS BIGINT) AS sum_margin,
         |  CAST(SUM(margin) AS DOUBLE) / COUNT(*) AS mean_margin
         |FROM pr GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      val cand = candidates(s, dir)
      val best = cand.withColumn("r", row_number().over(
          Window.partitionBy("pg").orderBy(col("score").desc, col("doc_id"))))
        .filter(col("r") === 1)
        .select(col("pg"), col("doc_id").as("cd"),
          col("source").as("chosen_source"), col("score").as("cs"))
      val worst = cand.withColumn("r", row_number().over(
          Window.partitionBy("pg").orderBy(col("score").asc, col("doc_id").desc)))
        .filter(col("r") === 1)
        .select(col("pg"), col("doc_id").as("jd"),
          col("source").as("rejected_source"), col("score").as("js"))
      best.join(worst, Seq("pg")).filter(col("cd") =!= col("jd"))
        .select(col("chosen_source"), col("rejected_source"),
          (col("cs") - col("js")).as("margin"))
        .groupBy("chosen_source", "rejected_source")
        .agg(count(lit(1)).cast("long").as("n_pairs"),
          sum(col("margin")).cast("long").as("sum_margin"))
        .select(col("chosen_source"), col("rejected_source"),
          col("n_pairs"), col("sum_margin"),
          (col("sum_margin").cast("double") / col("n_pairs"))
            .as("mean_margin"))
        .orderBy("chosen_source", "rejected_source")
    },

    // BRADLEY–TERRY STRENGTHS — Hunter (2004) MM iterations on the
    // pairwise-win census: r_i <- W_i / Σ_j m_ij/(r_i+r_j), then
    // normalize to mean 1. Strengths in BIGINT nanos; each pair term
    // m_ij/(r_i+r_j) is quantized to integer micro-units BEFORE the
    // per-source sum (exact integer aggregation, order-independent);
    // the guard GREATEST(r_i+r_j, 1) keeps a theoretical
    // zero-strength pairing finite in both engines identically.
    // SCALE: the iteration input is the |sources|²-bounded census —
    // the corpus is touched once, for the match census. Both engines
    // need the iterate's lineage CUT (each step reads r twice):
    // Spark localCheckpoints the |sources|-row frame per step, and
    // the oracle marks mc/u_k/r_k MATERIALIZED — inlined CTEs would
    // otherwise expand 2^k and re-open the corpus per expansion.
    Q("bradley_terry_rank",
      s"""WITH ${WebCuration.duckProfiles},
         |$duckCandidates,
         |$duckMatchCensus,
         |$duckBtCtes
         |SELECT r$BtIters.i AS source,
         |  CAST(r$BtIters.r AS DOUBLE) / 1000000000 AS strength,
         |  wins.W AS wins, mtot.M AS matches
         |FROM r$BtIters JOIN wins ON r$BtIters.i = wins.i
         |JOIN mtot ON r$BtIters.i = mtot.i
         |ORDER BY source""".stripMargin) { (s, dir) =>
      // |sources|²-bounded census — btFit's census-bounded collect is
      // the one action, so no checkpoint needed before it
      val mc = matchCensus(candidates(s, dir))
      val (_, wins, mtot, r) = btFit(mc)
      // post-checkpoint Spark no longer knows these are census-sized —
      // state the broadcast explicitly rather than sort-merging 20 rows
      r.join(broadcast(wins), "i").join(broadcast(mtot), "i")
        .select(col("i").as("source"),
          (col("r").cast("double") / lit(1000000000L)).as("strength"),
          col("W").as("wins"), col("M").as("matches"))
        .orderBy("source")
    },

    // BT CONFIDENCE — the column a reward-model curator actually
    // gates on: a per-source uncertainty next to each Bradley–Terry
    // strength. Observed Fisher information of the log-strength at
    // the MM fixed point: I_i = Σ_j m_ij·p̂_ij·(1−p̂_ij) with
    // p̂_ij = r_i/(r_i+r_j); se(log r_i) = 1/√I_i, and the 95% Wald
    // interval on the STRENGTH scale via the delta method
    // (strength ± 1.96·strength·se — deliberately NOT exp(±1.96·se):
    // sqrt is IEEE-exact in both engines, libm exp is not, and the
    // repo's float discipline only admits ops whose cross-engine
    // bit-equality is guaranteed on identical inputs). Float
    // discipline as everywhere in this family: p̂ terms are computed
    // from the identical BIGINT-nano strengths, each Fisher term is
    // quantized to integer PICO-units BEFORE the per-source sum
    // (exact, order-independent), and the one sqrt runs on the same
    // exact integer in both engines. SCALE: census-only math — the
    // Fisher sum reads the |sources|²-bounded directed census and the
    // fitted |sources|-row strengths; the corpus was touched once,
    // by the match-census pass bradley_terry_rank already paid.
    Q("bt_confidence",
      s"""WITH ${WebCuration.duckProfiles},
         |$duckCandidates,
         |$duckMatchCensus,
         |$duckBtCtes,
         |fi AS (SELECT mm.i,
         |    CAST(floor(mm.m * ((CAST(ri.r AS DOUBLE) / (ri.r + rj.r))
         |      * (1 - CAST(ri.r AS DOUBLE) / (ri.r + rj.r))) * 1.0e12 + 0.5) AS BIGINT) AS fq
         |  FROM mm JOIN r$BtIters ri ON mm.i = ri.i
         |  JOIN r$BtIters rj ON mm.j = rj.i),
         |info AS (SELECT i, SUM(fq) AS fsum FROM fi GROUP BY i),
         |cf AS (SELECT r$BtIters.i AS source,
         |    CAST(r$BtIters.r AS DOUBLE) / 1000000000 AS strength,
         |    mtot.M AS matches,
         |    1.0 / sqrt(CAST(greatest(info.fsum, 1) AS DOUBLE) / 1.0e12) AS se_log
         |  FROM r$BtIters JOIN info ON r$BtIters.i = info.i
         |  JOIN mtot ON r$BtIters.i = mtot.i)
         |SELECT source, strength, matches, se_log,
         |  strength - 1.96 * strength * se_log AS lo95,
         |  strength + 1.96 * strength * se_log AS hi95
         |FROM cf ORDER BY source""".stripMargin) { (s, dir) =>
      btConfidence(matchCensus(candidates(s, dir)))
    },

    // PAIRWISE WIN-RATE MATRIX with Wilson lower bound — the
    // head-to-head grid (policy/annotator comparisons ship exactly
    // this table): per source pair, matches, s1's wins, the raw win
    // rate, and the 95% Wilson score lower bound (the ranking-safe
    // statistic when match counts differ wildly across cells). Pure
    // double arithmetic on the integer census — identical IEEE ops in
    // both engines, no rounding step to disagree on.
    Q("pairwise_winrate_matrix",
      s"""WITH ${WebCuration.duckProfiles},
         |$duckCandidates,
         |$duckMatchCensus
         |SELECT s1 AS source_a, s2 AS source_b, m AS matches, w1 AS wins_a,
         |  CAST(w1 AS DOUBLE) / m AS winrate_a,
         |  (CAST(w1 AS DOUBLE) / m + 1.9208 / m
         |    - 1.96 * sqrt((CAST(w1 AS DOUBLE) / m) * (1 - CAST(w1 AS DOUBLE) / m) / m
         |        + 0.9604 / m / m))
         |    / (1 + 3.8416 / m) AS wilson_lo
         |FROM mc ORDER BY source_a, source_b""".stripMargin) { (s, dir) =>
      val mc = matchCensus(candidates(s, dir))
      val p = col("w1").cast("double") / col("m")
      // z²/4m² as two double divisions, NOT 0.9604/(m*m): the BIGINT
      // square wraps past m ~ 3e9 (Spark silently, to a negative
      // divisor -> NaN; DuckDB raises) — the sequential form is
      // overflow-free and IEEE-identical in both engines
      mc.select(col("s1").as("source_a"), col("s2").as("source_b"),
          col("m").as("matches"), col("w1").as("wins_a"),
          p.as("winrate_a"),
          ((p + lit(1.9208) / col("m") -
            lit(1.96) * sqrt(p * (lit(1) - p) / col("m") +
              lit(0.9604) / col("m") / col("m"))) /
            (lit(1) + lit(3.8416) / col("m"))).as("wilson_lo"))
        .orderBy("source_a", "source_b")
    })
}
