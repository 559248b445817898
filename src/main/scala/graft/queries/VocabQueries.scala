package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Vocabulary-level corpus statistics — the "know your tokenizer's
  * input" queries a training-data pipeline runs before fixing a vocab:
  * Heaps-law vocab growth per source, a Zipf rank-frequency slope fit,
  * and the first BPE merge step (adjacent-symbol pair counts).
  *
  * Cross-engine float discipline (established by unigram_logprob):
  * every `ln` is rounded to 6 dp and summed as DECIMAL so aggregation
  * order cannot perturb the result; the final arithmetic runs in
  * doubles with IDENTICAL parenthesization in both engines.
  */
object VocabQueries {

  def all: Seq[Q] = Seq(

    // Heaps-law ingredients per source: token count, type (vocab)
    // count, hapax count, type-token ratio. One shuffle on
    // (source, tok) with map-side partial counts, then a reshuffle on
    // source — deliberately NOT countDistinct (which would expand to
    // the same two-phase plan but re-read the exploded tokens).
    // 100 TB: explode never materializes per-doc arrays beyond the
    // iterator; both aggregations are partial-combinable.
    Q("heaps_vocab",
      """WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS tok
        |           FROM documents),
        |f AS (SELECT source, tok, COUNT(*) AS freq FROM t
        |      WHERE length(tok) > 0 GROUP BY source, tok)
        |SELECT source, CAST(SUM(freq) AS BIGINT) AS n_tokens,
        |  COUNT(*) AS n_types,
        |  CAST(SUM(CASE WHEN freq = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
        |  CAST(COUNT(*) AS DOUBLE) / CAST(SUM(freq) AS DOUBLE) AS ttr
        |FROM f GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        .where(length(col("tok")) > 0)
        .groupBy("source", "tok")
        .agg(count(lit(1)).as("freq"))
        .groupBy("source")
        .agg(
          sum(col("freq")).cast("long").as("n_tokens"),
          count(lit(1)).as("n_types"),
          sum(when(col("freq") === 1, 1).otherwise(0)).cast("long").as("n_hapax"))
        .withColumn("ttr",
          col("n_types").cast("double") / col("n_tokens").cast("double"))
        .orderBy("source")
    },

    // Zipf slope: least-squares fit of ln(freq) on ln(rank) over the
    // top-100 tokens. The top-k is orderBy+limit (TakeOrdered — a
    // distributed per-partition top-k merge, NOT a global sort); the
    // rank window then runs on 100 rows, bounded by construction.
    // The slope is computed manually from decimal-exact sums (the
    // corr_manual pattern) because regr_slope's internal double
    // accumulation is order-dependent across engines.
    Q("zipf_slope",
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |f AS (SELECT tok, COUNT(*) AS freq FROM t WHERE length(tok) > 0 GROUP BY tok),
        |top AS (SELECT tok, freq FROM f ORDER BY freq DESC, tok LIMIT 100),
        |r AS (SELECT freq, row_number() OVER (ORDER BY freq DESC, tok) AS rank FROM top),
        |xy AS (SELECT
        |    CAST(round(ln(CAST(rank AS DOUBLE)), 6) AS DECIMAL(12,6)) AS x,
        |    CAST(round(ln(CAST(freq AS DOUBLE)), 6) AS DECIMAL(12,6)) AS y
        |  FROM r),
        |sums AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
        |    CAST(SUM(x * y) AS DOUBLE) AS sxy,
        |    CAST(SUM(x * x) AS DOUBLE) AS sxx
        |  FROM xy)
        |SELECT (n * sxy - sx * sy) / (n * sxx - sx * sx) AS zipf_slope,
        |  CAST(n AS BIGINT) AS n_terms FROM sums""".stripMargin) { (s, dir) =>
      val toks = Tables.load(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("tok"))
        .where(length(col("tok")) > 0)
      val top = toks.groupBy("tok").agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("tok")).limit(100)
      // 100-row frame: the single-partition window is bounded by the
      // LIMIT above, by design (contrast PrefixJaccard's fixed rank).
      val ranked = top.withColumn("rank",
        row_number().over(Window.orderBy(col("freq").desc, col("tok"))))
      ranked
        .select(
          round(log(col("rank").cast("double")), 6).cast(DecimalType(12, 6)).as("x"),
          round(log(col("freq").cast("double")), 6).cast(DecimalType(12, 6)).as("y"))
        .agg(
          count(lit(1)).cast("double").as("n"),
          sum(col("x")).cast("double").as("sx"),
          sum(col("y")).cast("double").as("sy"),
          sum(col("x") * col("y")).cast("double").as("sxy"),
          sum(col("x") * col("x")).cast("double").as("sxx"))
        .select(
          ((col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx"))).as("zipf_slope"),
          col("n").cast("long").as("n_terms"))
    },

    // first BPE merge step: adjacent character-pair counts over all
    // word tokens (counting tokens, not types, IS the frequency-
    // weighted pair count BPE maximizes). transform(sequence(...)) is
    // codegen'd; no per-row UDF. Top-50 via TakeOrdered. length>1
    // guard matters: Spark's sequence(1, 0) counts DOWN ([1,0]), so
    // 1-char tokens must never reach the transform.
    Q("bpe_pairs",
      """WITH w AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        |p AS (SELECT unnest(list_transform(range(1, length(w)),
        |               i -> substring(w, i, 2))) AS pair
        |      FROM w WHERE length(w) > 1)
        |SELECT pair, COUNT(*) AS n FROM p GROUP BY pair
        |ORDER BY n DESC, pair LIMIT 50""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .where(length(col("w")) > 1)
        .select(explode(
          expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair"))
        .groupBy("pair")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("pair"))
        .limit(50)
    }
  )
}
