package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus style/diversity profiling — the writing-quality counterparts
  * to TextQueries' filtering stats: a Flesch-style readability census
  * (deterministic vowel-group syllable heuristic) and the distinct-n
  * n-gram diversity ratios used to audit generated/synthetic text for
  * mode collapse (Li et al.'s distinct-1/2 generalized to n<=3).
  *
  * Scale: both are scan-side token math reduced to a per-source (or
  * per-(source, n)) census; the only corpus-width exchange carries
  * n-gram partial counts with map-side aggregation. The fixture corpus
  * has no sentence punctuation, so readability treats the DOCUMENT as
  * the sentence unit — documented, and the formula constants are the
  * standard Flesch ones so real prose slots in unchanged.
  */
object ProseQueries {

  def all: Seq[Q] = Seq(

    // per-source readability census: avg words/doc, vowel-group
    // syllables/word, and the Flesch reading-ease score with the
    // document as sentence proxy. All sums are exact BIGINTs; the
    // three ratios are single double expressions written identically in
    // both engines and rounded to 6 dp.
    Q("readability",
      """WITH d AS (SELECT source, string_split(text, ' ') AS a FROM documents),
        |f AS (SELECT source, len(a) AS nw,
        |    list_sum(list_transform(a, w -> len(regexp_extract_all(w, '[aeiouy]+')))) AS ns
        |  FROM d WHERE len(a) > 0),
        |s AS (SELECT source, COUNT(*) AS n_docs,
        |    CAST(SUM(nw) AS BIGINT) AS sum_words,
        |    CAST(SUM(ns) AS BIGINT) AS sum_syll FROM f GROUP BY 1)
        |SELECT source, n_docs, sum_words, sum_syll,
        |  round(CAST(sum_words AS DOUBLE) / n_docs, 6) AS avg_words,
        |  round(CAST(sum_syll AS DOUBLE) / sum_words, 6) AS syll_per_word,
        |  round(206.835 - 1.015 * (CAST(sum_words AS DOUBLE) / n_docs)
        |      - 84.6 * (CAST(sum_syll AS DOUBLE) / sum_words), 6) AS flesch
        |FROM s ORDER BY source""".stripMargin) { (s, dir) =>
      val f = Tables.load(s, dir, "documents")
        .select(col("source"), size(split(col("text"), " ")).as("nw"),
          expr("""aggregate(transform(split(text, ' '),
            w -> size(regexp_extract_all(w, '[aeiouy]+', 0))),
            0, (acc, x) -> acc + x)""").as("ns"))
        .filter(col("nw") > 0)
      val cs = f.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("nw")).cast("long").as("sum_words"),
          sum(col("ns")).cast("long").as("sum_syll"))
      val sw = col("sum_words").cast("double")
      val ss = col("sum_syll").cast("double")
      cs.select(col("source"), col("n_docs"), col("sum_words"), col("sum_syll"),
          round(sw / col("n_docs"), 6).as("avg_words"),
          round(ss / col("sum_words"), 6).as("syll_per_word"),
          round(lit(206.835) - lit(1.015) * (sw / col("n_docs"))
            - lit(84.6) * (ss / col("sum_words")), 6).as("flesch"))
        .orderBy("source")
    },

    // distinct-n diversity: unique/total n-gram ratios per source for
    // n = 1..3 — low ratios flag repetitive or templated text. The
    // three gram streams fan out of one tokenized scan; counting is a
    // standard distinct aggregate on (source, n, gram) with map-side
    // partials, so the exchange carries gram census rows, never text.
    Q("ngram_diversity",
      """WITH d AS (SELECT source, string_split(text, ' ') AS a FROM documents),
        |u AS (
        |  SELECT source, 1 AS n, unnest(a) AS g FROM d WHERE len(a) >= 1
        |  UNION ALL
        |  SELECT source, 2 AS n,
        |    unnest(list_transform(range(1, len(a)), k -> a[k] || ' ' || a[k+1])) AS g
        |  FROM d WHERE len(a) >= 2
        |  UNION ALL
        |  SELECT source, 3 AS n,
        |    unnest(list_transform(range(1, len(a) - 1), k -> a[k] || ' ' || a[k+1] || ' ' || a[k+2])) AS g
        |  FROM d WHERE len(a) >= 3)
        |SELECT source, n, COUNT(*) AS total_ngrams,
        |  COUNT(DISTINCT g) AS uniq_ngrams,
        |  round(CAST(COUNT(DISTINCT g) AS DOUBLE) / COUNT(*), 6) AS distinct_ratio
        |FROM u GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
        .select(col("source"), split(col("text"), " ").as("a"))
      def grams(n: Int, gen: org.apache.spark.sql.Column) =
        d.filter(size(col("a")) >= n)
          .select(col("source"), lit(n).as("n"), explode(gen).as("g"))
      val u = grams(1, col("a"))
        .unionAll(grams(2, expr(
          "transform(sequence(0, size(a) - 2), k -> concat(a[k], ' ', a[k+1]))")))
        .unionAll(grams(3, expr(
          "transform(sequence(0, size(a) - 3), k -> concat(a[k], ' ', a[k+1], ' ', a[k+2]))")))
      u.groupBy("source", "n")
        .agg(count(lit(1)).as("total_ngrams"),
          count_distinct(col("g")).as("uniq_ngrams"))
        .select(col("source"), col("n"), col("total_ngrams"), col("uniq_ngrams"),
          round(col("uniq_ngrams").cast("double") / col("total_ngrams"), 6)
            .as("distinct_ratio"))
        .orderBy("source", "n")
    },

    // BURROWS' DELTA (Burrows '02) — the stylometry distance behind
    // authorship/provenance attribution, here the pairwise
    // STYLE-DRIFT matrix between sources: per-mille rates of the
    // top-20 corpus tokens per source, z-scored ACROSS sources per
    // token, delta(s1,s2) = mean |z1 − z2|. A high-delta source pair
    // writes differently even when topical stats agree — the signal
    // for "this crawl slice changed its register". Float discipline:
    // each rate cell is quantized to DECIMAL(18,9) (exact per-mille
    // ratio to 9 dp), token means/sds come from exact decimal sums
    // with one identically-written double step, z is re-quantized to
    // DECIMAL(12,6), and the pair sum of |z1−z2| is again an exact
    // decimal — one final double per pair. Zero-variance tokens
    // contribute z = 0 (the standard drop). Scale: one scan to the
    // (source, token) census; the top-K is a TakeOrdered; everything
    // after lives on a |sources|×K grid.
    Q("burrows_delta",
      """WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS tok
        |           FROM documents),
        |f0 AS (SELECT source, tok, COUNT(*) AS c FROM t
        |       WHERE length(tok) > 0 GROUP BY 1, 2),
        |top AS (SELECT tok FROM (SELECT tok, SUM(c) AS tc FROM f0 GROUP BY 1)
        |        ORDER BY tc DESC, tok LIMIT 20),
        |tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS tt FROM f0 GROUP BY 1),
        |grid AS (SELECT tot.source, top.tok, COALESCE(f0.c, 0) AS c, tot.tt
        |         FROM tot CROSS JOIN top
        |         LEFT JOIN f0 ON f0.source = tot.source AND f0.tok = top.tok),
        |cell AS (SELECT source, tok,
        |         CAST(round(1000.0 * c / tt, 9) AS DECIMAL(18,9)) AS fr FROM grid),
        |st AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS k,
        |       SUM(fr) AS sf, SUM(fr * fr) AS sff FROM cell GROUP BY 1),
        |z AS (SELECT c.source, c.tok,
        |    CASE WHEN CAST(sff AS DOUBLE) / k
        |        - (CAST(sf AS DOUBLE) / k) * (CAST(sf AS DOUBLE) / k) > 0
        |      THEN CAST(round((CAST(fr AS DOUBLE) - CAST(sf AS DOUBLE) / k)
        |        / sqrt(CAST(sff AS DOUBLE) / k
        |          - (CAST(sf AS DOUBLE) / k) * (CAST(sf AS DOUBLE) / k)), 6)
        |        AS DECIMAL(12,6))
        |      ELSE CAST(0 AS DECIMAL(12,6)) END AS z
        |  FROM cell c JOIN st ON c.tok = st.tok),
        |pair AS (SELECT a.source AS source_a, b.source AS source_b,
        |    SUM(abs(a.z - b.z)) AS sd_, CAST(COUNT(*) AS BIGINT) AS kk
        |  FROM z a JOIN z b ON a.tok = b.tok AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT source_a, source_b, round(CAST(sd_ AS DOUBLE) / kk, 6) AS delta
        |FROM pair ORDER BY source_a, source_b""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.types.DecimalType
      val f0 = Tables.load(s, dir, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        .where(length(col("tok")) > 0)
        .groupBy("source", "tok").agg(count(lit(1)).as("c"))
      val top = f0.groupBy("tok").agg(sum(col("c")).as("tc"))
        .orderBy(col("tc").desc, col("tok")).limit(20).select("tok")
      val tot = f0.groupBy("source").agg(sum(col("c")).cast("long").as("tt"))
      val grid = tot.crossJoin(broadcast(top))
        .join(f0, Seq("source", "tok"), "left")
        .select(col("source"), col("tok"),
          coalesce(col("c"), lit(0L)).as("c"), col("tt"))
      val cell = grid.select(col("source"), col("tok"),
        round(lit(1000.0) * col("c") / col("tt"), 9)
          .cast(DecimalType(18, 9)).as("fr"))
      val st = cell.groupBy("tok").agg(count(lit(1)).cast("long").as("k"),
        sum(col("fr")).as("sf"), sum(col("fr") * col("fr")).as("sff"))
      val mean = col("sf").cast("double") / col("k")
      val vr = col("sff").cast("double") / col("k") - mean * mean
      val z = cell.join(broadcast(st), "tok")
        .select(col("source"), col("tok"),
          when(vr > 0, round((col("fr").cast("double") - mean) / sqrt(vr), 6)
            .cast(DecimalType(12, 6)))
            .otherwise(lit(0).cast(DecimalType(12, 6))).as("z"))
      val a = z.toDF("source_a", "tok", "za")
      val b = z.toDF("source_b", "tok", "zb")
      a.join(b, Seq("tok")).filter(col("source_a") < col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(sum(abs(col("za") - col("zb"))).as("sd_"),
          count(lit(1)).cast("long").as("kk"))
        .select(col("source_a"), col("source_b"),
          round(col("sd_").cast("double") / col("kk"), 6).as("delta"))
        .orderBy("source_a", "source_b")
    }
  )
}
