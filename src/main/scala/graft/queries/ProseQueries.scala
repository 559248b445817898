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
    }
  )
}
