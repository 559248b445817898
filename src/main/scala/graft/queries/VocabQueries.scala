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

  /** Number of iterative merges bpe_merges performs. */
  val BpeRounds = 10

  /** Greedy left-to-right single-pair BPE merge of a symbol array, as
    * one row-local fold (no shuffle, no UDF): append each symbol
    * unless the accumulator ends with `a` and the symbol is `b`, in
    * which case the tail becomes the merged symbol. A freshly-merged
    * tail equals a||b, never bare `a` (unless a==b chains — where the
    * fold's skip-after-merge IS the standard odd-occurrence rule), so
    * overlaps resolve exactly like classic BPE. VocabSpec pins this
    * against hand-computed merges AND against the oracle's
    * gaps-and-islands formulation.
    */
  def bpeMergeFold(syms: org.apache.spark.sql.Column, a: String,
                   b: String): org.apache.spark.sql.Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) => when(size(acc) > 0 &&
          element_at(acc, size(acc)) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Word-bigram stream for the GT/Chao1 estimators: zip the token
    * array against itself shifted by one (same derivation as
    * bigram_logprob), joined with ' ' to one type string matching the
    * oracle's `a[i] || ' ' || a[i+1]`. */
  private def bigrams(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.parallelize(Tables.load(s, dir, "documents").select("text"))
      .select(split(col("text"), " ").as("a"))
      .select(explode(arrays_zip(
        slice(col("a"), lit(1), size(col("a")) - 1),
        slice(col("a"), lit(2), size(col("a")) - 1))).as("p"))
      .select(concat_ws(" ", col("p.0"), col("p.1")).as("tok"))

  /** Oracle CTE chain for bpe_merges: `rounds` unrolled merge steps.
    * The merge itself is the gaps-and-islands form (marks where
    * (s_i, s_{i+1}) equals the round's best pair; within each maximal
    * run of consecutive marks — which only occur when a==b — keep the
    * odd-ranked ones; a row is dropped iff its predecessor is a kept
    * mark), which is provably the same greedy-left-to-right semantics
    * as the Spark side's [[bpeMergeFold]].
    *
    * Each w$k is AS MATERIALIZED: it is referenced 4x (next round's
    * pair count, next round's explode, and both audit subqueries), and
    * DuckDB 1.0 inlines CTEs by default — un-hinted, the 10-round
    * chain re-expands 4^10-fold and never finishes; materialized it
    * runs in ~0.2 s.
    */
  private def duckBpe(rounds: Int): String = {
    val w0 =
      """w0 AS MATERIALIZED (SELECT row_number() OVER (ORDER BY w) AS wid, w, cnt,
        |    string_split(w, '') AS syms
        |  FROM (SELECT w, COUNT(*) AS cnt
        |        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |        WHERE length(w) > 0 GROUP BY w))""".stripMargin
    val rs = (1 to rounds).map { k =>
      val prev = s"w${k - 1}"
      s"""p$k AS (SELECT syms[i] AS pa, syms[i + 1] AS pb, CAST(SUM(cnt) AS BIGINT) AS n
         |  FROM (SELECT cnt, syms, unnest(generate_series(1, len(syms) - 1)) AS i
         |        FROM $prev WHERE len(syms) > 1)
         |  GROUP BY 1, 2),
         |b$k AS (SELECT pa, pb, n FROM p$k ORDER BY n DESC, pa, pb LIMIT 1),
         |e$k AS (SELECT wid, cnt, i, syms[i] AS s, b.pa || b.pb AS mrg,
         |    CASE WHEN syms[i] = b.pa AND syms[i + 1] = b.pb THEN 1 ELSE 0 END AS mk
         |  FROM (SELECT wid, cnt, syms, unnest(generate_series(1, len(syms))) AS i FROM $prev)
         |  CROSS JOIN b$k b),
         |g$k AS (SELECT *, i - row_number() OVER (PARTITION BY wid, mk ORDER BY i) AS grp FROM e$k),
         |k$k AS (SELECT *, CASE WHEN mk = 1 AND row_number() OVER (
         |    PARTITION BY wid, mk, grp ORDER BY i) % 2 = 1 THEN 1 ELSE 0 END AS keepm FROM g$k),
         |d$k AS (SELECT *, COALESCE(lag(keepm) OVER (PARTITION BY wid ORDER BY i), 0) AS dropped FROM k$k),
         |w$k AS MATERIALIZED (SELECT wid, cnt, list(CASE WHEN keepm = 1 THEN mrg ELSE s END ORDER BY i) AS syms
         |  FROM d$k WHERE dropped = 0 GROUP BY wid, cnt),
         |st$k AS (SELECT CAST($k AS INT) AS merge_rank, b.pa, b.pb, b.pa || b.pb AS merged,
         |    b.n AS pair_count,
         |    (SELECT COUNT(DISTINCT s) FROM (SELECT unnest(syms) AS s FROM w$k)) AS vocab_types,
         |    (SELECT CAST(SUM(cnt * len(syms)) AS BIGINT) FROM w$k) AS corpus_symbols
         |  FROM b$k b)""".stripMargin
    }
    (w0 +: rs).mkString(",\n")
  }

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
    },

    // FULL iterative BPE: BpeRounds greedy merges over the word-TYPE
    // table (BPE trains on the vocabulary weighted by frequency, not
    // the token stream — at 100 TB the type table is bounded by vocab
    // size, ~millions of rows, and the token counts ride in as
    // weights). Per round: one shuffle (the weighted pair count), one
    // driver decision (the argmax pair — a single row, the same
    // bounded-collect contract as each k-means iteration), and a
    // row-local fold merge (bpeMergeFold — no shuffle, no UDF), with
    // the connectedComponents lineage discipline: localCheckpoint per
    // round so 10 rounds don't nest 10 interpreted folds in one plan.
    // Output is the merge table + vocabulary-growth audit: each round's
    // chosen pair, its weighted frequency, distinct symbol types after
    // the merge, and the total corpus length in symbols after the
    // merge (the compression curve). Ties break (n DESC, pa, pb) on
    // both engines' binary string order.
    Q("bpe_merges",
      s"""WITH ${duckBpe(BpeRounds)}
         |SELECT merge_rank, pa, pb, merged, pair_count, vocab_types, corpus_symbols
         |FROM (${(1 to BpeRounds).map(k => s"SELECT * FROM st$k").mkString(" UNION ALL ")})
         |ORDER BY merge_rank""".stripMargin) { (s, dir) =>
      val rounds = bpeTrainRounds(s, dir, BpeRounds)
      val stats = rounds.zipWithIndex.map { case ((a, b, n, words), i) =>
        words.select(col("cnt"), explode(col("syms")).as("sym"))
          .agg(countDistinct(col("sym")).as("vocab_types"),
            sum(col("cnt")).cast("long").as("corpus_symbols"))
          .select(lit(i + 1).as("merge_rank"), lit(a).as("pa"), lit(b).as("pb"),
            lit(a + b).as("merged"), lit(n).as("pair_count"),
            col("vocab_types"), col("corpus_symbols"))
      }
      stats.reduce(_.unionAll(_)).orderBy("merge_rank")
    },

    // ENCODE with the learned merges — what makes the bpe_merges table
    // actionable: the final word-type segmentation (a vocabulary-sized
    // (word -> token count) map after all BpeRounds merges) broadcasts
    // back onto the corpus, and each document reports its whitespace
    // token count, character count, BPE token count, and compression
    // ratio. The corpus tokenizes ONCE per side (documents join the
    // segmentation on the word string); at 100 TB the segmentation
    // table is vocab-bounded and the per-doc aggregation is a single
    // shuffle on doc_id.
    Q("bpe_encode",
      s"""WITH ${duckBpe(BpeRounds)},
         |fin AS (SELECT w0.w, len(w$BpeRounds.syms) AS n_bpe
         |        FROM w$BpeRounds JOIN w0 USING (wid)),
         |enc AS (SELECT doc_id, w, COUNT(*) AS n
         |        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
         |        WHERE length(w) > 0 GROUP BY doc_id, w)
         |SELECT doc_id,
         |  CAST(SUM(n) AS BIGINT) AS n_words,
         |  CAST(SUM(n * length(w)) AS BIGINT) AS n_chars,
         |  CAST(SUM(n * n_bpe) AS BIGINT) AS n_bpe_tokens,
         |  CAST(SUM(n * length(w)) AS DOUBLE) / CAST(SUM(n * n_bpe) AS DOUBLE) AS compression
         |FROM enc JOIN fin USING (w)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val fin = bpeTrainRounds(s, dir, BpeRounds).last._4
        .select(col("w"), size(col("syms")).as("n_bpe"))
      // tokens probe the broadcast segmentation DIRECTLY — a
      // (doc_id, w) pre-aggregate before a broadcast join would buy
      // nothing (the join is map-side either way) and cost an extra
      // corpus-token exchange; this shape pays ONE shuffle (doc_id)
      // plus the output sort
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .where(length(col("w")) > 0)
        .join(broadcast(fin), "w")
        .groupBy("doc_id")
        .agg(count(lit(1)).cast("long").as("n_words"),
          sum(length(col("w"))).cast("long").as("n_chars"),
          sum(col("n_bpe")).cast("long").as("n_bpe_tokens"))
        .select(col("doc_id"), col("n_words"), col("n_chars"),
          col("n_bpe_tokens"),
          (col("n_chars").cast("double") / col("n_bpe_tokens").cast("double"))
            .as("compression"))
        .orderBy("doc_id")
    },

    // Coverage-at-k curve — the vocab-SIZING tool: per language, what
    // fraction of total token mass do the top-k types cover? The knee
    // of this curve is how a tokenizer budget gets chosen. Ks are
    // fixture-scaled (the generator vocabulary is ~31 types/lang;
    // production runs 1k/10k/100k — same plan). Scale shape: token
    // counts partial-aggregate map-side; the rank window and running
    // sum run over DICTIONARY-sized (lang, type) rows, never the
    // token stream; output is |langs| x |Ks| rows. Exact: masses are
    // integer sums, each coverage a single double division.
    Q("vocab_topk_mass", {
      val ks = Seq(5, 10, 20)
      s"""WITH tc AS (SELECT lang, tok, COUNT(*) AS c FROM
         |    (SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents)
         |    GROUP BY 1, 2),
         |r AS (SELECT lang, c, row_number() OVER (
         |        PARTITION BY lang ORDER BY c DESC, tok) AS rnk FROM tc),
         |cum AS (SELECT lang, rnk, SUM(c) OVER (
         |        PARTITION BY lang ORDER BY rnk) AS cm FROM r),
         |tot AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n_tokens,
         |        COUNT(*) AS n_types FROM tc GROUP BY lang),
         |ks(k) AS (VALUES ${ks.map(k => s"($k)").mkString(", ")})
         |SELECT tot.lang AS lang, k, n_types,
         |  CAST(cm AS BIGINT) AS mass, n_tokens,
         |  CAST(cm AS DOUBLE) / n_tokens AS coverage
         |FROM tot JOIN ks ON true
         |JOIN cum ON cum.lang = tot.lang
         |  AND cum.rnk = least(k, n_types)
         |ORDER BY lang, k""".stripMargin
    }) { (s, dir) =>
      val ks = Seq(5, 10, 20)
      val tc = Tables.load(s, dir, "documents")
        .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("lang", "tok").agg(count(lit(1)).as("c"))
      val r = tc.withColumn("rnk", row_number().over(
        Window.partitionBy("lang").orderBy(col("c").desc, col("tok"))))
      val cum = r.withColumn("cm", sum(col("c")).over(
        Window.partitionBy("lang").orderBy("rnk")))
        .select("lang", "rnk", "cm")
      val tot = tc.groupBy("lang")
        .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_types"))
      import s.implicits._
      val kdf = ks.toDF("k")
      tot.crossJoin(broadcast(kdf))
        .join(cum, cum("lang") === tot("lang") &&
          cum("rnk") === least(col("k"), col("n_types")))
        .select(tot("lang").as("lang"), col("k"), col("n_types"),
          col("cm").as("mass"), col("n_tokens"),
          (col("cm").cast("double") / col("n_tokens")).as("coverage"))
        .orderBy("lang", "k")
    },

    // Negative-sampling noise table — the unigram^(3/4) distribution
    // word2vec/NCE training draws negatives from, materialized per
    // language as integer draw quotas under a fixed budget (the same
    // exact-integer discipline as mix_temperature: weights quantize
    // to 1e-6 units right after the one libm pow — flip odds
    // ~1e-10/row — the normalizer is their exact sum, quotas are
    // exact floor divisions). Top-N per language only: the head
    // carries almost all of the 3/4-tempered mass, and production
    // samplers store exactly this truncated table plus a tail
    // bucket. Scale: token counts partial-aggregate map-side; the
    // per-lang window runs over dictionary-sized rows; output is
    // |langs| x N rows.
    Q("noise_table", {
      val (n, budget) = (10, 1000)
      s"""WITH tc AS (SELECT lang, tok, COUNT(*) AS c FROM
         |    (SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents)
         |    GROUP BY 1, 2),
         |r AS (SELECT lang, tok, c, row_number() OVER (
         |        PARTITION BY lang ORDER BY c DESC, tok) AS rnk FROM tc),
         |topn AS (SELECT lang, tok, c, rnk,
         |    CAST(floor(pow(CAST(c AS DOUBLE), 0.75) * 1e6 + 0.5) AS BIGINT) AS w_u
         |  FROM r WHERE rnk <= $n),
         |z AS (SELECT lang, CAST(SUM(w_u) AS BIGINT) AS z FROM topn GROUP BY lang)
         |SELECT topn.lang AS lang, rnk, tok AS item, c, w_u,
         |  CAST(($budget * w_u) // z AS BIGINT) AS quota
         |FROM topn JOIN z ON topn.lang = z.lang
         |ORDER BY lang, rnk""".stripMargin
    }) { (s, dir) =>
      val (n, budget) = (10, 1000)
      val tc = Tables.load(s, dir, "documents")
        .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("lang", "tok").agg(count(lit(1)).as("c"))
      val topn = tc.withColumn("rnk", row_number().over(
          Window.partitionBy("lang").orderBy(col("c").desc, col("tok"))))
        .filter(col("rnk") <= n)
        .withColumn("w_u",
          floor(pow(col("c").cast("double"), 0.75) * 1e6 + 0.5).cast("long"))
      val z = topn.groupBy("lang").agg(sum("w_u").as("z"))
      topn.join(broadcast(z), "lang")
        .select(col("lang"), col("rnk"), col("tok").as("item"), col("c"),
          col("w_u"), expr(s"CAST(($budget * w_u) DIV z AS BIGINT)").as("quota"))
        .orderBy("lang", "rnk")
    },

    // PMI COLLOCATIONS (Church & Hanks '90) — the association-strength
    // census behind phrase/merge candidate lists: for adjacent token
    // pairs with count >= MinColl, PMI = ln((c12/Nb)/((c1/N)(c2/N))),
    // computed as ONE division of exact integer products (c12·N² /
    // (Nb·c1·c2) stays far under 2^53, so the double is exact) and one
    // rounded ln — engine-deterministic without any decimal plumbing.
    // Count tables are vocabulary-bounded; the corpus tokenizes once
    // and only (token, count) pairs shuffle. Top-20 by (pmi, pair)
    // total order via sort+limit (TakeOrdered — bounded heap, never a
    // single-partition global sort).
    Q("pmi_collocations", {
      val (minC, k) = (MinColl, CollTopK)
      s"""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         |u AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY 1),
         |n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM u),
         |arr AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
         |bg AS (SELECT unnest(list_zip(a[1:len(a)-1], a[2:len(a)])) AS p FROM arr),
         |bc AS (SELECT p[1] AS w1, p[2] AS w2, CAST(COUNT(*) AS BIGINT) AS c12
         |       FROM bg GROUP BY 1, 2),
         |nb AS (SELECT CAST(SUM(c12) AS BIGINT) AS nb FROM bc)
         |SELECT w1, w2, c12,
         |  round(ln(CAST(c12 * n * n AS DOUBLE) / CAST(nb * u1.c * u2.c AS DOUBLE)), 6) AS pmi
         |FROM bc JOIN u u1 ON u1.tok = w1 JOIN u u2 ON u2.tok = w2
         |CROSS JOIN n CROSS JOIN nb
         |WHERE c12 >= $minC
         |ORDER BY pmi DESC, w1, w2 LIMIT $k""".stripMargin
    }) { (s, dir) =>
      val docs = Tables.parallelize(Tables.load(s, dir, "documents")
        .select("doc_id", "text"))
      val u = docs.select(explode(split(col("text"), " ")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("c"))
      val n = u.agg(sum(col("c")).as("n"))
      val a = docs.select(split(col("text"), " ").as("a"))
      // arrays_zip, not zip_with(struct): the HOF interprets its
      // lambda per token (CodegenFallback); arrays_zip stays codegen'd
      val bigrams = arrays_zip(
        slice(col("a"), lit(1), size(col("a")) - 1),
        slice(col("a"), lit(2), size(col("a")) - 1))
      val bc = a.select(explode(bigrams).as("p"))
        .select(col("p.0").as("w1"), col("p.1").as("w2"))
        .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      val nb = bc.agg(sum(col("c12")).as("nb"))
      val u1 = u.select(col("tok").as("w1"), col("c").as("c1"))
      val u2 = u.select(col("tok").as("w2"), col("c").as("c2"))
      bc.filter(col("c12") >= MinColl)
        .join(broadcast(u1), "w1").join(broadcast(u2), "w2")
        .crossJoin(broadcast(n)).crossJoin(broadcast(nb))
        .select(col("w1"), col("w2"), col("c12"),
          round(log((col("c12") * col("n") * col("n")).cast("double") /
            (col("nb") * col("c1") * col("c2")).cast("double")), 6).as("pmi"))
        .orderBy(col("pmi").desc, col("w1"), col("w2"))
        .limit(CollTopK)
    },

    // TEXTRANK KEYWORDS (Mihalcea & Tarau, EMNLP '04) — graph-based
    // keyword extraction: tokens are nodes, adjacent co-occurrence
    // (>= MinCooc times, self-loops dropped) makes an undirected
    // edge, and 3 damped power-iteration rounds rank centrality (the
    // unweighted TextRank variant). EXACTLY the pagerank_dups
    // recurrence on a different graph: per-round ranks quantize to
    // DECIMAL(18,9) so the result is aggregation-order-independent on
    // both engines. The graph is VOCABULARY-bounded — corpus size
    // only affects the one tokenize+count pass; iterations run on
    // |vocab| rows. Top-k by (rank, token) via sort+limit.
    Q("textrank_keywords", {
      val iterCtes = (1 to 3).map { k =>
        s"""c$k AS (SELECT r.tok,
           |  CAST(round(CAST(r.r AS DOUBLE) / d.degree, 9) AS DECIMAL(18,9)) AS c
           |  FROM r${k - 1} r JOIN deg d USING (tok)),
           |r$k AS (SELECT e.b AS tok,
           |  CAST(round(0.15 + 0.85 * CAST(SUM(c.c) AS DOUBLE), 9) AS DECIMAL(18,9)) AS r
           |  FROM edges e JOIN c$k c ON e.a = c.tok GROUP BY e.b)""".stripMargin
      }.mkString(",\n")
      s"""WITH arr AS (SELECT string_split(text, ' ') AS a FROM documents),
         |bg AS (SELECT unnest(list_zip(a[1:len(a)-1], a[2:len(a)])) AS p FROM arr),
         |pc AS (SELECT p[1] AS w1, p[2] AS w2 FROM bg WHERE p[1] <> p[2]),
         |und AS (SELECT LEAST(w1, w2) AS a, GREATEST(w1, w2) AS b, COUNT(*) AS c
         |        FROM pc GROUP BY 1, 2 HAVING COUNT(*) >= $MinCooc),
         |edges AS (SELECT a, b FROM und UNION ALL SELECT b, a FROM und),
         |deg AS (SELECT a AS tok, COUNT(*) AS degree FROM edges GROUP BY a),
         |r0 AS (SELECT tok, CAST(1.0 AS DECIMAL(18,9)) AS r FROM deg),
         |$iterCtes
         |SELECT r3.tok AS token, CAST(r3.r AS DOUBLE) AS textrank, deg.degree
         |FROM r3 JOIN deg USING (tok)
         |ORDER BY textrank DESC, token LIMIT $TextRankTopK""".stripMargin
    }) { (s, dir) =>
      val arr = Tables.parallelize(Tables.load(s, dir, "documents")
          .select("text"))
        .select(split(col("text"), " ").as("a"))
      val n = size(col("a"))
      // arrays_zip, not zip_with(struct): same codegen argument as
      // pmi_collocations above
      val pairs = arrays_zip(
        slice(col("a"), lit(1), n - 1), slice(col("a"), lit(2), n - 1))
      val und = arr.select(explode(pairs).as("p"))
        .filter(col("p.0") =!= col("p.1"))
        .select(least(col("p.0"), col("p.1")).as("a"),
          greatest(col("p.0"), col("p.1")).as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("c"))
        .filter(col("c") >= MinCooc)
      val edges = und.select(col("a"), col("b"))
        .unionAll(und.select(col("b").as("a"), col("a").as("b")))
      val deg = edges.groupBy(col("a").as("tok"))
        .agg(count(lit(1)).as("degree"))
      var r = deg.select(col("tok"),
        lit(1.0).cast(DecimalType(18, 9)).as("r"))
      for (_ <- 1 to 3) {
        val c = r.join(deg, "tok").select(col("tok"),
          round(col("r").cast("double") / col("degree"), 9)
            .cast(DecimalType(18, 9)).as("c"))
        r = edges.join(c, edges("a") === c("tok"))
          .groupBy(edges("b").as("tok"))
          .agg(round(lit(0.15) + lit(0.85) * sum(col("c")).cast("double"), 9)
            .cast(DecimalType(18, 9)).as("r"))
      }
      r.join(deg, "tok")
        .select(col("tok").as("token"), col("r").cast("double").as("textrank"),
          col("degree"))
        .orderBy(col("textrank").desc, col("token"))
        .limit(TextRankTopK)
    },

    // NAIVE BAYES TEXT CLASSIFIER (the add-one-smoothed multinomial NB
    // every curation stack trains as its first quality/domain/language
    // gate) — trained and scored ENTIRELY in the dataflow, no driver
    // loop: token counts from the even-doc_id half are the model
    // (class priors + smoothed per-class token log-likelihoods), odd
    // docs are genuinely held out. Per-class scores sum n·ln((c+1)/
    // (tot+V)) in DECIMAL(20,6) (order-independent), argmax breaks
    // ties by class name. Scale shape: the model tables are
    // vocabulary-bounded and BROADCAST; the corpus tokenizes once and
    // the widest flow is |doc-token types| × |classes| rows into a
    // per-(doc, class) aggregate — the standard distributed NB score.
    Q("lang_id_nb",
      """WITH toks AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok FROM documents),
        |dt AS (SELECT doc_id, lang, tok, COUNT(*) AS n FROM toks GROUP BY 1, 2, 3),
        |tr AS (SELECT lang, tok, CAST(SUM(n) AS BIGINT) AS c FROM dt
        |       WHERE doc_id % 2 = 0 GROUP BY 1, 2),
        |cls AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS tot FROM tr GROUP BY 1),
        |voc AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v FROM tr),
        |pri AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS nd FROM documents
        |        WHERE doc_id % 2 = 0 GROUP BY 1),
        |ndoc AS (SELECT CAST(SUM(nd) AS BIGINT) AS ndocs FROM pri),
        |sc AS (SELECT dt.doc_id, dt.lang AS true_lang, cls.lang AS cand, dt.n,
        |    COALESCE(tr.c, 0) AS c, cls.tot, voc.v
        |  FROM dt CROSS JOIN cls CROSS JOIN voc
        |  LEFT JOIN tr ON tr.lang = cls.lang AND tr.tok = dt.tok),
        |ll AS (SELECT doc_id, true_lang, cand,
        |    SUM(n * CAST(round(ln((c + 1.0) / (tot + v)), 6) AS DECIMAL(20,6))) AS lsum
        |  FROM sc GROUP BY 1, 2, 3),
        |fin AS (SELECT ll.doc_id, true_lang, cand,
        |    CAST(round(ln(CAST(nd AS DOUBLE) / ndocs), 6) AS DECIMAL(20,6)) + lsum AS logpost
        |  FROM ll JOIN pri ON pri.lang = ll.cand CROSS JOIN ndoc),
        |best AS (SELECT doc_id, true_lang, cand, logpost, row_number() OVER (
        |    PARTITION BY doc_id ORDER BY logpost DESC, cand) AS rn FROM fin)
        |SELECT doc_id, true_lang, cand AS pred_lang,
        |  CAST(logpost AS DOUBLE) AS logpost, cand = true_lang AS is_match
        |FROM best WHERE rn = 1 ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val base = Tables.parallelize(Tables.load(s, dir, "documents")
          .select("doc_id", "lang", "text"))
      // score-side per-(doc, tok) counts as a MAP-SIDE histogram
      // (TextAnalysis.histogram): same multiset as
      // explode+groupBy(doc_id, lang, tok).count, but the corpus-wide
      // (doc, token) exchange never exists (guide §2.4)
      val dt = base
        .select(col("doc_id"), col("lang"),
          explode(graft.ops.TextAnalysis.histogram(
            split(col("text"), " "))).as("e"))
        .select(col("doc_id"), col("lang"),
          col("e.tok").as("tok"), col("e.cnt").as("n"))
      // the model: train-half counts, materialized once (the persisted
      // NB artifact). Counted DIRECTLY from the token stream — the sum
      // over documents of per-doc counts IS the occurrence total, so
      // the per-(doc, tok) intermediate the old derivation grouped by
      // is skipped (guide §2.3: aggregate before you shuffle)
      val tr = base.filter(col("doc_id") % 2 === 0)
        .select(col("lang").as("cand"),
          explode(split(col("text"), " ")).as("tok"))
        .groupBy("cand", "tok")
        .agg(count(lit(1)).cast("long").as("c"))
        .localCheckpoint(true)
      val cls = tr.groupBy("cand").agg(sum(col("c")).as("tot"))
      val voc = tr.agg(countDistinct(col("tok")).as("v"))
      val pri = Tables.load(s, dir, "documents")
        .filter(col("doc_id") % 2 === 0)
        .groupBy(col("lang").as("cand")).agg(count(lit(1)).as("nd"))
      val ndoc = pri.agg(sum(col("nd")).as("ndocs"))
      val term = round(log((col("c") + 1.0) / (col("tot") + col("v"))), 6)
        .cast(DecimalType(20, 6))
      val ll = dt
        .crossJoin(broadcast(cls)).crossJoin(broadcast(voc))
        .join(broadcast(tr), Seq("cand", "tok"), "left")
        .na.fill(0L, Seq("c"))
        .groupBy(col("doc_id"), col("lang").as("true_lang"), col("cand"))
        .agg(sum(col("n") * term).as("lsum"))
      val prior = round(log(col("nd").cast("double") / col("ndocs")), 6)
        .cast(DecimalType(20, 6))
      val fin = ll.join(broadcast(pri), "cand").crossJoin(broadcast(ndoc))
        .select(col("doc_id"), col("true_lang"), col("cand"),
          (prior + col("lsum")).as("logpost"))
      fin.withColumn("rn", row_number().over(
          Window.partitionBy("doc_id").orderBy(col("logpost").desc, col("cand"))))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("true_lang"), col("cand").as("pred_lang"),
          col("logpost").cast("double").as("logpost"),
          (col("cand") === col("true_lang")).as("is_match"))
        .orderBy("doc_id")
    },

    // GOOD-TURING re-estimation (Good '53) — the frequency-of-
    // frequencies table every LM smoother starts from: for each raw
    // count r, how many types N_r have it, and the adjusted count
    // r* = (r+1)·N_{r+1}/N_r that reallocates mass toward unseen
    // events. Types are word BIGRAMS (the unit bigram_logprob smooths;
    // the unigram vocabulary here is closed — 31 types, min count 26 —
    // so GT's low-count head only exists one order up). The corpus
    // reduces to the bigram census, then the FoF census (ONE row per
    // distinct count value); r* joins the census to itself at r+1 (a
    // gap means r* is undefined — NULL, as in the unsmoothed
    // estimator) and is reported for the dense head r <= 10, where GT
    // is actually used before switching to raw counts. Integer until
    // the one final double.
    Q("good_turing",
      """WITH arr AS (SELECT string_split(text, ' ') AS a FROM documents),
        |t AS (SELECT unnest(list_transform(generate_series(1, len(a)-1),
        |        i -> a[i] || ' ' || a[i+1])) AS tok FROM arr),
        |f AS (SELECT tok, COUNT(*) AS r FROM t GROUP BY 1),
        |fof AS (SELECT r, CAST(COUNT(*) AS BIGINT) AS n_r FROM f GROUP BY 1)
        |SELECT a.r, a.n_r,
        |  CASE WHEN b.n_r IS NOT NULL
        |    THEN round((a.r + 1.0) * b.n_r / a.n_r, 6) END AS r_star
        |FROM fof a LEFT JOIN fof b ON b.r = a.r + 1
        |WHERE a.r <= 10 ORDER BY a.r""".stripMargin) { (s, dir) =>
      val f = bigrams(s, dir).groupBy("tok").agg(count(lit(1)).as("r"))
      val fof = f.groupBy("r").agg(count(lit(1)).cast("long").as("n_r"))
      val nxt = fof.select((col("r") - 1).as("r"), col("n_r").as("n_next"))
      fof.join(nxt, Seq("r"), "left")
        .filter(col("r") <= 10)
        .select(col("r"), col("n_r"),
          when(col("n_next").isNotNull,
            round((col("r") + lit(1.0)) * col("n_next") / col("n_r"), 6))
            .as("r_star"))
        .orderBy("r")
    },

    // CHAO1 RICHNESS + GOOD'S COVERAGE — "how much vocabulary haven't
    // we seen yet?", the question behind tokenizer sizing and
    // crawl-more decisions: Chao1's lower-bound estimate of the TRUE
    // type count V + N1²/(2·N2) from the singleton/doubleton counts,
    // and Good's coverage 1 − N1/N (the probability mass of seen
    // types). Bigram types (see good_turing); one-row rollup of the
    // same FoF census. A corpus with no doubletons leaves Chao1
    // undefined: NULL.
    Q("vocab_chao1",
      """WITH arr AS (SELECT string_split(text, ' ') AS a FROM documents),
        |t AS (SELECT unnest(list_transform(generate_series(1, len(a)-1),
        |        i -> a[i] || ' ' || a[i+1])) AS tok FROM arr),
        |f AS (SELECT tok, COUNT(*) AS r FROM t GROUP BY 1),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS v,
        |    CAST(SUM(r) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN r = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(SUM(CASE WHEN r = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
        |  FROM f)
        |SELECT v, n, n1, n2,
        |  CASE WHEN n2 > 0
        |    THEN round(v + CAST(n1 AS DOUBLE) * n1 / (2.0 * n2), 6) END AS chao1,
        |  CASE WHEN n > 0
        |    THEN round(1.0 - CAST(n1 AS DOUBLE) / n, 6) END AS coverage
        |FROM m""".stripMargin) { (s, dir) =>
      val f = bigrams(s, dir).groupBy("tok").agg(count(lit(1)).as("r"))
      val m = f.agg(count(lit(1)).cast("long").as("v"),
        sum(col("r")).cast("long").as("n"),
        sum(when(col("r") === 1, 1).otherwise(0)).cast("long").as("n1"),
        sum(when(col("r") === 2, 1).otherwise(0)).cast("long").as("n2"))
      m.select(col("v"), col("n"), col("n1"), col("n2"),
        when(col("n2") > 0,
          round(col("v") + col("n1").cast("double") * col("n1")
            / (lit(2.0) * col("n2")), 6)).as("chao1"),
        when(col("n") > 0,
          round(lit(1.0) - col("n1").cast("double") / col("n"), 6))
          .as("coverage"))
    },

    // SKIP-GRAM CONTEXT PAIRS (Mikolov et al. '13) — the actual
    // training-pair artifact an embedding trainer consumes: for every
    // token, its contexts within a ±2 window, as a (center, context,
    // n) census. Pairs derive map-side by zipping each token array
    // against itself at offsets 1 and 2 (both directions emitted —
    // NO token-level self-join, the same shifted-zip discipline as
    // bigram_logprob), then one partial-aggregated count. The census
    // is vocabulary-bounded (≤V² rows) at any corpus size.
    Q("w2v_context_pairs",
      """WITH arr AS (SELECT string_split(text, ' ') AS a FROM documents),
        |p AS (
        |  SELECT unnest(list_transform(generate_series(1, len(a)-1),
        |    i -> [a[i], a[i+1]])) AS pr FROM arr
        |  UNION ALL
        |  SELECT unnest(list_transform(generate_series(1, len(a)-1),
        |    i -> [a[i+1], a[i]])) AS pr FROM arr
        |  UNION ALL
        |  SELECT unnest(list_transform(generate_series(1, len(a)-2),
        |    i -> [a[i], a[i+2]])) AS pr FROM arr
        |  UNION ALL
        |  SELECT unnest(list_transform(generate_series(1, len(a)-2),
        |    i -> [a[i+2], a[i]])) AS pr FROM arr)
        |SELECT pr[1] AS center, pr[2] AS context, CAST(COUNT(*) AS BIGINT) AS n
        |FROM p GROUP BY 1, 2 ORDER BY center, context""".stripMargin) { (s, dir) =>
      val arr = Tables.parallelize(
          Tables.load(s, dir, "documents").select("text"))
        .select(split(col("text"), " ").as("a"))
      def shifted(d: Int, rev: Boolean) = arr.select(explode(arrays_zip(
          slice(col("a"), lit(1), size(col("a")) - d),
          slice(col("a"), lit(1 + d), size(col("a")) - d))).as("p"))
        .select(
          (if (rev) col("p.1") else col("p.0")).as("center"),
          (if (rev) col("p.0") else col("p.1")).as("context"))
      shifted(1, rev = false).unionAll(shifted(1, rev = true))
        .unionAll(shifted(2, rev = false)).unionAll(shifted(2, rev = true))
        .groupBy("center", "context").agg(count(lit(1)).cast("long").as("n"))
        .orderBy("center", "context")
    },

    // NEGATIVE-SAMPLING TABLE — skip-gram's other input: the
    // unigram^0.75 distribution (the word2vec smoothing that lifts
    // rare words) as cumulative ranges a sampler binary-searches.
    // The 3/4 power is written as sqrt(f·sqrt(f)) — two CORRECTLY-
    // ROUNDED IEEE sqrts and one product, bit-identical across
    // engines where a libm pow() would not be — then quantized to
    // DECIMAL(18,6) so the normalizer and the cumulative ranges are
    // exact order-free sums. The oracle writes the naive global
    // cumulative window; the ENGINE computes the identical ranges
    // with the two-phase prefix scan (curriculum_order/snm_blocking
    // pattern): tokens bucket by their 2-char prefix — an ORDER-
    // PRESERVING truncation of the lexicographic sort key — bucket
    // weight subtotals cumsum to offsets over the <=|alphabet|²-row
    // bucket census, within-bucket cumsums run under a window
    // PARTITIONED by bucket (hash exchange, no single-partition
    // vocabulary sort), and cw = offset + within-bucket cw, exact
    // because every sum is DECIMAL. The vocabulary census grows with
    // corpus under Heaps' law, so the unpartitioned form the oracle
    // uses is precisely what we refuse to plan.
    Q("negative_sampling_table",
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |f AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq FROM t
        |      WHERE length(tok) > 0 GROUP BY 1),
        |w AS (SELECT tok, freq,
        |    CAST(round(sqrt(freq * sqrt(freq)), 6) AS DECIMAL(18,6)) AS w
        |  FROM f),
        |z AS (SELECT SUM(w) AS z FROM w),
        |c AS (SELECT tok, freq, w,
        |    SUM(w) OVER (ORDER BY tok ROWS UNBOUNDED PRECEDING) AS cw
        |  FROM w)
        |SELECT tok, freq,
        |  round(CAST(w AS DOUBLE) / CAST(z AS DOUBLE), 6) AS p_smooth,
        |  round(CAST(cw - w AS DOUBLE) / CAST(z AS DOUBLE), 6) AS cum_lo,
        |  round(CAST(cw AS DOUBLE) / CAST(z AS DOUBLE), 6) AS cum_hi
        |FROM c, z ORDER BY tok""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val f = Tables.load(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("tok"))
        .where(length(col("tok")) > 0)
        .groupBy("tok").agg(count(lit(1)).cast("long").as("freq"))
      val w = f.select(col("tok"), col("freq"),
        round(sqrt(col("freq") * sqrt(col("freq"))), 6)
          .cast(DecimalType(18, 6)).as("w"),
        substring(col("tok"), 1, 2).as("bucket"))
      val z = w.agg(sum(col("w")).as("z"))
      val offsets = w.groupBy("bucket").agg(sum(col("w")).as("bw"))
        .withColumn("offset",
          coalesce(sum(col("bw")).over(Window.orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, -1)),
            lit(BigDecimal(0)).cast(DecimalType(18, 6))))
        .select("bucket", "offset")
      val wb = Window.partitionBy("bucket").orderBy("tok")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      w.withColumn("cw", sum(col("w")).over(wb))
        .join(broadcast(offsets), "bucket")
        .withColumn("cw", col("offset") + col("cw"))
        .crossJoin(broadcast(z))
        .select(col("tok"), col("freq"),
          round(col("w").cast("double") / col("z").cast("double"), 6)
            .as("p_smooth"),
          round((col("cw") - col("w")).cast("double") / col("z").cast("double"), 6)
            .as("cum_lo"),
          round(col("cw").cast("double") / col("z").cast("double"), 6)
            .as("cum_hi"))
        .orderBy("tok")
    }
  )

  /** pmi_collocations: minimum pair count (rare-pair PMI is noise)
    * and reported list size.
    */
  val MinColl = 5
  val CollTopK = 20

  /** textrank_keywords: minimum adjacent co-occurrence for a graph
    * edge, and reported keyword count.
    */
  val MinCooc = 3
  val TextRankTopK = 15

  /** The bpe_merges training loop, shared with bpe_encode: `rounds`
    * greedy merges over the word-type table. Returns, per completed
    * round, the chosen pair, its weighted frequency, and the
    * localCheckpoint'ed words frame (w, syms, cnt) AFTER that round's
    * merge. Per round: one shuffle (the weighted pair count), one
    * single-row driver decision (the argmax pair — the same
    * bounded-collect contract as each k-means iteration), and a
    * row-local [[bpeMergeFold]] merge, with the connectedComponents
    * lineage discipline so `rounds` interpreted folds never nest in
    * one plan.
    */
  /** Driver-round counter for [[bpeTrainRounds]] — observable by
    * VocabSpec's listener test, which pins that batching actually cut
    * the sequential argmax round-trips (not just the job count).
    */
  private[graft] val bpeArgmaxRounds = new java.util.concurrent.atomic.AtomicInteger

  /** The multi-merge selection rule: from the pair list sorted by
    * (count desc, pa, pb), accept the maximal CONTIGUOUS prefix of
    * mutually symbol-disjoint pairs (the merged symbol counts as used
    * too — "ab" may collide with an existing symbol), capped at
    * `want`, then truncate to pairs whose count is STRICTLY above the
    * first excluded pair's count (`fenceCount`). Why this is exactly
    * sequential greedy: disjoint merges cannot change each other's
    * counts, and every pair a merge CREATES has count <= its parent
    * pair's old count <= fenceCount < every accepted count — so at
    * each sequential step the next accepted pair is still the
    * (count, pa, pb) argmax. Falls back to the top-1 pair when
    * truncation empties the batch (plain greedy always progresses).
    */
  private[graft] def bpeSelectBatch(top: Seq[(String, String, Long)], want: Int,
      hasMore: Boolean): Seq[(String, String, Long)] = {
    val used = scala.collection.mutable.Set.empty[String]
    var accepted = Vector.empty[(String, String, Long)]
    var stopped = -1 // index of the first conflicting pair, if any
    var i = 0
    while (stopped < 0 && i < top.length && accepted.length < want) {
      val (a, b, _) = top(i)
      if (used(a) || used(b) || used(a + b)) stopped = i
      else { accepted :+= top(i); used ++= Seq(a, b, a + b) }
      i += 1
    }
    val fenceCount: Option[Long] =
      if (stopped >= 0) Some(top(stopped)._3)
      else if (i < top.length) Some(top(i)._3) // cut by `want`
      else if (hasMore) Some(top.last._3) // list truncated upstream: be safe
      else None // the corpus has no pairs beyond `top`
    val fenced = fenceCount match {
      case Some(fc) => accepted.takeWhile(_._3 > fc)
      case None => accepted
    }
    if (fenced.isEmpty) accepted.take(1) else fenced
  }

  private[graft] def bpeTrainRounds(s: org.apache.spark.sql.SparkSession, dir: String,
      rounds: Int): Seq[(String, String, Long, org.apache.spark.sql.DataFrame)] = {
    bpeArgmaxRounds.set(0)
    var words = Tables.load(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(col("w"),
        filter(split(col("w"), ""), c => c =!= lit("")).as("syms"), col("cnt"))
      .localCheckpoint(true)
    val out = Seq.newBuilder[(String, String, Long, org.apache.spark.sql.DataFrame)]
    var done = 0
    var exhausted = false
    while (done < rounds && !exhausted) {
      val want = rounds - done
      // ONE aggregation serves up to `want` merges (+1 row = the fence
      // that proves the batch safe) — this is what cuts the sequential
      // driver round-trips from `rounds` to ~log-ish few
      bpeArgmaxRounds.incrementAndGet()
      val top = words.filter(size(col("syms")) > 1)
        .select(col("cnt"), explode(expr(
          "transform(sequence(1, size(syms) - 1), i -> " +
            "struct(element_at(syms, i) AS pa, element_at(syms, i + 1) AS pb))"))
          .as("p"))
        .groupBy(col("p.pa").as("pa"), col("p.pb").as("pb"))
        .agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("pa"), col("pb"))
        .limit(want + 1).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
      if (top.isEmpty) exhausted = true
      else {
        val batch = bpeSelectBatch(top, want, hasMore = top.length == want + 1)
        // apply the whole batch with ONE checkpoint at its end: the
        // intermediate per-merge states callers read vocab stats off
        // stay lazy (<= batch-size nested folds over the dictionary-
        // sized table — cheap to recompute), while the round-over-
        // round lineage discipline (see connectedComponents) holds at
        // batch granularity
        for (((a, b, n), j) <- batch.zipWithIndex) {
          words = words.select(col("w"),
            bpeMergeFold(col("syms"), a, b).as("syms"), col("cnt"))
          if (j == batch.length - 1) words = words.localCheckpoint(true)
          out += ((a, b, n, words))
        }
        done += batch.length
      }
    }
    out.result()
  }
}
