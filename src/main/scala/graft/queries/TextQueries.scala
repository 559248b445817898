package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.functions.PortableHash.{duckH32, h32}
import graft.ops.{Dedup, Multimodal, TextAnalysis}

/** Text-analysis + multimodal-column operators as queries (north-star
  * set): language-ID heuristic, quality scoring, token counting,
  * document fingerprinting, and the multimodal metadata path.
  */
object TextQueries {

  private val stopwords = Seq("the", "a")

  /** bm25_score: fixed query terms (one corpus-absent — 'quux' — so
    * the df=0 idf path runs on every row) and the standard Okapi
    * constants.
    */
  val Bm25Query = Seq("spark", "join", "table", "quux")
  val Bm25K1 = 1.2
  val Bm25B = 0.75

  /** Dirichlet smoothing pseudo-count for lmdir_score (the Zhai &
    * Lafferty recommended magnitude). */
  val LmDirMu = 2000

  def all: Seq[Q] = Seq(

    // language-ID heuristic: marker-token scores + deterministic argmax
    Q("lang_id", {
      val scores = TextAnalysis.langProfiles.map { case (lang, ws) =>
        s"(${ws.map(w => s"len(list_filter(string_split(text, ' '), t -> t = '$w'))").mkString(" + ")}) AS s_$lang"
      }.mkString(",\n  ")
      val langs = TextAnalysis.langProfiles.map(_._1)
      val cases = langs.init.zipWithIndex.map { case (l, i) =>
        val rest = langs.drop(i + 1)
        s"WHEN ${rest.map(r => s"s_$l >= s_$r").mkString(" AND ")} THEN '$l'"
      }.mkString(" ")
      s"""WITH s AS (SELECT doc_id, lang, $scores FROM documents)
         |SELECT doc_id, ${langs.map("s_" + _).mkString(", ")},
         |  CASE $cases ELSE '${langs.last}' END AS pred_lang,
         |  (CASE $cases ELSE '${langs.last}' END) = lang AS is_match
         |FROM s ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      val scoreCols = TextAnalysis.langProfiles.map { case (lang, ws) =>
        lang -> TextAnalysis.langScore(col("text"), ws)
      }
      // the per-row marker-token scoring over split(text) is the cost
      // and runs before the sort exchange — parallelize the projection
      val withScores = Tables.parallelize(Tables.load(s, dir, "documents")
          .select("doc_id", "lang", "text"))
        .select(Seq(col("doc_id"), col("lang")) ++
          scoreCols.map { case (l, c) => c.as(s"s_$l") }: _*)
      val pred = TextAnalysis.predictedLang(
        scoreCols.map { case (l, _) => l -> col(s"s_$l") })
      withScores
        .withColumn("pred_lang", pred)
        .withColumn("is_match", col("pred_lang") === col("lang"))
        .drop("lang")
        .orderBy("doc_id")
    },

    // Language-ID CONFUSION MATRIX — the eval census over lang_id's
    // per-doc predictions: (true lang, predicted lang, count). The
    // off-diagonal mass is the curation signal (which language pairs
    // the n-gram heuristic confuses, hence which lang buckets need a
    // stronger classifier before lang-stratified sampling trusts
    // them). Same scan-side scoring as lang_id; the aggregate output
    // is <= |langs|^2 rows at any corpus size.
    Q("lang_confusion", {
      val scores = TextAnalysis.langProfiles.map { case (lang, ws) =>
        s"(${ws.map(w => s"len(list_filter(string_split(text, ' '), t -> t = '$w'))").mkString(" + ")}) AS s_$lang"
      }.mkString(",\n  ")
      val langs = TextAnalysis.langProfiles.map(_._1)
      val cases = langs.init.zipWithIndex.map { case (l, i) =>
        val rest = langs.drop(i + 1)
        s"WHEN ${rest.map(r => s"s_$l >= s_$r").mkString(" AND ")} THEN '$l'"
      }.mkString(" ")
      s"""WITH s AS (SELECT doc_id, lang, $scores FROM documents),
         |p AS (SELECT lang, CASE $cases ELSE '${langs.last}' END AS pred_lang FROM s)
         |SELECT lang, pred_lang, COUNT(*) AS n
         |FROM p GROUP BY lang, pred_lang ORDER BY lang, pred_lang""".stripMargin
    }) { (s, dir) =>
      val scoreCols = TextAnalysis.langProfiles.map { case (lang, ws) =>
        lang -> TextAnalysis.langScore(col("text"), ws)
      }
      val pred = TextAnalysis.predictedLang(
        scoreCols.map { case (l, _) => l -> col(s"s_$l") })
      Tables.parallelize(Tables.load(s, dir, "documents")
          .select("doc_id", "lang", "text"))
        .select(Seq(col("lang")) ++
          scoreCols.map { case (l, c) => c.as(s"s_$l") }: _*)
        .select(col("lang"), pred.as("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "pred_lang")
    },

    // quality scoring: length saturation x (1 - stopword ratio)
    Q("quality_score",
      s"""SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
         |  round(least(1.0, len(string_split(text, ' ')) * 1.0 / 100.0)
         |    * (1.0 - (${stopwords.map(w => s"len(list_filter(string_split(text, ' '), t -> t = '$w'))").mkString(" + ")})
         |        * 1.0 / len(string_split(text, ' '))), 6) AS score
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.wsTokenCount(col("text")).as("n_tokens"),
          TextAnalysis.qualityScore(col("text"), stopwords).as("score"))
        .orderBy("doc_id")
    },

    // token counting: whitespace + BPE-ish subword segmentation
    Q("token_count",
      """SELECT doc_id, len(string_split(text, ' ')) AS ws_tokens,
        |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS bpe_tokens,
        |  length(text) AS n_chars_len
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.wsTokenCount(col("text")).as("ws_tokens"),
          TextAnalysis.bpeishTokenCount(col("text")).as("bpe_tokens"),
          length(col("text")).as("n_chars_len"))
        .orderBy("doc_id")
    },

    // punctuation / character-class ratios (the remaining quality
    // heuristic: high punct or digit density flags low-quality text)
    Q("punct_stats",
      """SELECT doc_id,
        |  len(regexp_extract_all(text, '[^a-z0-9 ]')) AS n_punct,
        |  len(regexp_extract_all(text, '[0-9]')) AS n_digit,
        |  round(len(regexp_extract_all(text, '[^a-z0-9 ]')) * 1.0 / length(text), 6) AS punct_ratio,
        |  round(len(regexp_extract_all(text, '[0-9]')) * 1.0 / length(text), 6) AS digit_ratio
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val punct = size(expr("regexp_extract_all(text, '[^a-z0-9 ]', 0)"))
      val digit = size(expr("regexp_extract_all(text, '[0-9]', 0)"))
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          punct.as("n_punct"), digit.as("n_digit"),
          round(punct * lit(1.0) / length(col("text")), 6).as("punct_ratio"),
          round(digit * lit(1.0) / length(col("text")), 6).as("digit_ratio"))
        .orderBy("doc_id")
    },

    // document fingerprinting: min/max shingle hash + whole-text hash
    Q("doc_fingerprint",
      s"""WITH arr AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
         |sh AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(a)-2),
         |        i -> a[i] || ' ' || a[i+1] || ' ' || a[i+2])) AS shingle FROM arr),
         |dsh AS (SELECT DISTINCT doc_id, shingle FROM sh),
         |hs AS (SELECT doc_id, ${duckH32(0, "shingle")} AS h FROM dsh),
         |f AS (SELECT doc_id, min(h) AS fp_min, max(h) AS fp_max
         |      FROM hs GROUP BY doc_id)
         |SELECT f.doc_id AS doc_id, fp_min, fp_max, ${duckH32("text")} AS fp_text
         |FROM f JOIN documents d ON f.doc_id = d.doc_id
         |ORDER BY f.doc_id""".stripMargin) { (s, dir) =>
      // One scan, one exchange, no join: min/max are duplicate-
      // invariant, so the oracle's DISTINCT shingle step is skipped
      // (min over the multiset == min over the set); fp_text is
      // computed once per doc BEFORE the explode and rides through the
      // same partial-aggregated groupBy (max of a per-doc constant).
      // Docs with < 3 tokens have no shingles and drop out of the
      // explode, matching the oracle's inner join.
      val base = Tables.parallelize(Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text")))
      base
        .select(col("doc_id"), h32(col("text")).as("fp_text"),
          Dedup.shingles(col("text")).as("sh"))
        .select(col("doc_id"), col("fp_text"), explode(col("sh")).as("shingle"))
        .select(col("doc_id"), col("fp_text"), h32(0, col("shingle")).as("h"))
        .groupBy("doc_id")
        .agg(min(col("h")).as("fp_min"), max(col("h")).as("fp_max"),
          max(col("fp_text")).as("fp_text"))
        .select("doc_id", "fp_min", "fp_max", "fp_text")
        .orderBy("doc_id")
    },

    // deterministic train/val/test assignment + stratified sampling —
    // the data-selection step of a training pipeline. Hash-based (not
    // rand()): assignment is a pure function of doc_id, so it is
    // stable across runs, engines, and repartitioning, and never needs
    // a persisted split table. 80/10/10 by md5 bucket; sample keeps a
    // fixed per-lang 20% sub-bucket.
    Q("train_split", {
      val h = duckH32("CAST(doc_id AS VARCHAR)")
      s"""WITH s AS (SELECT doc_id, lang, $h % 100 AS bucket FROM documents),
         |a AS (SELECT doc_id, lang,
         |    CASE WHEN bucket < 80 THEN 'train'
         |         WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
         |    (bucket % 5 = 0) AS in_sample
         |  FROM s)
         |SELECT lang, split, COUNT(*) AS n,
         |  COUNT(CASE WHEN in_sample THEN 1 END) AS n_sampled
         |FROM a GROUP BY lang, split ORDER BY lang, split""".stripMargin
    }) { (s, dir) =>
      val bucket = h32(col("doc_id").cast("string")) % 100
      Tables.load(s, dir, "documents")
        .select(col("lang"), bucket.as("bucket"))
        .select(col("lang"),
          when(col("bucket") < 80, "train")
            .when(col("bucket") < 90, "val")
            .otherwise("test").as("split"),
          (col("bucket") % 5 === 0).as("in_sample"))
        .groupBy("lang", "split")
        .agg(count(lit(1)).as("n"),
          count(when(col("in_sample"), 1)).as("n_sampled"))
        .orderBy("lang", "split")
    },

    // Deterministic STRATIFIED sampling — balance a skewed corpus by
    // language without rand(): per-stratum counts (tiny agg, broadcast
    // back) set each doc's keep test to h32(doc_id) % stratum_count <
    // target, so every stratum keeps ~target docs regardless of its
    // share of the corpus. Reproducible under any partitioning and
    // re-runnable on a grown corpus (membership shifts only as counts
    // do — no RNG state to persist). The corpus side streams; only the
    // per-lang count table moves.
    Q("stratified_sample", {
      val target = 30
      val h = duckH32("CAST(doc_id AS VARCHAR)")
      s"""WITH cnt AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang)
         |SELECT doc_id, lang FROM documents JOIN cnt USING (lang)
         |WHERE $h % n < $target ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      val target = 30
      val docs = Tables.load(s, dir, "documents")
      val cnt = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      docs.join(broadcast(cnt), "lang")
        .filter(h32(col("doc_id").cast("string")) % col("n") < target)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    },

    // WEIGHTED sampling (Efraimidis–Spirakis exponential-key form,
    // "Weighted random sampling with a reservoir", IPL 2006): per
    // source, keep the k docs minimizing -ln(u)/w where w = n_chars —
    // longer docs proportionally likelier, exactly the importance-
    // weighted subset selection a data-mixing pipeline runs. u is
    // hash-derived (no rand()): reproducible under any partitioning
    // and any cluster size, re-runnable as the corpus grows. The
    // per-source top-k is one hash-partitioned window (sources are
    // the parallelism unit; a mega-source swaps in TopKPerGroup —
    // same contract as source_cap). Keys are rounded to 12 dp so the
    // cross-engine ln ulp cannot flip an ordering that the doc_id
    // tiebreak doesn't already fix.
    Q("weighted_sample", {
      val k = 5
      val h = duckH32("CAST(doc_id AS VARCHAR)")
      s"""WITH u AS (SELECT source, doc_id, n_chars,
         |    CAST(($h % 1000003) + 1 AS DOUBLE) / 1000003.0 AS u
         |  FROM documents WHERE n_chars > 0),
         |kk AS (SELECT source, doc_id, n_chars,
         |    round(-ln(u) / n_chars, 12) AS samp_key FROM u),
         |r AS (SELECT *, row_number() OVER
         |        (PARTITION BY source ORDER BY samp_key, doc_id) AS rnk
         |      FROM kk)
         |SELECT source, doc_id, n_chars, samp_key FROM r
         |WHERE rnk <= $k ORDER BY source, doc_id""".stripMargin
    }) { (s, dir) =>
      val k = 5
      val w = Window.partitionBy("source").orderBy(col("samp_key"), col("doc_id"))
      Tables.load(s, dir, "documents")
        .where(col("n_chars") > 0)
        .select(col("source"), col("doc_id"), col("n_chars"),
          ((h32(col("doc_id").cast("string")) % 1000003 + 1).cast("double") /
            1000003.0).as("u"))
        .withColumn("samp_key", round(-log(col("u")) / col("n_chars"), 12))
        .withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= k)
        .select("source", "doc_id", "n_chars", "samp_key")
        .orderBy("source", "doc_id")
    },

    // repetition statistics — the Gopher/C4-family repetition filters:
    // type-token ratio, most-frequent-token coverage, most-frequent-
    // bigram coverage. Shape matters at 100 TB: token counts come from
    // explode -> (doc, token) partial-aggregated counts (map-side
    // combine eats the duplicate mass before the shuffle), NOT a
    // per-row O(n^2) array self-scan; the two aggregate trees join on
    // doc_id with both sides already hash-partitioned by the groupBy.
    Q("repetition_stats",
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |uc AS (SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2),
        |us AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
        |         COUNT(*) AS n_types, CAST(MAX(c) AS BIGINT) AS top_tok FROM uc GROUP BY doc_id),
        |arr AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
        |bg AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(a)-1),
        |         i -> a[i] || ' ' || a[i+1])) AS b FROM arr),
        |bc AS (SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY 1, 2),
        |bs AS (SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_bg,
        |         CAST(SUM(c) AS BIGINT) AS n_bigrams FROM bc GROUP BY doc_id)
        |SELECT us.doc_id AS doc_id, n_tokens, n_types,
        |  CAST(n_types AS DOUBLE) / n_tokens AS type_token_ratio,
        |  CAST(top_tok AS DOUBLE) / n_tokens AS top_token_frac,
        |  CAST(top_bg AS DOUBLE) / n_bigrams AS top_bigram_frac
        |FROM us JOIN bs ON us.doc_id = bs.doc_id
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val base = Tables.parallelize(Tables.load(s, dir, "documents")
          .select("doc_id", "text"))
        .select(col("doc_id"), split(col("text"), " ").as("a"))
      val uni = base.select(col("doc_id"), explode(col("a")).as("tok"))
        .groupBy("doc_id", "tok").count()
        .groupBy("doc_id")
        .agg(sum("count").as("n_tokens"), count(lit(1)).as("n_types"),
          max("count").as("top_tok"))
      // bigrams: zip the array against itself shifted by one — no
      // window, no second tokenize; docs with < 2 tokens produce an
      // empty array and drop out (matching the oracle's inner join).
      // arrays_zip + post-explode concat, NOT zip_with(concat): the
      // HOF is CodegenFallback and interprets the concat lambda per
      // token; arrays_zip and the post-generate projection are both
      // whole-stage-codegen'd (the bigram_logprob discipline, r14)
      val n = size(col("a"))
      val bigrams = arrays_zip(
        slice(col("a"), lit(1), n - 1), slice(col("a"), lit(2), n - 1))
      val bg = base.select(col("doc_id"), explode(bigrams).as("p"))
        .select(col("doc_id"), concat(col("p.0"), lit(" "), col("p.1")).as("b"))
        .groupBy("doc_id", "b").count()
        .groupBy("doc_id")
        .agg(max("count").as("top_bg"), sum("count").as("n_bigrams"))
      uni.join(bg, "doc_id")
        .select(col("doc_id"), col("n_tokens"), col("n_types"),
          (col("n_types").cast("double") / col("n_tokens")).as("type_token_ratio"),
          (col("top_tok").cast("double") / col("n_tokens")).as("top_token_frac"),
          (col("top_bg").cast("double") / col("n_bigrams")).as("top_bigram_frac"))
        .orderBy("doc_id")
    },

    // Frequent tokens per language via the Misra-Gries heavy-hitters
    // sketch (capacity 64): O(capacity) state per group, only buffers
    // shuffle. The fixture vocabulary is far below capacity, so MG is
    // EXACT here and the oracle is the plain grouped count with the
    // same (count DESC, token ASC) total order; FreqItemsSpec covers
    // the lossy (decrement/truncate) regime the oracle can't.
    // Sequence PACKING — greedy contiguous packing of documents into
    // fixed-token-budget training sequences (the pretraining batch
    // construction step). Docs are sharded by portable hash so each
    // cumulative-sum window is PARTITIONED (a global cumsum would be a
    // single-partition window — the exact scale bug the prefix-Jaccard
    // fix removed); within a shard, seq_id = floor(tokens-before/
    // budget). At cluster scale shards map 1:1 to writer tasks and the
    // window is per-task streaming state.
    Q("pack_sequences",
      s"""$packCtes
         |SELECT doc_id, shard, n_tokens, seq_id
         |FROM bins ORDER BY doc_id""".stripMargin) { (s, dir) =>
      TextQueries.packBins(s, dir).orderBy("doc_id")
    },

    // Document CHUNKING — split long documents into fixed-budget token
    // windows (context-length preparation): one output row per
    // (doc, chunk), chunk text re-joined from the token slice. Pure
    // map-side generate — no shuffle at all; chunk counts derive from
    // the token array already in hand.
    Q("chunk_documents",
      """WITH arr AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
        |c AS (SELECT doc_id, len(a) AS n,
        |    unnest(generate_series(0, (len(a) - 1) // 64)) AS chunk_idx, a
        |  FROM arr)
        |SELECT doc_id, chunk_idx,
        |  CAST(least(64, n - chunk_idx * 64) AS BIGINT) AS chunk_tokens,
        |  array_to_string(a[chunk_idx * 64 + 1 : least(chunk_idx * 64 + 64, n)], ' ') AS chunk_text
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin) { (s, dir) =>
      val W = 64
      Tables.parallelize(Tables.load(s, dir, "documents")
          .select("doc_id", "text"))
        .select(col("doc_id"), split(col("text"), " ").as("a"))
        .select(col("doc_id"), size(col("a")).as("n"),
          posexplode(transform(
            sequence(lit(0), floor((size(col("a")) - 1) / W).cast("int")),
            i => slice(col("a"), i * W + 1, lit(W)))).as(Seq("chunk_idx", "chunk")))
        .select(col("doc_id"), col("chunk_idx"),
          size(col("chunk")).cast("long").as("chunk_tokens"),
          array_join(col("chunk"), " ").as("chunk_text"))
        .orderBy("doc_id", "chunk_idx")
    },

    // OVERLAPPING chunking — the retrieval-index variant of
    // chunk_documents: windows of W tokens advancing by stride S < W,
    // so every boundary-crossing span is fully inside at least one
    // chunk (the property retrieval needs and disjoint chunking
    // lacks; the cost is W/S-x duplication, here 2x). Same map-side
    // shape as chunk_documents: chunks derive row-locally from each
    // doc's own token array, no shuffle until the output sort, and at
    // 100 TB no sort at all — chunks land partitioned however the
    // writer wants them.
    Q("chunk_overlap", {
      val (w, st) = (64, 32)
      s"""WITH arr AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
         |c AS (SELECT doc_id, len(a) AS n,
         |    unnest(generate_series(0, greatest(0, ((len(a) - 1) - ($w - $st)) // $st))) AS chunk_idx, a
         |  FROM arr)
         |SELECT doc_id, chunk_idx,
         |  CAST(chunk_idx * $st AS BIGINT) AS start_tok,
         |  CAST(least($w, n - chunk_idx * $st) AS BIGINT) AS chunk_tokens,
         |  array_to_string(a[chunk_idx * $st + 1 : least(chunk_idx * $st + $w, n)], ' ') AS chunk_text
         |FROM c ORDER BY doc_id, chunk_idx""".stripMargin
    }) { (s, dir) =>
      val W = 64
      val S = 32
      val nChunks = // last window starts at the largest multiple of S < n - (W - S)
        greatest(lit(0), floor((size(col("a")) - 1 - (W - S)) / S)).cast("int")
      Tables.parallelize(Tables.load(s, dir, "documents")
          .select("doc_id", "text"))
        .select(col("doc_id"), split(col("text"), " ").as("a"))
        .select(col("doc_id"), size(col("a")).as("n"),
          posexplode(transform(
            sequence(lit(0), nChunks),
            i => slice(col("a"), i * S + 1, lit(W)))).as(Seq("chunk_idx", "chunk")))
        .select(col("doc_id"), col("chunk_idx"),
          (col("chunk_idx") * S).cast("long").as("start_tok"),
          size(col("chunk")).cast("long").as("chunk_tokens"),
          array_join(col("chunk"), " ").as("chunk_text"))
        .orderBy("doc_id", "chunk_idx")
    },

    // DECONTAMINATION — the eval-leakage check every training corpus
    // runs: which held-out (test-split) documents share verbatim
    // n-grams with the train split? Splits come from the train_split
    // hash rule; evidence n-grams are RARE shingles only (document
    // frequency <= 20 across the corpus) because ubiquitous n-grams
    // are function-of-the-language, not leakage — exactly the max-df
    // cut real decontamination pipelines apply, and ALSO the scale
    // guard: it bounds the per-shingle join fanout, so the
    // train x test equi-join on shingle hash stays linear in matches
    // (never |train| x |test|). Bodies don't join — only (doc, hash)
    // pairs. Output: each contaminated test doc with its count of
    // distinct shared rare shingles and of distinct train docs
    // implicated.
    Q("decontamination", {
      val maxDf = 20
      val h = duckH32("CAST(doc_id AS VARCHAR)")
      s"""WITH arr AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
         |sh AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(a)-2),
         |        i -> a[i] || ' ' || a[i+1] || ' ' || a[i+2])) AS shingle FROM arr),
         |dsh AS (SELECT DISTINCT doc_id, shingle FROM sh),
         |rare AS (SELECT shingle FROM dsh GROUP BY shingle
         |         HAVING COUNT(*) <= $maxDf),
         |tagged AS (SELECT doc_id, $h % 100 AS bucket FROM documents),
         |tr AS (SELECT dsh.doc_id, shingle FROM dsh
         |       JOIN tagged USING (doc_id) JOIN rare USING (shingle)
         |       WHERE bucket < 80),
         |te AS (SELECT dsh.doc_id, shingle FROM dsh
         |       JOIN tagged USING (doc_id) JOIN rare USING (shingle)
         |       WHERE bucket >= 90)
         |SELECT te.doc_id,
         |  COUNT(DISTINCT te.shingle) AS n_shared_shingles,
         |  COUNT(DISTINCT tr.doc_id) AS n_train_docs
         |FROM te JOIN tr USING (shingle)
         |GROUP BY te.doc_id ORDER BY te.doc_id""".stripMargin
    }) { (s, dir) =>
      val maxDf = 20
      val docs = Tables.load(s, dir, "documents")
      // materialize the (doc, shingle-HASH) index ONCE — rare + both
      // split branches would otherwise each re-shingle the corpus (the
      // same ReuseExchange-defeating branch shape as
      // dedup_prefix_jaccard); at scale this materialization IS the
      // decontamination index a production pipeline persists. Shingle
      // STRINGS never leave the scan stage: everything wide (df
      // counts, the train x test equi-join, the distinct counts) runs
      // on 8-byte xxhash64 keys — same accepted collision class
      // (~1e-11 at the fixture dictionary) as the prefix-Jaccard
      // verify arrays; the oracle counts strings, so a collision
      // would surface as a gate mismatch, not silent corruption.
      val dsh = graft.ops.Dedup.distinctShingles(docs, "doc_id", "text")
        .select(col("doc_id"), xxhash64(col("shingle")).as("h"))
        .localCheckpoint(false)
      val rare = dsh.groupBy("h")
        .agg(count(lit(1)).as("df")).filter(col("df") <= maxDf)
        .select("h")
      val bucket = h32(col("doc_id").cast("string")) % 100
      val tagged = dsh.join(rare, "h")
        .withColumn("bucket", bucket)
      val tr = tagged.filter(col("bucket") < 80)
        .select(col("doc_id").as("train_doc"), col("h"))
      val te = tagged.filter(col("bucket") >= 90)
        .select(col("doc_id"), col("h"))
      te.join(tr, "h")
        .groupBy("doc_id")
        .agg(countDistinct(col("h")).as("n_shared_shingles"),
          countDistinct(col("train_doc")).as("n_train_docs"))
        .orderBy("doc_id")
    },

    // Source MIXING WEIGHTS — temperature-scaled sampling weights per
    // source (w_s ∝ tokens_s^0.7, the standard upweight-the-tail
    // recipe for multi-source training data). Cross-engine float
    // parity: pow() is rounded to 6 dp THEN cast to decimal, the
    // normalizer is an EXACT decimal sum (order-independent — a double
    // sum would drift with partitioning and engine), and the final
    // ratio divides the two exact-decimal-to-double values.
    Q("source_mix",
      """WITH t AS (SELECT source, COUNT(*) AS n_docs,
        |    SUM(len(string_split(text, ' '))) AS n_tokens FROM documents
        |    GROUP BY source),
        |w AS (SELECT source, n_docs, n_tokens,
        |    CAST(round(pow(n_tokens, 0.7), 6) AS DECIMAL(28,6)) AS raw FROM t)
        |SELECT source, n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  round(CAST(raw AS DOUBLE) /
        |    CAST(SUM(raw) OVER () AS DOUBLE), 6) AS weight
        |FROM w ORDER BY source""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.DecimalType
      val t = Tables.load(s, dir, "documents")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split(col("text"), " "))).as("n_tokens"))
        .withColumn("raw",
          round(pow(col("n_tokens"), 0.7), 6).cast(DecimalType(28, 6)))
      // the unpartitioned window is over the SOURCE dimension (tens of
      // rows after aggregation), not the corpus — same scale class as
      // any broadcast dimension
      t.select(col("source"), col("n_docs"),
          col("n_tokens").cast("long").as("n_tokens"),
          round(col("raw").cast("double") /
            sum(col("raw")).over(Window.partitionBy()).cast("double"), 6)
            .as("weight"))
        .orderBy("source")
    },

    // TOKEN BURSTINESS (Church & Gale '95) — the corpus statistic
    // separating content words from function words: function words
    // spread evenly (per-doc counts near Poisson, variance-to-mean
    // ratio ~1), content words BURST (high counts in few docs, VMR
    // >> 1). Reported for the top-30 tokens by total count:
    // document frequency, total count, burstiness tf/df (mean count
    // per CONTAINING doc), and the zero-inclusive VMR
    // (Σc²/N − μ²)/μ with μ = tf/N. Every statistic derives from
    // three integer sums per token (Σ1, Σc, Σc² over containing
    // docs) — vocabulary-bounded aggregates, one corpus scan, and
    // the deterministic doubles the suite's determinism rules
    // require. The top-30 select is TWO-LEVEL: a per-hash-bucket
    // top-30 window (hash-partitioned — spreads however large the
    // vocabulary grows under Heaps' law) feeds the global ranking
    // window with <= 30·B rows, because every global top-30 token is
    // necessarily in its own bucket's top-30. The single-partition
    // exchange therefore carries <= 30·B rows at ANY corpus size —
    // the SCALE.md vocab-window escape hatch, implemented.
    Q("token_burstiness",
      """WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |c AS (SELECT w, doc_id, COUNT(*) AS c FROM tk GROUP BY 1, 2),
        |n AS (SELECT COUNT(*) AS nd FROM documents),
        |s AS (SELECT w, COUNT(*) AS df, CAST(SUM(c) AS BIGINT) AS tf,
        |        CAST(SUM(c * c) AS BIGINT) AS s2 FROM c GROUP BY 1),
        |r AS (SELECT w, df, tf, s2, row_number() OVER (
        |        ORDER BY tf DESC, w) AS rnk FROM s)
        |SELECT rnk, w AS token, df, tf,
        |  round(CAST(tf AS DOUBLE) / df, 6) AS burstiness,
        |  round((CAST(s2 AS DOUBLE) / nd
        |    - (CAST(tf AS DOUBLE) / nd) * (CAST(tf AS DOUBLE) / nd))
        |    / (CAST(tf AS DOUBLE) / nd), 6) AS vmr
        |FROM r CROSS JOIN n WHERE rnk <= 30 ORDER BY rnk""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val tk = Tables.parallelize(Tables.load(s, dir, "documents")
          .select("doc_id", "text"))
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      val c = tk.groupBy("w", "doc_id").agg(count(lit(1)).as("c"))
      val n = Tables.load(s, dir, "documents").agg(count(lit(1)).as("nd"))
      val sums = c.groupBy("w")
        .agg(count(lit(1)).as("df"), sum(col("c")).as("tf"),
          sum(col("c") * col("c")).as("s2"))
      // two-level top-k: bucket ranks run hash-partitioned (parallel,
      // vocab-sized input spread over B buckets); only the <= 30·B
      // bucket winners reach the global ranking window
      val bucketTop = sums
        .withColumn("bkt", pmod(hash(col("w")), lit(32)))
        .withColumn("brnk", row_number().over(
          Window.partitionBy("bkt").orderBy(col("tf").desc, col("w"))))
        .filter(col("brnk") <= 30)
      val r = bucketTop
        .withColumn("rnk",
          row_number().over(Window.orderBy(col("tf").desc, col("w"))))
        .filter(col("rnk") <= 30)
        .drop("bkt", "brnk")
      val mu = col("tf").cast("double") / col("nd")
      r.crossJoin(broadcast(n))
        .select(col("rnk"), col("w").as("token"), col("df"), col("tf"),
          round(col("tf").cast("double") / col("df"), 6).as("burstiness"),
          round((col("s2").cast("double") / col("nd") - mu * mu) / mu, 6)
            .as("vmr"))
        .orderBy("rnk")
    },

    Q("freq_tokens",
      """WITH tc AS (SELECT lang, tok, COUNT(*) AS est FROM
        |  (SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY 1, 2),
        |r AS (SELECT lang, tok AS item, est, row_number() OVER (
        |        PARTITION BY lang ORDER BY est DESC, tok) AS rnk FROM tc)
        |SELECT lang, rnk, item, est FROM r WHERE rnk <= 10
        |ORDER BY lang, rnk""".stripMargin) { (s, dir) =>
      import graft.functions.FreqItemsAgg
      Tables.parallelize(Tables.load(s, dir, "documents")
          .select("lang", "text"))
        .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("lang")
        .agg(FreqItemsAgg(col("tok"), 64).as("fi"))
        .select(col("lang"), posexplode(col("fi")).as(Seq("pos", "f")))
        .filter(col("pos") < 10)
        .select(col("lang"), (col("pos") + 1).as("rnk"),
          col("f.item").as("item"), col("f.est").as("est"))
        .orderBy("lang", "rnk")
    },

    // Unigram language-model scoring — the statistical half of a
    // perplexity quality filter: train the unigram LM on the corpus
    // itself (global token frequencies), score each document by its
    // total and mean token log-probability. Two aggregation trees over
    // ONE tokenization, joined on token (the LM side is vocab-sized —
    // broadcast here; shuffle-join it when vocab outgrows broadcast).
    // Determinism: each log term is rounded to 6 dp and summed as
    // DECIMAL(20,6) — an unrounded double sum would depend on row
    // order and never cross-engine-match.
    Q("unigram_logprob",
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |dtc AS (SELECT doc_id, tok, COUNT(*) AS dc FROM toks GROUP BY 1, 2),
        |g AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY 1),
        |n AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM g)
        |SELECT doc_id, CAST(SUM(dc) AS BIGINT) AS n_tokens,
        |  CAST(SUM(dc * CAST(round(ln(CAST(c AS DOUBLE) / total), 6) AS DECIMAL(20,6))) AS DOUBLE) AS logprob,
        |  CAST(SUM(dc * CAST(round(ln(CAST(c AS DOUBLE) / total), 6) AS DECIMAL(20,6))) AS DOUBLE)
        |    / CAST(SUM(dc) AS BIGINT) AS avg_logprob
        |FROM dtc JOIN g USING (tok) CROSS JOIN n
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val toks = Tables.parallelize(Tables.load(s, dir, "documents")
          .select("doc_id", "text"))
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      val dtc = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("dc"))
      // global counts DERIVE from the per-doc counts — one tokenize,
      // one explode; the second aggregation runs over |doc x vocab|
      // rows, not raw tokens (sums are identical)
      val g = dtc.groupBy("tok").agg(sum(col("dc")).as("c"))
      val n = g.agg(sum(col("c")).as("total"))
      val term = round(log(col("c").cast("double") / col("total")), 6)
        .cast(DecimalType(20, 6))
      dtc.join(broadcast(g), "tok").crossJoin(broadcast(n))
        .groupBy("doc_id")
        .agg(sum(col("dc")).as("n_tokens"),
          sum(col("dc") * term).cast("double").as("logprob"))
        .select(col("doc_id"), col("n_tokens"), col("logprob"),
          (col("logprob") / col("n_tokens")).as("avg_logprob"))
        .orderBy("doc_id")
    },

    // Perplexity-band census — the curation rollup over the unigram
    // scores: how much of the corpus (docs AND token mass) sits in
    // each quality band, with band extremes for spot-checking. Bands
    // are FIXED-WIDTH bins of avg log-prob (0.25 nats), not deciles:
    // ntile() is an unpartitioned window — a single-partition global
    // sort at 100 TB — where value bucketing is pure map-side work on
    // the per-doc scores (the only exchange below is the 10-ish-row
    // band aggregate). Same per-doc score derivation as
    // unigram_logprob (one tokenize, vocab-broadcast join); floor and
    // the /0.25 scaling are exact IEEE ops on identical inputs, so
    // band assignment is cross-engine deterministic.
    Q("perplexity_buckets",
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |dtc AS (SELECT doc_id, tok, COUNT(*) AS dc FROM toks GROUP BY 1, 2),
        |g AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY 1),
        |n AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM g),
        |scored AS (
        |  SELECT doc_id, CAST(SUM(dc) AS BIGINT) AS n_tokens,
        |    CAST(SUM(dc * CAST(round(ln(CAST(c AS DOUBLE) / total), 6) AS DECIMAL(20,6))) AS DOUBLE)
        |      / CAST(SUM(dc) AS BIGINT) AS alp
        |  FROM dtc JOIN g USING (tok) CROSS JOIN n GROUP BY doc_id)
        |SELECT CAST(floor(alp / 0.25) AS BIGINT) AS band, COUNT(*) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
        |  MIN(alp) AS min_alp, MAX(alp) AS max_alp
        |FROM scored GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val toks = Tables.parallelize(Tables.load(s, dir, "documents")
          .select("doc_id", "text"))
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      val dtc = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("dc"))
      val g = dtc.groupBy("tok").agg(sum(col("dc")).as("c"))
      val n = g.agg(sum(col("c")).as("total"))
      val term = round(log(col("c").cast("double") / col("total")), 6)
        .cast(DecimalType(20, 6))
      dtc.join(broadcast(g), "tok").crossJoin(broadcast(n))
        .groupBy("doc_id")
        .agg(sum(col("dc")).as("n_tokens"),
          sum(col("dc") * term).cast("double").as("logprob"))
        .select(col("n_tokens"),
          (col("logprob") / col("n_tokens")).as("alp"))
        .groupBy(floor(col("alp") / 0.25).cast("long").as("band"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens"),
          min(col("alp")).as("min_alp"),
          max(col("alp")).as("max_alp"))
        .orderBy("band")
    },

    // TF-IDF top terms per document — the classic salient-term
    // extraction. All three statistics (tf, df, N) derive from ONE
    // tokenize/explode: df and N aggregate the per-doc counts, ride
    // back via a vocab-sized broadcast join, and the per-doc top-3 is
    // a window over |doc x vocab| rows with a total (score DESC, term)
    // order.
    Q("tfidf_top_terms",
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |dtc AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        |dft AS (SELECT tok, COUNT(*) AS df FROM dtc GROUP BY 1),
        |nd AS (SELECT COUNT(*) AS n_docs FROM documents)
        |SELECT doc_id, rnk, term, tf, df, tfidf FROM (
        |  SELECT doc_id, tok AS term, CAST(tf AS BIGINT) AS tf,
        |    CAST(df AS BIGINT) AS df,
        |    round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) DESC, tok) AS rnk
        |  FROM dtc JOIN dft USING (tok) CROSS JOIN nd)
        |WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val dtc = Tables.parallelize(Tables.load(s, dir, "documents")
          .select("doc_id", "text"))
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      val dft = dtc.groupBy("tok").agg(count(lit(1)).as("df"))
      val nd = Tables.load(s, dir, "documents").agg(count(lit(1)).as("n_docs"))
      val tfidf = round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6)
      val w = Window.partitionBy("doc_id").orderBy(tfidf.desc, col("tok"))
      dtc.join(broadcast(dft), "tok").crossJoin(broadcast(nd))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("doc_id"), col("rnk"), col("tok").as("term"),
          col("tf"), col("df"), tfidf.as("tfidf"))
        .orderBy("doc_id", "rnk")
    },

    // BM25 SCORING (Robertson et al., the Lucene/Okapi form with the
    // +1 idf floor) — the lexical retrieval scorer beside tf-idf's
    // census: every document scored against a fixed query, with the
    // k1 saturation and b length normalization tf-idf lacks. All
    // corpus statistics (N, total length for avgdl, one df per term)
    // reduce to ONE census row that broadcasts, so scoring is pure
    // scan-side math — the per-term contributions add in literal
    // WRITTEN order on both engines, making the double sum
    // deterministic without decimal plumbing. 'quux' never occurs:
    // its df=0 idf path and tf=0 zero contribution are exercised on
    // every row.
    Q("bm25_score", {
      val (k1, b) = (Bm25K1, Bm25B)
      val dfs = Bm25Query.map(t =>
        s"SUM(CASE WHEN len(list_filter(string_split(text, ' '), t -> t = '$t')) > 0 THEN 1 ELSE 0 END) AS df_$t").mkString(",\n  |    ")
      val terms = Bm25Query.map(t =>
        s"""(ln((CAST(n_docs AS DOUBLE) - df_$t + 0.5) / (df_$t + 0.5) + 1.0)
           |     * (tf_$t * ($k1 + 1.0))
           |     / (tf_$t + $k1 * (1.0 - $b + $b * dl / (CAST(tot_dl AS DOUBLE) / n_docs))))""".stripMargin).mkString(" +\n  ")
      val tfs = Bm25Query.map(t =>
        s"len(list_filter(string_split(text, ' '), t -> t = '$t')) AS tf_$t").mkString(",\n  |    ")
      s"""WITH stats AS (SELECT COUNT(*) AS n_docs,
         |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tot_dl,
         |    $dfs
         |  FROM documents),
         |d AS (SELECT doc_id, len(string_split(text, ' ')) AS dl,
         |    $tfs
         |  FROM documents)
         |SELECT doc_id, dl, ${Bm25Query.map(t => s"tf_$t").mkString(", ")},
         |  round($terms, 6) AS bm25
         |FROM d CROSS JOIN stats ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      val a = split(col("text"), " ")
      def tf(t: String) = size(filter(a, x => x === t))
      val statCols = Seq(count(lit(1)).as("n_docs"),
        sum(size(a)).as("tot_dl")) ++
        Bm25Query.map(t => sum(when(tf(t) > 0, 1).otherwise(0)).as(s"df_$t"))
      val stats = Tables.load(s, dir, "documents")
        .agg(statCols.head, statCols.tail: _*)
      val d = Tables.parallelize(
          Tables.load(s, dir, "documents").select("doc_id", "text"))
        .select(Seq(col("doc_id"), size(a).as("dl")) ++
          Bm25Query.map(t => tf(t).as(s"tf_$t")): _*)
      val avgdl = col("tot_dl").cast("double") / col("n_docs")
      // per-term contributions combined in the SAME written order as
      // the oracle — the double sum is order-deterministic
      val score = Bm25Query.map { t =>
        val idf = log((col("n_docs").cast("double") - col(s"df_$t") + 0.5) /
          (col(s"df_$t") + 0.5) + 1.0)
        idf * (col(s"tf_$t") * (Bm25K1 + 1.0)) /
          (col(s"tf_$t") +
            lit(Bm25K1) * (lit(1.0 - Bm25B) + lit(Bm25B) * col("dl") / avgdl))
      }.reduce(_ + _)
      d.crossJoin(broadcast(stats))
        .select(Seq(col("doc_id"), col("dl")) ++
          Bm25Query.map(t => col(s"tf_$t")) ++
          Seq(round(score, 6).as("bm25")): _*)
        .orderBy("doc_id")
    },

    // DIRICHLET QUERY-LIKELIHOOD SCORING (Zhai & Lafferty '01) — the
    // language-model retrieval scorer beside bm25_score's
    // tf-saturation form, same fixed query and census discipline:
    // score(q,d) = Σ_t ln((tf_td + μ·ctf_t/|C|) / (dl + μ)), μ = 2000.
    // Collection statistics here are collection TERM frequencies
    // (ctf), not document frequencies — the one corpus census row
    // broadcasts and scoring is scan-side math, per-term logs added
    // in literal written order (order-deterministic double, no
    // decimal plumbing). 'quux' (ctf = 0) exercises the zero-mass
    // convention: its smoothed probability is 0 ⇒ ln 0 = -inf, so the
    // standard practice of restricting to seen-in-collection terms is
    // applied IN the scorer — a zero-ctf term contributes 0,
    // identically in both engines.
    Q("lmdir_score", {
      val mu = LmDirMu
      val ctfs = Bm25Query.map(t =>
        s"CAST(SUM(len(list_filter(string_split(text, ' '), t -> t = '$t'))) AS BIGINT) AS ctf_$t").mkString(",\n  |    ")
      val tfs = Bm25Query.map(t =>
        s"len(list_filter(string_split(text, ' '), t -> t = '$t')) AS tf_$t").mkString(",\n  |    ")
      val terms = Bm25Query.map(t =>
        s"""(CASE WHEN ctf_$t > 0 THEN ln((tf_$t + $mu * (CAST(ctf_$t AS DOUBLE) / tot_dl))
           |     / (dl + $mu)) ELSE 0.0 END)""".stripMargin).mkString(" +\n  ")
      s"""WITH stats AS (SELECT COUNT(*) AS n_docs,
         |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tot_dl,
         |    $ctfs
         |  FROM documents),
         |d AS (SELECT doc_id, len(string_split(text, ' ')) AS dl,
         |    $tfs
         |  FROM documents)
         |SELECT doc_id, dl, ${Bm25Query.map(t => s"tf_$t").mkString(", ")},
         |  round($terms, 6) AS lmdir
         |FROM d CROSS JOIN stats ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      val a = split(col("text"), " ")
      def tf(t: String) = size(filter(a, x => x === t))
      val statCols = Seq(count(lit(1)).as("n_docs"),
        sum(size(a)).cast("long").as("tot_dl")) ++
        Bm25Query.map(t => sum(tf(t)).cast("long").as(s"ctf_$t"))
      val stats = Tables.load(s, dir, "documents")
        .agg(statCols.head, statCols.tail: _*)
      val d = Tables.parallelize(
          Tables.load(s, dir, "documents").select("doc_id", "text"))
        .select(Seq(col("doc_id"), size(a).as("dl")) ++
          Bm25Query.map(t => tf(t).as(s"tf_$t")): _*)
      // per-term logs combined in the SAME written order as the oracle
      val score = Bm25Query.map { t =>
        when(col(s"ctf_$t") > 0,
          log((col(s"tf_$t") + lit(LmDirMu) *
              (col(s"ctf_$t").cast("double") / col("tot_dl")))
            / (col("dl") + lit(LmDirMu)))).otherwise(lit(0.0))
      }.reduce(_ + _)
      d.crossJoin(broadcast(stats))
        .select(Seq(col("doc_id"), col("dl")) ++
          Bm25Query.map(t => col(s"tf_$t")) ++
          Seq(round(score, 6).as("lmdir")): _*)
        .orderBy("doc_id")
    },

    // corpus dataset-card: per (lang, source) stratum — doc count,
    // token totals, vocabulary size. The two COUNT(DISTINCT)s over one
    // explode are the expensive part; Spark plans them as one expand +
    // partial aggregate (each input row contributes to both distinct
    // streams map-side) rather than two scans.
    Q("corpus_stats",
      """WITH toks AS (SELECT lang, source, doc_id,
        |    unnest(string_split(text, ' ')) AS tok FROM documents)
        |SELECT lang, source, COUNT(DISTINCT doc_id) AS n_docs,
        |  COUNT(*) AS total_tokens, COUNT(DISTINCT tok) AS vocab_size
        |FROM toks GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      Tables.parallelize(Tables.load(s, dir, "documents")
          .select("lang", "source", "doc_id", "text"))
        .select(col("lang"), col("source"), col("doc_id"),
          explode(split(col("text"), " ")).as("tok"))
        .groupBy("lang", "source")
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("total_tokens"),
          countDistinct(col("tok")).as("vocab_size"))
        .orderBy("lang", "source")
    },

    // Two-sample Kolmogorov-Smirnov drift audit between every source
    // pair over the document token-length distribution — the "did
    // this crawl's length profile shift" check a corpus refresh runs
    // before mixing. Shape: ONE scan reduces the corpus to a
    // (source, length) census; everything after — the source-pair
    // cross, the per-pair union support, the ECDF cumsum window, the
    // max-gap aggregate — runs on census-sized frames (|sources| x
    // |distinct lengths|), so at 100 TB the cost is the scan, full
    // stop. The window partitions by PAIR (not single-partition), and
    // the KS max is taken over the union support, where ECDF step
    // functions attain their extrema. Oracle recomputes F via
    // correlated counts — slower but independently, provably the same
    // statistic.
    Q("ks_drift",
      """WITH t AS (SELECT source, len(string_split(text, ' ')) AS x FROM documents),
        |tot AS (SELECT source, COUNT(*) AS n FROM t GROUP BY source),
        |p AS (SELECT a.source AS s1, b.source AS s2, a.n AS n_1, b.n AS n_2
        |      FROM tot a JOIN tot b ON a.source < b.source),
        |u AS (SELECT DISTINCT s1, s2, n_1, n_2, x FROM p
        |      JOIN (SELECT DISTINCT source, x FROM t) d ON d.source IN (s1, s2))
        |SELECT s1 AS source_1, s2 AS source_2, n_1, n_2,
        |  round(MAX(abs(
        |    (SELECT COUNT(*) FROM t WHERE t.source = u.s1 AND t.x <= u.x) * 1.0 / n_1 -
        |    (SELECT COUNT(*) FROM t WHERE t.source = u.s2 AND t.x <= u.x) * 1.0 / n_2)), 6) AS ks_stat
        |FROM u GROUP BY 1, 2, 3, 4 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      val t = Tables.load(s, dir, "documents")
        .select(col("source"), size(split(col("text"), " ")).as("x"))
      val c = t.groupBy("source", "x").agg(count(lit(1)).as("cnt"))
      val tot = t.groupBy("source").agg(count(lit(1)).as("n"))
      val pairs = tot.select(col("source").as("s1"), col("n").as("n_1"))
        .join(tot.select(col("source").as("s2"), col("n").as("n_2")),
          col("s1") < col("s2"))
      // union support with per-source count deltas: two equi-joins +
      // union, then one cumsum window per pair — no as-of lookup
      val d1 = pairs.join(c, col("source") === col("s1"))
        .select(col("s1"), col("s2"), col("n_1"), col("n_2"), col("x"),
          col("cnt").as("d1"), lit(0L).as("d2"))
      val d2 = pairs.join(c, col("source") === col("s2"))
        .select(col("s1"), col("s2"), col("n_1"), col("n_2"), col("x"),
          lit(0L).as("d1"), col("cnt").as("d2"))
      val w = Window.partitionBy("s1", "s2").orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      d1.unionAll(d2)
        .groupBy("s1", "s2", "n_1", "n_2", "x")
        .agg(sum(col("d1")).as("d1"), sum(col("d2")).as("d2"))
        .withColumn("gap", abs(
          sum(col("d1")).over(w) * lit(1.0) / col("n_1")
            - sum(col("d2")).over(w) * lit(1.0) / col("n_2")))
        .groupBy(col("s1").as("source_1"), col("s2").as("source_2"),
          col("n_1"), col("n_2"))
        .agg(round(max(col("gap")), 6).as("ks_stat"))
        .orderBy("source_1", "source_2")
    },

    // JENSEN-SHANNON DIVERGENCE of each source's token distribution
    // against the REST of the corpus (log2: JSD in [0,1]) — the
    // distributional sibling of ks_drift (which compares scalar
    // lengths). Algebraic scale trick: tokens ABSENT from the source
    // contribute exactly q·log2(2)=q on the rest side, so their whole
    // contribution collapses to one exact-integer mass term Q_miss =
    // (N - Ns - R)/(N - Ns) — only the source's OWN vocabulary rows
    // are ever joined, never the |vocab| x |sources| grid. Per-token
    // terms are 9-dp-quantized then decimal-summed (order-free);
    // sources covering the whole corpus (no rest) yield NULL.
    Q("jsd_sources",
      """WITH tc AS (SELECT source, tok, COUNT(*) AS c FROM
        |    (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY 1, 2),
        |ct AS (SELECT tok, CAST(SUM(c) AS BIGINT) AS ctot FROM tc GROUP BY 1),
        |st AS (SELECT source, CAST(SUM(c) AS BIGINT) AS ns FROM tc GROUP BY 1),
        |nn AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM tc),
        |tm AS (SELECT tc.source,
        |    CAST(c AS DOUBLE) / ns AS p,
        |    CAST(ctot - c AS DOUBLE) / (n - ns) AS q,
        |    CAST(ctot - c AS BIGINT) AS rest_c
        |  FROM tc JOIN ct USING (tok) JOIN st ON tc.source = st.source
        |  CROSS JOIN nn WHERE n > ns),
        |terms AS (SELECT source,
        |    CAST(round(0.5 * (p * log2(2.0 * p / (p + q))
        |      + CASE WHEN rest_c > 0 THEN q * log2(2.0 * q / (p + q)) ELSE 0.0 END), 9)
        |      AS DECIMAL(18,9)) AS t,
        |    rest_c
        |  FROM tm),
        |agg AS (SELECT source, CAST(SUM(t) AS DECIMAL(28,9)) AS shared,
        |    CAST(SUM(rest_c) AS BIGINT) AS r FROM terms GROUP BY 1)
        |SELECT st.source, st.ns AS n_tokens,
        |  CASE WHEN nn.n > st.ns
        |    THEN round(CAST(agg.shared AS DOUBLE)
        |      + round(0.5 * CAST(nn.n - st.ns - agg.r AS DOUBLE) / (nn.n - st.ns), 9), 6)
        |  END AS jsd
        |FROM st JOIN agg ON st.source = agg.source CROSS JOIN nn
        |ORDER BY st.source""".stripMargin) { (s, dir) =>
      val tc = Tables.load(s, dir, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("source", "tok").agg(count(lit(1)).as("c"))
      val ct = tc.groupBy("tok").agg(sum(col("c")).cast("long").as("ctot"))
      val st = tc.groupBy("source").agg(sum(col("c")).cast("long").as("ns"))
      val nn = tc.agg(sum(col("c")).cast("long").as("n"))
      val p = col("c").cast("double") / col("ns")
      val q = (col("ctot") - col("c")).cast("double") / (col("n") - col("ns"))
      val tm = tc.join(ct, "tok").join(broadcast(st), "source")
        .crossJoin(broadcast(nn)).filter(col("n") > col("ns"))
        .select(col("source"),
          round(lit(0.5) * (p * log2(lit(2.0) * p / (p + q))
            + when(col("ctot") - col("c") > 0,
                q * log2(lit(2.0) * q / (p + q))).otherwise(0.0)), 9)
            .cast(DecimalType(18, 9)).as("t"),
          (col("ctot") - col("c")).cast("long").as("rest_c"))
      val agg = tm.groupBy("source")
        .agg(sum(col("t")).cast(DecimalType(28, 9)).as("shared"),
          sum(col("rest_c")).cast("long").as("r"))
      st.join(agg, "source").crossJoin(broadcast(nn))
        .select(col("source"), col("ns").as("n_tokens"),
          when(col("n") > col("ns"),
            round(col("shared").cast("double")
              + round(lit(0.5) * (col("n") - col("ns") - col("r")).cast("double")
                / (col("n") - col("ns")), 9), 6)).as("jsd"))
        .orderBy("source")
    },

    // quality-filter pipeline: per-doc keep/drop decision with
    // per-reason flags (the C4-style audit trail — a production
    // pipeline keeps WHY a doc was dropped, not just the survivors).
    // One explode-aggregate provides the token stats; the char-class
    // ratios are narrow per-row expressions on the same join row.
    Q("filter_flags",
      """WITH uc AS (SELECT doc_id, tok, COUNT(*) AS c
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY 1, 2),
        |us AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
        |         CAST(MAX(c) AS BIGINT) AS top_tok FROM uc GROUP BY doc_id),
        |f AS (SELECT d.doc_id AS doc_id, n_tokens,
        |    n_tokens < 40 AS too_short,
        |    CAST(top_tok AS DOUBLE) / n_tokens > 0.12 AS too_repetitive,
        |    len(regexp_extract_all(text, '[0-9]')) * 1.0 / length(text) > 0.05 AS digit_heavy
        |  FROM documents d JOIN us ON d.doc_id = us.doc_id)
        |SELECT doc_id, n_tokens, too_short, too_repetitive, digit_heavy,
        |  NOT (too_short OR too_repetitive OR digit_heavy) AS kept
        |FROM f ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val base = Tables.parallelize(Tables.load(s, dir, "documents")
        .select("doc_id", "text"))
      val us = base
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("doc_id", "tok").count()
        .groupBy("doc_id")
        .agg(sum("count").as("n_tokens"), max("count").as("top_tok"))
      val digitRatio =
        size(expr("regexp_extract_all(text, '[0-9]', 0)")) * lit(1.0) / length(col("text"))
      base.join(us, "doc_id")
        .select(col("doc_id"), col("n_tokens"),
          (col("n_tokens") < 40).as("too_short"),
          (col("top_tok").cast("double") / col("n_tokens") > 0.12).as("too_repetitive"),
          (digitRatio > 0.05).as("digit_heavy"))
        .withColumn("kept",
          !(col("too_short") || col("too_repetitive") || col("digit_heavy")))
        .orderBy("doc_id")
    },

    // multimodal metadata path: binary content column + envelope fields
    // + STUB-decoded dimensions, all engine-portable
    Q("multimodal_meta",
      s"""SELECT doc_id AS media_id,
         |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         |  length(text) AS n_bytes, md5(text) AS content_md5,
         |  64 + (${duckH32("text")} % 960) AS width,
         |  64 + (${duckH32(1, "text")} % 960) AS height
         |FROM documents ORDER BY media_id""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id").as("media_id"),
          element_at(array(lit("image"), lit("audio"), lit("video")),
            (col("doc_id") % 3 + 1).cast("int")).as("kind"),
          length(col("text").cast("binary")).as("n_bytes"),
          md5(col("text").cast("binary")).as("content_md5"),
          (lit(64) + h32(col("text")) % 960).as("width"),
          (lit(64) + h32(1, col("text")) % 960).as("height"))
        .orderBy("media_id")
    },

    // full multimodal pipeline: typed Dataset[MediaFile] ->
    // mapPartitions feature extraction (the mapInPandas analog).
    // The partition-batched path is not SQL, but the STUB decode is
    // deterministic on md5(content) and content is the utf-8 text
    // bytes — so the oracle RE-DERIVES the decode rule from DuckDB's
    // own md5(): width = 64 + value of hex digits 1-3 (byte0<<4 |
    // byte1>>4), height = 64 + digits 5-7, video frames = 1 +
    // (digits 9-12) % 240. A full value/hash check of the whole
    // mapPartitions path, not just a rows count.
    Q("multimodal_features", {
      def hv(i: Int) = s"(strpos('0123456789abcdef', substr(md5(text), $i, 1)) - 1)"
      def hex3(i: Int) = s"(${hv(i)} * 256 + ${hv(i + 1)} * 16 + ${hv(i + 2)})"
      def hex4(i: Int) =
        s"(${hv(i)} * 4096 + ${hv(i + 1)} * 256 + ${hv(i + 2)} * 16 + ${hv(i + 3)})"
      s"""SELECT doc_id AS media_id,
         |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         |  CAST(strlen(text) AS BIGINT) AS n_bytes,
         |  md5(text) AS content_md5,
         |  CAST(64 + ${hex3(1)} AS INTEGER) AS width,
         |  CAST(64 + ${hex3(5)} AS INTEGER) AS height,
         |  CAST(CASE WHEN doc_id % 3 = 2 THEN 1 + ${hex4(9)} % 240 ELSE 1 END AS INTEGER) AS n_frames
         |FROM documents ORDER BY media_id""".stripMargin
    }) { (s, dir) =>
      val media = Multimodal.mediaFromDocuments(Tables.load(s, dir, "documents"))
      Multimodal.extractFeatures(media).toDF().orderBy("media_id")
    },

    // REAL container headers: build spec-conforming PNG/JPEG/WAV/APNG
    // containers around the payload, then PARSE the binary headers
    // back (PNG chunk walk + CRC, JPEG SOF marker scan, RIFF walk).
    // The oracle recomputes every field from first principles — the
    // h32 dimension rules, per-format header overhead for n_bytes,
    // WAV sample frames = payload bytes (mono 8-bit) — so the check
    // covers the full build->parse round trip byte-exactly. PNG/APNG
    // n_bytes now includes the REAL zlib scanline stream: m = h·(w+1)
    // filtered raster bytes wrapped in stored blocks, so the stream
    // length is the closed form 2 + 5·ceil(m/65535) + m + 4 (adler)
    // the oracle writes out — a compressed stream would be opaque to
    // SQL, which is exactly why the builder uses stored blocks.
    Q("multimodal_decode",
      s"""WITH d AS (SELECT doc_id, text,
         |    16 + ${duckH32("text")} % 240 AS w,
         |    16 + ${duckH32(1, "text")} % 240 AS h
         |  FROM documents),
         |z AS (SELECT doc_id, text, w, h,
         |    2 + 5 * CAST(ceil(h * (w + 1) / 65535.0) AS BIGINT)
         |      + CAST(h AS BIGINT) * (w + 1) + 4 AS zlen
         |  FROM d)
         |SELECT doc_id AS media_id,
         |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         |  CASE WHEN doc_id % 3 = 1 THEN 'wav' WHEN doc_id % 3 = 2 THEN 'apng'
         |       WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS container,
         |  CAST(CASE WHEN doc_id % 3 = 1 THEN 44 + strlen(text)
         |            WHEN doc_id % 3 = 2 THEN 77 + zlen
         |            WHEN doc_id % 2 = 0 THEN 57 + zlen
         |            ELSE 35 + 4 * CAST(ceil(strlen(text) / 60000.0) AS BIGINT) + strlen(text)
         |       END AS BIGINT) AS n_bytes,
         |  CAST(CASE WHEN doc_id % 3 = 1 THEN 0 ELSE w END AS INTEGER) AS width,
         |  CAST(CASE WHEN doc_id % 3 = 1 THEN 0 ELSE h END AS INTEGER) AS height,
         |  CAST(CASE WHEN doc_id % 3 = 0 THEN 1
         |            WHEN doc_id % 3 = 1 THEN strlen(text)
         |            ELSE 1 + ${duckH32(2, "text")} % 240 END AS INTEGER) AS n_frames
         |FROM z ORDER BY media_id""".stripMargin) { (s, dir) =>
      Multimodal.decodeContainers(
          Multimodal.mediaContainers(Tables.load(s, dir, "documents")))
        .toDF().orderBy("media_id")
    },

    // PIXEL DECODE — the end of the multimodal stub story for PNG:
    // the PNG/APNG containers carry a genuine zlib scanline stream
    // (stored-block deflate + real Adler-32) of the deterministic
    // pixel field p(i) = (seed + 31·i) mod 256, filtered per-row with
    // the PNG spec's None/Sub/Up filters. The ENGINE decodes it the
    // way any PNG reader would — chunk walk + CRC, IDAT join,
    // java.util.zip.Inflater, filter inversion — and folds pixel
    // statistics; the ORACLE rebuilds every pixel from (seed, i) in
    // SQL and aggregates the same statistics. px_wsum = Σ(i+1)·p(i)
    // pins value AND raster position of every pixel, so a single
    // mis-inverted filter byte or swapped scanline diverges the hash.
    // Scale: decode is narrow/map-side (mapPartitions over the bytes,
    // no shuffle); the pixel mass never leaves the executor — only
    // the fixed-width stats row does.
    Q("png_pixel_stats",
      s"""WITH md AS (SELECT doc_id AS media_id,
         |    CASE WHEN doc_id % 3 = 2 THEN 'apng' ELSE 'png' END AS container,
         |    16 + ${duckH32("text")} % 240 AS w,
         |    16 + ${duckH32(1, "text")} % 240 AS h,
         |    ${duckH32("text")} % 256 AS seed
         |  FROM documents WHERE doc_id % 6 = 0 OR doc_id % 3 = 2),
         |px AS (SELECT media_id, container, w, h,
         |    (seed + 31 * i) % 256 AS p, i
         |  FROM md, unnest(generate_series(0, CAST(w AS BIGINT) * h - 1)) AS t(i))
         |SELECT media_id, container,
         |  CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
         |  CAST(COUNT(*) AS BIGINT) AS n_pixels,
         |  CAST(SUM(p) AS BIGINT) AS px_sum,
         |  CAST(SUM((i + 1) * p) AS BIGINT) AS px_wsum,
         |  CAST(MIN(p) AS INTEGER) AS px_min,
         |  CAST(MAX(p) AS INTEGER) AS px_max,
         |  round(CAST(SUM(p) AS DOUBLE) / COUNT(*), 6) AS px_mean
         |FROM px GROUP BY 1, 2, 3, 4 ORDER BY media_id""".stripMargin) { (s, dir) =>
      val pngDocs = Tables.parallelizeByRange(Tables.load(s, dir, "documents")
        .filter(col("doc_id") % 6 === 0 || col("doc_id") % 3 === 2),
        col("doc_id"))
      Multimodal.decodePixelStats(Multimodal.mediaContainers(pngDocs))
        .toDF()
        .withColumn("px_mean",
          round(col("px_sum").cast("double") / col("n_pixels"), 6))
        .orderBy("media_id")
    },

    // REAL JPEG ENTROPY DECODE — the last synthetic payload made
    // real: spec-conforming baseline JPEGs (Annex K quant + Huffman
    // tables, genuine entropy-coded scan with DC prediction, EXTEND,
    // EOB, 0xFF stuffing) built from one even value per 8×8 block —
    // the content class the DCT path represents LOSSLESSLY (flat
    // block → DC-only, DC = 8(v−128) divisible by the quantizer 16),
    // so the full Huffman-encode → Huffman-decode → dequant → IDCT
    // round trip is exact and the oracle predicts every decoded pixel
    // from the block rule. The decoder is general baseline (any DC
    // category, full AC run/size alphabet) — flatness is a property
    // of the streams, not a decoder assumption. The oracle explodes
    // BLOCKS (≤961/image), using the closed-form positional sum per
    // block; the engine folds over the actual decoded raster — a
    // one-bit Huffman error moves a block's DC and diverges the
    // hash. Narrow/map-side like the PNG path.
    Q("jpeg_pixel_stats",
      s"""WITH md AS (SELECT doc_id AS media_id,
         |    8 * (2 + ${duckH32("text")} % 30) AS w,
         |    8 * (2 + ${duckH32(1, "text")} % 30) AS h,
         |    ${duckH32("text")} % 128 AS seed
         |  FROM documents WHERE doc_id % 6 = 3),
         |b AS (SELECT media_id, w, h, seed, w // 8 AS bw, j
         |  FROM md, unnest(generate_series(0,
         |    (CAST(w AS BIGINT) // 8) * (h // 8) - 1)) AS t(j)),
         |v AS (SELECT media_id, w, h, j % bw AS bx, j // bw AS by,
         |    2 * ((seed + 31 * j) % 128) AS v
         |  FROM b)
         |SELECT media_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
         |  CAST(CAST(w AS BIGINT) * h AS BIGINT) AS n_pixels,
         |  CAST(SUM(64 * v) AS BIGINT) AS px_sum,
         |  CAST(SUM(v * (64 * (8 * by * w + 8 * bx + 1) + 224 * (w + 1))) AS BIGINT) AS px_wsum,
         |  CAST(MIN(v) AS INTEGER) AS px_min,
         |  CAST(MAX(v) AS INTEGER) AS px_max
         |FROM v GROUP BY 1, 2, 3, 4 ORDER BY media_id""".stripMargin) { (s, dir) =>
      val jpegDocs = Tables.parallelizeByRange(Tables.load(s, dir, "documents")
        .filter(col("doc_id") % 6 === 3), col("doc_id"))
      Multimodal.decodeJpegStats(Multimodal.jpegPixelMedia(jpegDocs))
        .toDF().drop("container")
        .orderBy("media_id")
    },

    // JPEG AC-COEFFICIENT DECODE — closes the one untested seam in
    // the entropy layer: jpeg_pixel_stats' flat blocks are DC+EOB
    // only, so the AC run/size alphabet (nonzero runs, ZRL, AC
    // EXTEND) was exercised only by unit properties. These streams
    // put THREE quantized coefficients in every block (DC + zigzag 14
    // + zigzag 39 — runs of 13 and 8 zeros and one ZRL per block,
    // negative levels on both ACs), chosen so dequant+IDCT stays
    // EXACT integer arithmetic (basis values ±√2/2, levels sized so
    // every pixel term is an integer — see Multimodal.jpegAcMedia).
    // The oracle evaluates the closed-form pixel
    // clamp(v + 3·l1·sx + 17·m·sx·sy) per raster position; the engine
    // only gets there through the genuine Huffman scan, so one
    // misread run length, one wrong EXTEND sign, or one swallowed ZRL
    // moves px_wsum and diverges the hash. Narrow/map-side decode
    // like the other media paths.
    Q("jpeg_ac_stats",
      s"""WITH md AS (SELECT doc_id AS media_id,
         |    8 * (2 + ${duckH32("text")} % 14) AS w,
         |    8 * (2 + ${duckH32(1, "text")} % 14) AS h,
         |    ${duckH32("text")} % 128 AS seed
         |  FROM documents WHERE doc_id % 6 = 5),
         |px AS (SELECT media_id, w, h, seed, i,
         |    i % w AS x, i // w AS y
         |  FROM md, unnest(generate_series(0, CAST(w AS BIGINT) * h - 1)) AS t(i)),
         |c AS (SELECT media_id, w, h, i,
         |    (y // 8) * (w // 8) + (x // 8) AS b,
         |    CASE WHEN (x % 8) % 4 IN (0, 3) THEN 1 ELSE -1 END AS sx,
         |    CASE WHEN (y % 8) % 4 IN (0, 3) THEN 1 ELSE -1 END AS sy,
         |    seed FROM px),
         |v AS (SELECT media_id, w, h, i, LEAST(255, GREATEST(0,
         |    2 * ((seed + 31 * b) % 128)
         |    + 3 * (1 + (seed + 7 * b) % 4)
         |        * (CASE WHEN (seed + 3 * b) % 2 = 0 THEN 1 ELSE -1 END) * sx
         |    + 17 * (1 + (seed + 5 * b) % 3)
         |        * (CASE WHEN (seed + 11 * b) % 2 = 0 THEN 1 ELSE -1 END)
         |        * sx * sy)) AS p
         |  FROM c)
         |SELECT media_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
         |  CAST(COUNT(*) AS BIGINT) AS n_pixels,
         |  CAST(SUM(p) AS BIGINT) AS px_sum,
         |  CAST(SUM((i + 1) * p) AS BIGINT) AS px_wsum,
         |  CAST(MIN(p) AS INTEGER) AS px_min,
         |  CAST(MAX(p) AS INTEGER) AS px_max
         |FROM v GROUP BY 1, 2, 3 ORDER BY media_id""".stripMargin) { (s, dir) =>
      val acDocs = Tables.parallelizeByRange(Tables.load(s, dir, "documents")
        .filter(col("doc_id") % 6 === 5), col("doc_id"))
      Multimodal.decodeJpegStats(Multimodal.jpegAcMedia(acDocs))
        .toDF().drop("container")
        .orderBy("media_id")
    },

    // REAL IMAGE RESIZE — 2×2 box-filter (mean-pool) downsample over
    // the DECODED pixel buffer: decode (inflate + defilter into a
    // raster array), then the pooling kernel q(u,v) = ⌊(4 taps)/4⌋ —
    // the genuine resampling pass `resizePlan` only planned. The
    // oracle rebuilds each OUTPUT pixel from the pixel rule's four tap
    // indices in SQL; pooled_wsum pins every output pixel's value and
    // position, so a tap offset, a swapped raster order, or a filter
    // inversion bug upstream all diverge the hash. Odd trailing
    // rows/cols drop (floor dims) in both engines. Scale: decode+pool
    // is narrow (mapPartitions where the bytes live); only the
    // fixed-width stats row leaves the executor.
    Q("png_downsample_stats",
      s"""WITH md AS (SELECT doc_id AS media_id,
         |    16 + ${duckH32("text")} % 240 AS w,
         |    16 + ${duckH32(1, "text")} % 240 AS h,
         |    ${duckH32("text")} % 256 AS seed
         |  FROM documents WHERE doc_id % 6 = 0 OR doc_id % 3 = 2),
         |op AS (SELECT media_id, w, h, w // 2 AS ow, h // 2 AS oh, seed
         |  FROM md),
         |px AS (SELECT media_id, w, h, ow, oh,
         |    (j // ow) AS v, (j % ow) AS u, seed, j
         |  FROM op, unnest(generate_series(0, CAST(ow AS BIGINT) * oh - 1)) AS t(j)),
         |q AS (SELECT media_id, w, h, ow, oh, j,
         |    ((seed + 31 * (2*v*w + 2*u)) % 256
         |     + (seed + 31 * (2*v*w + 2*u + 1)) % 256
         |     + (seed + 31 * ((2*v+1)*w + 2*u)) % 256
         |     + (seed + 31 * ((2*v+1)*w + 2*u + 1)) % 256) // 4 AS q
         |  FROM px)
         |SELECT media_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
         |  CAST(ow AS INTEGER) AS out_w, CAST(oh AS INTEGER) AS out_h,
         |  CAST(SUM(q) AS BIGINT) AS pooled_sum,
         |  CAST(SUM((j + 1) * q) AS BIGINT) AS pooled_wsum
         |FROM q GROUP BY 1, 2, 3, 4, 5 ORDER BY media_id""".stripMargin) { (s, dir) =>
      val pngDocs = Tables.parallelizeByRange(Tables.load(s, dir, "documents")
        .filter(col("doc_id") % 6 === 0 || col("doc_id") % 3 === 2),
        col("doc_id"))
      Multimodal.downsample2x2Stats(Multimodal.mediaContainers(pngDocs))
        .toDF().orderBy("media_id")
    },

    // AUDIO FRAME ENERGY — the first real signal-processing pass over
    // the audio modality: the WAV containers multimodal_decode builds
    // store the payload as mono 8-bit PCM (data chunk == the utf-8
    // text bytes, `Multimodal.mediaContainers`), so per-frame energy
    // over those samples is REAL feature extraction, not a stub: 200-
    // sample frames, per-frame mean-square amplitude around the
    // unsigned-PCM midpoint (v-128), plus RMS — the voice-activity /
    // silence-trim primitive an audio curation pipeline runs first.
    // Both engines index the CODEPOINT series — DuckDB length()/
    // substr()/ord() and Spark length()/substr()/ascii() are all
    // character-based, so the sample sets agree for ANY corpus text,
    // not just the ASCII fixture (where codepoint == byte == PCM
    // sample; for non-ASCII the codepoint series is a consistent
    // cross-engine proxy for the byte stream). Energy sums are exact
    // integers (deterministic), RMS is one int-derived double. Scan-side explode + one (media, frame)
    // aggregation with map-side partials — the tokenize_explode
    // shape; at 100 TB frames aggregate where the bytes live and
    // only (media_id, frame, ints) move.
    Q("audio_frame_energy",
      """WITH au AS (SELECT doc_id AS media_id, text FROM documents WHERE doc_id % 3 = 1),
        |sm AS (SELECT media_id, (i - 1) // 200 AS frame,
        |         ord(substr(text, CAST(i AS INTEGER), 1)) - 128 AS v
        |       FROM au, unnest(generate_series(1, length(text))) AS t(i))
        |SELECT media_id, CAST(frame AS BIGINT) AS frame,
        |  COUNT(*) AS n_samples,
        |  CAST(SUM(v * v) AS BIGINT) AS energy_sq,
        |  round(sqrt(CAST(SUM(v * v) AS DOUBLE) / COUNT(*)), 6) AS rms
        |FROM sm GROUP BY 1, 2 ORDER BY media_id, frame""".stripMargin) { (s, dir) =>
      val au = Tables.parallelizeByRange(Tables.load(s, dir, "documents")
          .filter(col("doc_id") % 3 === 1)
          .select(col("doc_id").as("media_id"), col("text")),
        col("media_id"))
      au.select(col("media_id"),
          explode(sequence(lit(1), length(col("text")))).as("i"),
          col("text"))
        .select(col("media_id"), expr("(i - 1) div 200").as("frame"),
          (ascii(col("text").substr(col("i"), lit(1))) - 128).as("v"))
        .groupBy("media_id", "frame")
        .agg(count(lit(1)).as("n_samples"), sum(col("v") * col("v")).as("energy_sq"))
        .select(col("media_id"), col("frame"), col("n_samples"), col("energy_sq"),
          round(sqrt(col("energy_sq").cast("double") / col("n_samples")), 6)
            .as("rms"))
        .orderBy("media_id", "frame")
    },

    // PERCEPTUAL FINGERPRINT (average hash) — the image-dedup
    // primitive, over the REAL decoded raster: fold each image onto
    // an 8×8 grid of cell means (cell of (x,y) = (⌊8y/h⌋, ⌊8x/w⌋)),
    // one bit per cell by comparison against the global mean,
    // near-dups land at small Hamming distance. EXACT end-to-end:
    // the comparison is the integer cross product cs·N > S·cn — no
    // doubles anywhere — and the fingerprint is a 64-char bit string
    // both engines assemble in (v,u) order. The oracle rebuilds the
    // grid per-pixel from the field rule; the engine only gets there
    // through inflate + filter inversion, so the fingerprint doubles
    // as one more end-to-end decode pin. At 100 TB the fingerprints
    // feed the same banded dedup machinery as text (64-bit keys,
    // pigeonhole bands for Hamming ≤ k).
    Q("image_ahash",
      s"""WITH md AS (SELECT doc_id AS media_id,
         |    16 + ${duckH32("text")} % 240 AS w,
         |    16 + ${duckH32(1, "text")} % 240 AS h,
         |    ${duckH32("text")} % 256 AS seed
         |  FROM documents WHERE doc_id % 6 = 0 OR doc_id % 3 = 2),
         |px AS (SELECT media_id, w, h,
         |    ((i % w) * 8) // w AS u, ((i // w) * 8) // h AS v,
         |    (seed + 31 * i) % 256 AS p
         |  FROM md, unnest(generate_series(0, CAST(w AS BIGINT) * h - 1)) AS t(i)),
         |cells AS (SELECT media_id, w, h, v, u,
         |    CAST(SUM(p) AS BIGINT) AS cs, CAST(COUNT(*) AS BIGINT) AS cn
         |  FROM px GROUP BY 1, 2, 3, 4, 5),
         |tot AS (SELECT media_id, CAST(SUM(cs) AS BIGINT) AS s FROM cells GROUP BY 1),
         |bits AS (SELECT c.media_id, w, h, v, u,
         |    CASE WHEN cs * (CAST(w AS BIGINT) * h) > s * cn THEN 1 ELSE 0 END AS b
         |  FROM cells c JOIN tot ON c.media_id = tot.media_id)
         |SELECT media_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
         |  string_agg(CAST(b AS VARCHAR), '' ORDER BY v, u) AS ahash,
         |  CAST(SUM(b) AS BIGINT) AS bits_on
         |FROM bits GROUP BY 1, 2, 3 ORDER BY media_id""".stripMargin) { (s, dir) =>
      val pngDocs = Tables.parallelizeByRange(Tables.load(s, dir, "documents")
        .filter(col("doc_id") % 6 === 0 || col("doc_id") % 3 === 2),
        col("doc_id"))
      Multimodal.decodeAHash(Multimodal.mediaContainers(pngDocs))
        .toDF().orderBy("media_id")
    },

    // REAL VIDEO FRAME DECODE — the video modality gains actual frame
    // payloads: spec-valid multi-frame APNG (acTL count == real frame
    // count, fcTL/fdAT with correct sequence numbering, one zlib
    // scanline stream per frame), decoded frame by frame (CRC walk,
    // sequence validation, per-frame inflate + filter inversion) into
    // per-frame pixel sums plus the inter-frame absolute-delta energy
    // — the scene-cut / motion-detection primitive a video curation
    // pass runs first. The oracle rebuilds every frame's pixels from
    // the seed_f = (seed + 7f) mod 256 rule and computes the same
    // deltas — a swapped fdAT, a wrong sequence number, or a filter
    // bug in ANY frame diverges the hash. Narrow map-side decode like
    // the other media paths; clips are a few frames at ≤127 a side so
    // the per-task work is bounded.
    Q("video_frame_diff",
      s"""WITH md AS (SELECT doc_id AS media_id,
         |    16 + ${duckH32("text")} % 112 AS w,
         |    16 + ${duckH32(1, "text")} % 112 AS h,
         |    ${duckH32("text")} % 256 AS seed,
         |    2 + ${duckH32(2, "text")} % 7 AS fr
         |  FROM documents WHERE doc_id % 3 = 2),
         |fx AS (SELECT media_id, w, h, seed, f
         |  FROM md, unnest(generate_series(0, fr - 1)) AS t(f)),
         |px AS (SELECT media_id, w, h, f,
         |    ((seed + 7 * f) % 256 + 31 * i) % 256 AS p,
         |    ((seed + 7 * (f - 1)) % 256 + 31 * i) % 256 AS pp
         |  FROM fx, unnest(generate_series(0, CAST(w AS BIGINT) * h - 1)) AS t(i))
         |SELECT media_id, CAST(f AS INTEGER) AS frame,
         |  CAST(CAST(w AS BIGINT) * h AS BIGINT) AS n_pixels,
         |  CAST(SUM(p) AS BIGINT) AS px_sum,
         |  CASE WHEN f > 0 THEN CAST(SUM(ABS(p - pp)) AS BIGINT) END AS diff_prev
         |FROM px GROUP BY media_id, f, w, h
         |ORDER BY media_id, frame""".stripMargin) { (s, dir) =>
      val vidDocs = Tables.parallelizeByRange(Tables.load(s, dir, "documents")
        .filter(col("doc_id") % 3 === 2), col("doc_id"))
      Multimodal.decodeVideoFrames(Multimodal.videoFrameMedia(vidDocs))
        .toDF().orderBy("media_id", "frame")
    },

    // AUDIO SPECTRAL BINS — DFT power at three fixed frequency bins
    // over the real PCM frames (the spectral sibling of
    // audio_frame_energy — together they are the energy+spectrum
    // front end of an audio curation pass). Determinism follows the
    // suite's literal-table pattern (poissonCdf, planeCoefs): the
    // cos/sin basis is quantized ONCE in Scala to integer micro-units
    // and inlined into BOTH engines, so each bin's power
    // (Σv·c)² + (Σv·s)² is EXACT integer/decimal arithmetic — no
    // cross-engine libm trig in the hot path; the only double is the
    // final log compression. Frames are exactly 200 samples (ragged
    // tail dropped — the basis is per-offset, so a shorter frame
    // would need its own table). Scan-side explode + one broadcast
    // basis join + census aggregation — the tokenize_explode shape.
    Q("audio_spectral_bins", {
      val bins = Seq(1, 4, 16)
      val n = 200
      def q6(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
      val table = for (k <- bins; j <- 0 until n) yield
        (k, j, q6(math.cos(2 * math.Pi * k * j / n)),
          q6(math.sin(2 * math.Pi * k * j / n)))
      val values = table.map { case (k, j, c, s) => s"($k,$j,$c,$s)" }
        .mkString(", ")
      s"""WITH au AS (SELECT doc_id AS media_id, text FROM documents
         |       WHERE doc_id % 3 = 1 AND length(text) >= 200),
         |sm AS (SELECT media_id, (i - 1) // 200 AS frame, (i - 1) % 200 AS j,
         |         ord(substr(text, CAST(i AS INTEGER), 1)) - 128 AS v
         |       FROM au, unnest(generate_series(1, (length(text) // 200) * 200)) AS t(i)),
         |ct(k, j, c, s) AS (VALUES $values),
         |a AS (SELECT media_id, frame, k,
         |    CAST(SUM(v * c) AS BIGINT) AS re, CAST(SUM(v * s) AS BIGINT) AS im
         |  FROM sm JOIN ct ON sm.j = ct.j GROUP BY 1, 2, 3)
         |SELECT media_id, CAST(frame AS BIGINT) AS frame, CAST(k AS INTEGER) AS bin,
         |  round(ln(1.0 + CAST(CAST(re AS DECIMAL(20,0)) * re
         |    + CAST(im AS DECIMAL(20,0)) * im AS DOUBLE)), 6) AS log_power
         |FROM a ORDER BY media_id, frame, bin""".stripMargin
    }) { (s, dir) =>
      val bins = Seq(1, 4, 16)
      val n = 200
      def q6(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
      import s.implicits._
      val basis = (for (k <- bins; j <- 0 until n) yield
        (k, j, q6(math.cos(2 * math.Pi * k * j / n)),
          q6(math.sin(2 * math.Pi * k * j / n))))
        .toDF("k", "j", "c", "sn")
      val au = Tables.parallelizeByRange(Tables.load(s, dir, "documents")
          // the < 200-char guard matters in BOTH engines, but for
          // different reasons: DuckDB's generate_series(1, 0) is
          // empty while Spark's sequence(1, 0) DESCENDS
          .filter(col("doc_id") % 3 === 1 && length(col("text")) >= 200)
          .select(col("doc_id").as("media_id"), col("text")),
        col("media_id"))
      val sm = au
        .select(col("media_id"),
          explode(sequence(lit(1),
            expr("(length(text) div 200) * 200"))).as("i"),
          col("text"))
        .select(col("media_id"), expr("(i - 1) div 200").as("frame"),
          expr("(i - 1) % 200").as("j"),
          (ascii(col("text").substr(col("i"), lit(1))) - 128).as("v"))
      sm.join(broadcast(basis), "j")
        .groupBy("media_id", "frame", "k")
        .agg(sum(col("v") * col("c")).cast("long").as("re"),
          sum(col("v") * col("sn")).cast("long").as("im"))
        .select(col("media_id"), col("frame").cast("long").as("frame"),
          col("k").cast("int").as("bin"),
          round(log(lit(1.0) + (col("re").cast(DecimalType(20, 0)) * col("re")
            + col("im").cast(DecimalType(20, 0)) * col("im")).cast("double")), 6)
            .as("log_power"))
        .orderBy("media_id", "frame", "bin")
    },

    // Frame-sample PLANNING — the step between video metadata and the
    // decoder: for each video, the evenly-strided frame indices to
    // decode (at most 8 per video), emitted as (media_id, frame_idx)
    // work units. This is the row set a decode stage mapPartitions
    // over — planning is pure metadata math (no bytes touched), so at
    // 100 TB it runs on the metadata column chunks alone and the
    // decoder's input is already balanced work units, not whole
    // videos (a 2-frame clip contributes 2 units, a 240-frame one 8).
    // n_frames is the same md5-derived stub rule as the decoder's.
    Q("frame_sample_plan", {
      val nf = s"1 + ${duckH32(2, "text")} % 240"
      s"""WITH v AS (SELECT doc_id AS media_id, $nf AS n_frames,
         |    CAST(ceil(($nf) / 8.0) AS BIGINT) AS step
         |  FROM documents WHERE doc_id % 3 = 2)
         |SELECT media_id, n_frames, step,
         |  unnest(generate_series(0, n_frames - 1, step)) AS frame_idx
         |FROM v ORDER BY media_id, frame_idx""".stripMargin
    }) { (s, dir) =>
      val nf = lit(1) + h32(2, col("text")) % 240
      Tables.load(s, dir, "documents")
        .filter(col("doc_id") % 3 === 2)
        .select(col("doc_id").as("media_id"), nf.as("n_frames"),
          ceil(nf / 8.0).cast("long").as("step"))
        .select(col("media_id"), col("n_frames"), col("step"),
          explode(sequence(lit(0L), col("n_frames") - 1, col("step")))
            .as("frame_idx"))
        .orderBy("media_id", "frame_idx")
    },

    // Bigram conditional-LM scoring — the second-order companion to
    // unigram_logprob: P(w2|w1) = c(w1,w2) / c(w1-as-context), trained
    // on the corpus itself. The bigram pairs are derived MAP-SIDE from
    // each row's own token array (arrays_zip of the two shifted
    // slices) — no window, no self-join on position, no shuffle until
    // the count aggregates. Unlike the unigram LM (word vocab,
    // broadcast), the bigram table scales with vocab² — both LM joins
    // are plain shuffle joins on their keys by design; at 100 TB
    // that's the only shape that survives. Determinism: per-bigram log
    // terms round to 6 dp and sum as DECIMAL(20,6) (an unrounded
    // double sum is row-order-dependent).
    Q("bigram_logprob",
      """WITH arr AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
        |bg AS (SELECT doc_id, unnest(list_zip(a[1:len(a)-1], a[2:len(a)])) AS p FROM arr),
        |pairs AS (SELECT doc_id, p[1] AS w1, p[2] AS w2 FROM bg),
        |dbc AS (SELECT doc_id, w1, w2, COUNT(*) AS dc FROM pairs GROUP BY 1, 2, 3),
        |g AS (SELECT w1, w2, CAST(SUM(dc) AS BIGINT) AS c FROM dbc GROUP BY 1, 2),
        |ctx AS (SELECT w1, CAST(SUM(c) AS BIGINT) AS cc FROM g GROUP BY 1)
        |SELECT doc_id, CAST(SUM(dc) AS BIGINT) AS n_bigrams,
        |  CAST(SUM(dc * CAST(round(ln(CAST(c AS DOUBLE) / cc), 6) AS DECIMAL(20,6))) AS DOUBLE) AS logprob,
        |  CAST(SUM(dc * CAST(round(ln(CAST(c AS DOUBLE) / cc), 6) AS DECIMAL(20,6))) AS DOUBLE)
        |    / CAST(SUM(dc) AS BIGINT) AS avg_logprob
        |FROM dbc JOIN g USING (w1, w2) JOIN ctx USING (w1)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val arr = Tables.parallelize(Tables.load(s, dir, "documents")
          .select("doc_id", "text"))
        .select(col("doc_id"), split(col("text"), " ").as("a"))
      val pairs = arr
        .select(col("doc_id"), explode(arrays_zip(
          slice(col("a"), lit(1), size(col("a")) - 1),
          slice(col("a"), lit(2), size(col("a")) - 1))).as("p"))
        .select(col("doc_id"), col("p.0").as("w1"), col("p.1").as("w2"))
      val dbc = pairs.groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("dc"))
      // global and context counts DERIVE from the per-doc counts: one
      // tokenize, one explode, and the heavier aggregates run over
      // |doc x bigram-vocab| rows, not raw pairs
      val g = dbc.groupBy("w1", "w2").agg(sum(col("dc")).as("c"))
      val ctx = g.groupBy("w1").agg(sum(col("c")).as("cc"))
      val term = round(log(col("c").cast("double") / col("cc")), 6)
        .cast(DecimalType(20, 6))
      dbc.join(g, Seq("w1", "w2")).join(ctx, Seq("w1"))
        .groupBy("doc_id")
        .agg(sum(col("dc")).as("n_bigrams"),
          sum(col("dc") * term).cast("double").as("logprob"))
        .select(col("doc_id"), col("n_bigrams"), col("logprob"),
          (col("logprob") / col("n_bigrams")).as("avg_logprob"))
        .orderBy("doc_id")
    },

    // Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD '03) —
    // the position-robust local fingerprinting used for plagiarism and
    // overlap detection: hash every token 3-gram, slide a window of
    // WinnowW consecutive gram hashes, keep each window's minimum
    // (rightmost on ties). Guarantees every WinnowW-run contributes a
    // fingerprint at ~2/(w+1) density, and — unlike doc_fingerprint's
    // whole-doc hash — shared passages match at ANY offset. The
    // rightmost-min tie rule is not expressible in one window
    // function, so (hash, pos) packs into a single BIGINT
    // (h * PosBase + (PosBase-1-pos)) whose plain MIN implements it
    // exactly in both engines. One generator + one keyed window per
    // doc — no self-join, no pair expansion; fingerprints shuffle as
    // single longs.
    Q("winnow_fingerprints",
      s"""${TextQueries.winnowCtes}
         |SELECT doc_id, pos, khash FROM sel
         |ORDER BY doc_id, pos""".stripMargin) { (s, dir) =>
      TextQueries.winnowFingerprints(s, dir).orderBy("doc_id", "pos")
    },

    // Cross-document duplicate SPANS — exact-substring dedup in the
    // style of "Deduplicating Training Data Makes Language Models
    // Better" (Lee et al., ACL '22), but over the winnowed
    // fingerprints instead of a suffix array: two documents sharing a
    // verbatim passage share its fingerprints at a CONSTANT position
    // offset, so grouping fingerprint matches by (d1, d2, pos1-pos2)
    // and keeping groups with >= MinSharedFp hits recovers the
    // aligned span (start + token extent) — boilerplate headers,
    // mirrored articles, license blocks. Ubiquitous fingerprints
    // (corpus-wide boilerplate k-grams) are capped at MaxFpDocFreq
    // before the self-join — the standard guard that keeps the
    // candidate join linear instead of hot-key quadratic at 100 TB.
    // The winnowing guarantee bounds what this can miss: any shared
    // run of >= WinnowW + 2 tokens contains a selected fingerprint.
    Q("dup_spans",
      s"""${TextQueries.winnowCtes},
         |freq AS (SELECT khash, COUNT(*) AS f FROM sel GROUP BY 1),
         |fp AS (SELECT sel.doc_id, sel.pos, sel.khash FROM sel
         |       JOIN freq USING (khash) WHERE f <= ${TextQueries.MaxFpDocFreq}),
         |pr AS (SELECT a.doc_id AS d1, b.doc_id AS d2, a.pos - b.pos AS off, a.pos AS p1
         |       FROM fp a JOIN fp b ON a.khash = b.khash AND a.doc_id < b.doc_id)
         |SELECT d1, d2, off, COUNT(*) AS n_shared, MIN(p1) AS start1,
         |  MAX(p1) - MIN(p1) + 3 AS span_tokens
         |FROM pr GROUP BY 1, 2, 3 HAVING COUNT(*) >= ${TextQueries.MinSharedFp}
         |ORDER BY d1, d2, off""".stripMargin) { (s, dir) =>
      // NOT localCheckpoint'ed (unlike decontamination's shingle
      // index): all three consumers — the frequency counts and both
      // self-join sides — hang off the fingerprint distinct()'s
      // exchange, which Spark already shares via ReusedExchange
      // (asserted in PipelineShapesSpec; an interleaved A/B at sf0.1,
      // local[32], 2026-08-13 puts both variants at ~2.0 s, within
      // host noise). At production scale the persisted fingerprint
      // index replaces the recompute either way.
      val sel = TextQueries.winnowFingerprints(s, dir)
      val freq = sel.groupBy("khash").agg(count(lit(1)).as("f"))
        .filter(col("f") <= TextQueries.MaxFpDocFreq)
      val fp = sel.join(freq.select("khash"), "khash")
      val a = fp.select(col("khash"), col("doc_id").as("d1"), col("pos").as("p1"))
      val b = fp.select(col("khash"), col("doc_id").as("d2"), col("pos").as("p2"))
      a.join(b, Seq("khash")).filter(col("d1") < col("d2"))
        .groupBy(col("d1"), col("d2"), (col("p1") - col("p2")).as("off"))
        .agg(count(lit(1)).as("n_shared"), min(col("p1")).as("start1"),
          (max(col("p1")) - min(col("p1")) + 3).as("span_tokens"))
        .filter(col("n_shared") >= TextQueries.MinSharedFp)
        .orderBy("d1", "d2", "off")
    },

    // Per-source quota capping — the standard corpus-curation guard
    // against one crawl dominating the mix: keep at most CapPerSource
    // docs per source, chosen by a DETERMINISTIC hash rank (md5 of the
    // doc id — reshuffling or re-partitioning the corpus cannot change
    // the selection, unlike rand()). One hash-partitioned window per
    // source; for sources large enough that a single partition's sort
    // hurts, the native TopKPerGroup operator (topk_native) is the
    // drop-in scale twin — same contract, bounded heaps, no full sort.
    Q("source_cap",
      s"""SELECT source, rnk, doc_id FROM (
         |  SELECT source, doc_id, row_number() OVER (
         |    PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rnk
         |  FROM documents) WHERE rnk <= ${TextQueries.CapPerSource}
         |ORDER BY source, rnk""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("source")
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      Tables.load(s, dir, "documents").select("source", "doc_id")
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= TextQueries.CapPerSource)
        .select("source", "rnk", "doc_id")
        .orderBy("source", "rnk")
    },

    // Tokenizer fertility per language — the standard tokenizer-
    // quality table (subword tokens per whitespace word; chars per
    // subword token): a language whose fertility is far above the
    // corpus mean is under-served by the vocabulary and pays more
    // sequence length per sentence. Uses the same BPE-ish regex
    // segmentation as token_count. Pure scan-side counting into a
    // |langs|-row aggregate; ratios derive from exact integer sums
    // (order-independent), divided once at the end.
    Q("tokenizer_fertility",
      """WITH f AS (SELECT lang,
        |    len(string_split(text, ' ')) AS ws,
        |    len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS bpe,
        |    length(text) AS ch FROM documents)
        |SELECT lang, CAST(SUM(ws) AS BIGINT) AS n_words,
        |  CAST(SUM(bpe) AS BIGINT) AS n_subwords,
        |  round(SUM(bpe) * 1.0 / SUM(ws), 6) AS fertility,
        |  round(SUM(ch) * 1.0 / SUM(bpe), 6) AS chars_per_token
        |FROM f GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("lang"),
          TextAnalysis.wsTokenCount(col("text")).as("ws"),
          TextAnalysis.bpeishTokenCount(col("text")).as("bpe"),
          length(col("text")).as("ch"))
        .groupBy("lang")
        .agg(sum("ws").as("n_words"), sum("bpe").as("n_subwords"),
          round(sum("bpe") * lit(1.0) / sum("ws"), 6).as("fertility"),
          round(sum("ch") * lit(1.0) / sum("bpe"), 6).as("chars_per_token"))
        .orderBy("lang")
    },

    // Vocabulary coverage of the held-out split — the tokenizer/LM
    // eval stage after train_split: what fraction of the test split's
    // token mass is out-of-vocabulary w.r.t. the TRAIN split's
    // vocabulary, per language (decontamination asks "did test leak
    // into train"; this asks the complementary curation question
    // "does train COVER test"). Scale shape: test tokens partial-
    // aggregate to (lang, tok, c) map-side BEFORE the vocabulary
    // join, so the token shuffle carries distinct-type rows, not the
    // token stream; the train vocabulary is dictionary-sized and the
    // final aggregate is |langs| rows. Same deterministic md5 split
    // as train_split — no persisted split table needed.
    Q("vocab_coverage", {
      val h = duckH32("CAST(doc_id AS VARCHAR)")
      s"""WITH s AS (SELECT doc_id, lang, text, $h % 100 AS bucket FROM documents),
         |tr AS (SELECT DISTINCT unnest(string_split(text, ' ')) AS tok
         |       FROM s WHERE bucket < 80),
         |te AS (SELECT lang, tok, COUNT(*) AS c FROM
         |         (SELECT lang, unnest(string_split(text, ' ')) AS tok
         |          FROM s WHERE bucket >= 90) GROUP BY 1, 2),
         |j AS (SELECT lang, c, (tr.tok IS NOT NULL) AS hit
         |      FROM te LEFT JOIN tr ON te.tok = tr.tok)
         |SELECT lang, CAST(SUM(c) AS BIGINT) AS n_tokens,
         |  CAST(SUM(CASE WHEN NOT hit THEN c ELSE 0 END) AS BIGINT) AS n_oov,
         |  round(SUM(CASE WHEN NOT hit THEN c ELSE 0 END) * 1.0 / SUM(c), 6) AS oov_rate
         |FROM j GROUP BY lang ORDER BY lang""".stripMargin
    }) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("text"),
          (h32(col("doc_id").cast("string")) % 100).as("bucket"))
      val tr = docs.filter(col("bucket") < 80)
        .select(explode(split(col("text"), " ")).as("tok")).distinct()
      val te = docs.filter(col("bucket") >= 90)
        .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("lang", "tok").agg(count(lit(1)).as("c"))
      te.join(tr.withColumn("hit", lit(true)), Seq("tok"), "left_outer")
        .groupBy("lang")
        .agg(sum(col("c")).as("n_tokens"),
          sum(when(col("hit").isNull, col("c")).otherwise(0L)).as("n_oov"))
        .select(col("lang"), col("n_tokens"), col("n_oov"),
          round(col("n_oov") * lit(1.0) / col("n_tokens"), 6).as("oov_rate"))
        .orderBy("lang")
    },

    // Model-based quality filtering — the serving shape of the trained
    // linear classifier every production pipeline runs after the
    // heuristic gates (quality_score / filter_flags): per-doc features
    // (length saturation, type-token ratio, stopword fraction, mean
    // word length) -> fixed-order linear combination -> sigmoid ->
    // decile census. The weights here are FIXTURE CONSTANTS standing
    // in for trainer output; production loads them from a model table
    // and the plan is unchanged (scoring is pure per-row column math
    // riding the scan; the only exchange carries (bucket, score_u)
    // into an 11-row aggregate). Cross-engine: features are exact
    // integer-derived doubles combined in one fixed op order, so z is
    // bit-identical; exp() is the one libm call and the sigmoid
    // quantizes to 1e-6 integer units right after it (flip odds
    // ~1e-10/doc — the dsir_select argument), making the SUM exact
    // and the bucket assignment an integer floor-division.
    Q("quality_logit",
      """WITH f AS (SELECT doc_id,
        |    len(string_split(text, ' ')) AS n_toks,
        |    len(list_distinct(string_split(text, ' '))) AS n_types,
        |    len(list_filter(string_split(text, ' '), t -> t = 'the' OR t = 'a')) AS n_stop,
        |    length(text) AS n_ch FROM documents),
        |z AS (SELECT doc_id,
        |    -1.0 + 2.0 * least(1.0, n_toks / 100.0)
        |         + 1.5 * (CAST(n_types AS DOUBLE) / n_toks)
        |         - 2.0 * (CAST(n_stop AS DOUBLE) / n_toks)
        |         + 0.3 * (CAST(n_ch - n_toks + 1 AS DOUBLE) / n_toks) AS z
        |  FROM f WHERE n_toks > 0),
        |s AS (SELECT doc_id,
        |    CAST(floor(1e6 / (1.0 + exp(-z)) + 0.5) AS BIGINT) AS score_u FROM z)
        |SELECT score_u // 100000 AS k_bucket, COUNT(*) AS n,
        |  CAST(SUM(score_u) AS BIGINT) AS su,
        |  SUM(score_u) / COUNT(*) / 1000000.0 AS avg_score
        |FROM s GROUP BY 1 ORDER BY k_bucket""".stripMargin) { (s, dir) =>
      val toks = split(col("text"), " ")
      val f = Tables.parallelize(
          Tables.load(s, dir, "documents").select("doc_id", "text"))
        .select(col("doc_id"),
          size(toks).as("n_toks"),
          size(array_distinct(toks)).as("n_types"),
          size(filter(toks, t => t === "the" || t === "a")).as("n_stop"),
          length(col("text")).as("n_ch"))
        .filter(col("n_toks") > 0)
      val z = lit(-1.0) +
        lit(2.0) * least(lit(1.0), col("n_toks") / 100.0) +
        lit(1.5) * (col("n_types").cast("double") / col("n_toks")) -
        lit(2.0) * (col("n_stop").cast("double") / col("n_toks")) +
        lit(0.3) * ((col("n_ch") - col("n_toks") + 1).cast("double") / col("n_toks"))
      f.select(floor(lit(1e6) / (lit(1.0) + exp(-z)) + 0.5).cast("long").as("score_u"))
        .groupBy(expr("score_u div 100000").as("k_bucket"))
        .agg(count(lit(1)).as("n"), sum("score_u").as("su"))
        .select(col("k_bucket"), col("n"), col("su"),
          (col("su") / col("n") / lit(1000000.0)).as("avg_score"))
        .orderBy("k_bucket")
    },

    // GOPHER-STYLE RULE FILTER (Rae et al. '21 §A1.1 adapted to the
    // fixture's stats) — the auditable counterpart to quality_score's
    // single scalar: each rule is its own boolean column so curation
    // can report WHICH rule rejected a document, and `keep` is their
    // conjunction. Rules: word count in [20,90], mean word length
    // >= 4.0, >= 2 stopword hits, most-frequent-token fraction
    // <= 0.125 (the intra-doc repetition guard). Entirely scan-side
    // column math — zero shuffle before the output sort; at 100 TB
    // this is one fused projection over the corpus, and the per-rule
    // flags aggregate into a rejection census for free.
    Q("gopher_rules",
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS a, length(text) AS nch FROM documents),
        |f AS (SELECT doc_id, len(a) AS n_words,
        |    (nch - (len(a) - 1)) * 1.0 / len(a) AS mwl,
        |    len(list_filter(a, t -> t = 'the')) + len(list_filter(a, t -> t = 'a')) AS stop_hits,
        |    list_max(list_transform(list_distinct(a), w -> len(list_filter(a, t -> t = w)))) * 1.0 / len(a) AS topf
        |  FROM d)
        |SELECT doc_id, n_words, round(mwl, 6) AS mean_word_len, stop_hits,
        |  round(topf, 6) AS top_tok_frac,
        |  n_words BETWEEN 20 AND 90 AS r_len,
        |  mwl >= 4.0 AS r_word_len,
        |  stop_hits >= 2 AS r_stop,
        |  topf <= 0.125 AS r_rep,
        |  (n_words BETWEEN 20 AND 90) AND mwl >= 4.0 AND stop_hits >= 2
        |    AND topf <= 0.125 AS keep
        |FROM f ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val a = split(col("text"), " ")
      val f = Tables.parallelize(
          Tables.load(s, dir, "documents").select("doc_id", "text"))
        .select(col("doc_id"), size(a).as("n_words"),
          ((length(col("text")) - (size(a) - 1)) * lit(1.0) / size(a)).as("mwl"),
          (size(filter(a, t => t === "the")) +
            size(filter(a, t => t === "a"))).as("stop_hits"),
          // per-row mode without a per-doc shuffle: max run length of
          // the sorted token array (TextAnalysis.maxTokenCount —
          // O(k log k)/row vs the old O(types x tokens) distinct scan)
          (graft.ops.TextAnalysis.maxTokenCount(a) * lit(1.0) / size(a))
            .as("topf"))
      f.select(col("doc_id"), col("n_words"),
          round(col("mwl"), 6).as("mean_word_len"), col("stop_hits"),
          round(col("topf"), 6).as("top_tok_frac"),
          col("n_words").between(20, 90).as("r_len"),
          (col("mwl") >= 4.0).as("r_word_len"),
          (col("stop_hits") >= 2).as("r_stop"),
          (col("topf") <= 0.125).as("r_rep"),
          (col("n_words").between(20, 90) && col("mwl") >= 4.0 &&
            col("stop_hits") >= 2 && col("topf") <= 0.125).as("keep"))
        .orderBy("doc_id")
    },

    // PII SCAN + REDACTION — the privacy pass every release pipeline
    // runs: regex-detect emails / phone numbers / IPv4s, count them,
    // and mask each class with a typed placeholder. The fixture text
    // is digit-free word soup, so the query first INJECTS
    // deterministic PII derived from doc_id into 2/3 of the documents
    // (the other 1/3 stay clean — the negative case); both engines
    // build the identical enriched string, so detection counts and
    // the md5 of the redacted text pin the scan AND the replacement
    // byte-exactly. Patterns use the RE2/Java-regex common subset (no
    // backrefs/lookaround). Scan-side projection, zero shuffle; at
    // 100 TB redaction cost is one regex pass fused into the scan.
    Q("pii_redact", {
      val email = "[a-z0-9._]+@[a-z.]+"
      val phone = "555-[0-9]{4}"
      val ip = "10\\.[0-9]{1,3}\\.0\\.[0-9]{1,3}"
      s"""WITH e AS (SELECT doc_id,
         |  CASE WHEN doc_id % 3 = 0 THEN text
         |       ELSE text || ' contact user' || CAST(doc_id AS VARCHAR) ||
         |            '@mail.example phone 555-' ||
         |            lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' ip 10.' ||
         |            CAST(doc_id % 256 AS VARCHAR) || '.0.' ||
         |            CAST((doc_id * 7) % 256 AS VARCHAR) END AS t
         |  FROM documents),
         |r AS (SELECT doc_id,
         |    len(regexp_extract_all(t, '$email')) AS n_email,
         |    len(regexp_extract_all(t, '$phone')) AS n_phone,
         |    len(regexp_extract_all(t, '$ip')) AS n_ip,
         |    regexp_replace(regexp_replace(regexp_replace(t,
         |      '$email', '<EMAIL>', 'g'),
         |      '$phone', '<PHONE>', 'g'),
         |      '$ip', '<IP>', 'g') AS red
         |  FROM e)
         |SELECT doc_id, n_email, n_phone, n_ip,
         |  n_email + n_phone + n_ip > 0 AS has_pii,
         |  md5(red) AS redacted_md5
         |FROM r ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      val email = "[a-z0-9._]+@[a-z.]+"
      val phone = "555-[0-9]{4}"
      val ip = "10\\.[0-9]{1,3}\\.0\\.[0-9]{1,3}"
      val enriched = when(col("doc_id") % 3 === 0, col("text")).otherwise(
        concat(col("text"), lit(" contact user"),
          col("doc_id").cast("string"), lit("@mail.example phone 555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
          lit(" ip 10."), (col("doc_id") % 256).cast("string"), lit(".0."),
          ((col("doc_id") * 7) % 256).cast("string")))
      val r = Tables.parallelize(
          Tables.load(s, dir, "documents").select("doc_id", "text"))
        .select(col("doc_id"), enriched.as("t"))
        .select(col("doc_id"),
          regexp_count(col("t"), lit(email)).as("n_email"),
          regexp_count(col("t"), lit(phone)).as("n_phone"),
          regexp_count(col("t"), lit(ip)).as("n_ip"),
          regexp_replace(regexp_replace(regexp_replace(col("t"),
            email, "<EMAIL>"), phone, "<PHONE>"), ip, "<IP>").as("red"))
      r.select(col("doc_id"), col("n_email"), col("n_phone"), col("n_ip"),
          (col("n_email") + col("n_phone") + col("n_ip") > 0).as("has_pii"),
          md5(col("red")).as("redacted_md5"))
        .orderBy("doc_id")
    },

    // SEQUENCE-PACKING EFFICIENCY AUDIT — the QA census over
    // pack_sequences' greedy bins: per shard, how many sequences were
    // cut, how full they are (sum-then-divide, so the fill average is
    // summation-order-independent), and how many bins a straddling
    // document pushed past the 2048 budget. Window cumsum stays
    // hash-partitioned by shard exactly as in pack_sequences; the
    // audit itself reduces 2 levels to 8 census rows.
    Q("pack_efficiency",
      s"""$packCtes,
         |sq AS (SELECT shard, seq_id,
         |    COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS tok
         |  FROM bins GROUP BY 1, 2)
         |SELECT shard, COUNT(*) AS n_seqs, CAST(SUM(n_docs) AS BIGINT) AS n_docs,
         |  CAST(MIN(tok) AS BIGINT) AS min_tokens,
         |  CAST(MAX(tok) AS BIGINT) AS max_tokens,
         |  round(CAST(SUM(tok) AS DOUBLE) / COUNT(*) / 2048.0, 6) AS avg_fill,
         |  CAST(SUM(CASE WHEN tok > 2048 THEN 1 ELSE 0 END) AS BIGINT) AS n_overflow
         |FROM sq GROUP BY shard ORDER BY shard""".stripMargin) { (s, dir) =>
      val sq = TextQueries.packBins(s, dir)
        .groupBy("shard", "seq_id")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tok"))
      sq.groupBy("shard")
        .agg(count(lit(1)).as("n_seqs"), sum(col("n_docs")).as("n_docs"),
          min(col("tok")).as("min_tokens"), max(col("tok")).as("max_tokens"),
          round(sum(col("tok")).cast("double") / count(lit(1)) / lit(2048.0), 6)
            .as("avg_fill"),
          sum(when(col("tok") > 2048, 1).otherwise(0)).as("n_overflow"))
        .orderBy("shard")
    },

    // TRIGRAM STUPID-BACKOFF SCORER (Brants et al., EMNLP '07) — the
    // count-based LM quality signal one order above bigram_logprob,
    // WITH the backoff path genuinely exercised: counts are trained
    // on the even-doc_id half of the corpus, so odd documents contain
    // unseen trigrams and fall back trigram -> bigram -> add-one
    // unigram with the standard 0.4 backoff factor. All lower-order
    // counts are marginals of ONE trigram count table (the standard
    // count-infra trick: derive, don't re-scan), so the corpus is
    // tokenized exactly once and the count tables are
    // vocabulary-bounded — at 100 TB they broadcast while the per-doc
    // trigram stream joins map-side. Per-term logs are rounded to 6
    // decimals and summed as DECIMAL(20,6): bit-identical across
    // engines and summation orders.
    Q("trigram_backoff",
      """WITH arr AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
        |tg AS (SELECT doc_id, unnest(list_zip(a[1:len(a)-2], a[2:len(a)-1], a[3:len(a)])) AS p
        |       FROM arr WHERE len(a) >= 3),
        |tri AS (SELECT doc_id, p[1] AS w1, p[2] AS w2, p[3] AS w3 FROM tg),
        |dtc AS (SELECT doc_id, w1, w2, w3, COUNT(*) AS dc FROM tri GROUP BY 1, 2, 3, 4),
        |t3 AS (SELECT w1, w2, w3, CAST(SUM(dc) AS BIGINT) AS c3 FROM dtc WHERE doc_id % 2 = 0 GROUP BY 1, 2, 3),
        |cx2 AS (SELECT w1, w2, CAST(SUM(c3) AS BIGINT) AS cc2 FROM t3 GROUP BY 1, 2),
        |b2 AS (SELECT w2, w3, CAST(SUM(c3) AS BIGINT) AS c2 FROM t3 GROUP BY 1, 2),
        |cx1 AS (SELECT w2, CAST(SUM(c2) AS BIGINT) AS cc1 FROM b2 GROUP BY 1),
        |u1 AS (SELECT w3, CAST(SUM(c2) AS BIGINT) AS c1 FROM b2 GROUP BY 1),
        |tot AS (SELECT CAST(SUM(c1) AS BIGINT) AS n, COUNT(*) AS v FROM u1)
        |SELECT dtc.doc_id AS doc_id, CAST(SUM(dc) AS BIGINT) AS n_trigrams,
        |  CAST(SUM(CASE WHEN c3 IS NULL THEN dc ELSE 0 END) AS BIGINT) AS n_backoff,
        |  CAST(SUM(dc * CAST(round(CASE
        |    WHEN c3 IS NOT NULL THEN ln(CAST(c3 AS DOUBLE) / cc2)
        |    WHEN c2 IS NOT NULL THEN ln(0.4 * c2 / cc1)
        |    ELSE ln(0.16 * (COALESCE(c1, 0) + 1) / (n + v)) END, 6) AS DECIMAL(20,6))) AS DOUBLE) AS logprob
        |FROM dtc LEFT JOIN t3 USING (w1, w2, w3) LEFT JOIN cx2 USING (w1, w2)
        |  LEFT JOIN b2 USING (w2, w3) LEFT JOIN cx1 USING (w2) LEFT JOIN u1 USING (w3)
        |  CROSS JOIN tot
        |GROUP BY 1 ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val arr = Tables.parallelize(Tables.load(s, dir, "documents")
          .select("doc_id", "text"))
        .select(col("doc_id"), col("text"), split(col("text"), " ").as("a"))
      val n = size(col("a"))
      // clamp: a doc with < 3 tokens has NO trigrams (empty slices),
      // where a bare n-2 length would be negative and throw
      val tlen = greatest(n - 2, lit(0))
      val tri = arr
        .select(col("doc_id"), explode(arrays_zip(
          slice(col("a"), lit(1), tlen),
          slice(col("a"), lit(2), tlen),
          slice(col("a"), lit(3), tlen))).as("p"))
        .select(col("doc_id"), col("p.0").as("w1"), col("p.1").as("w2"),
          col("p.2").as("w3"))
      // score-side per-(doc, trigram) counts as a MAP-SIDE histogram
      // over the shingle strings (TextAnalysis.histogram — words carry
      // no spaces, so "w1 w2 w3" splits back losslessly): same multiset
      // as the old groupBy(doc_id, w1, w2, w3).count, but the
      // corpus-wide (doc, trigram) exchange never exists (guide §2.4)
      val dtc = arr
        .select(col("doc_id"),
          explode(graft.ops.TextAnalysis.histogram(
            graft.ops.Dedup.shingles(col("text"), 3))).as("e"))
        .select(col("doc_id"),
          element_at(split(col("e.tok"), " "), 1).as("w1"),
          element_at(split(col("e.tok"), " "), 2).as("w2"),
          element_at(split(col("e.tok"), " "), 3).as("w3"),
          col("e.cnt").as("dc"))
      // train-half counts + all lower orders derive from ONE trigram
      // count table (one tokenize, one explode, then vocabulary-bounded
      // aggregates) — counted DIRECTLY from the occurrence stream (the
      // sum over documents of per-doc counts IS the occurrence total),
      // skipping the per-(doc, trigram) intermediate the old derivation
      // grouped by. t3 stays MATERIALIZED (localCheckpoint — the
      // "trained counts" artifact a production run persists): without
      // it each of the five broadcast sides re-derives the corpus scan
      // + explode + count (measured r13: 6 scans -> 2, 2.7 s -> 2.1 s)
      val t3 = tri.filter(col("doc_id") % 2 === 0)
        .groupBy("w1", "w2", "w3").agg(count(lit(1)).cast("long").as("c3"))
        .localCheckpoint(true)
      val cx2 = t3.groupBy("w1", "w2").agg(sum(col("c3")).as("cc2"))
      val b2 = t3.groupBy("w2", "w3").agg(sum(col("c3")).as("c2"))
      val cx1 = b2.groupBy("w2").agg(sum(col("c2")).as("cc1"))
      val u1 = b2.groupBy("w3").agg(sum(col("c2")).as("c1"))
      val tot = u1.agg(sum(col("c1")).as("n"), count(lit(1)).as("v"))
      val term = round(
        when(col("c3").isNotNull, log(col("c3").cast("double") / col("cc2")))
          .when(col("c2").isNotNull, log(lit(0.4) * col("c2") / col("cc1")))
          .otherwise(log(lit(0.16) * (coalesce(col("c1"), lit(0)) + 1) /
            (col("n") + col("v")))), 6)
        .cast(DecimalType(20, 6))
      dtc.join(broadcast(t3), Seq("w1", "w2", "w3"), "left")
        .join(broadcast(cx2), Seq("w1", "w2"), "left")
        .join(broadcast(b2), Seq("w2", "w3"), "left")
        .join(broadcast(cx1), Seq("w2"), "left")
        .join(broadcast(u1), Seq("w3"), "left")
        .crossJoin(broadcast(tot))
        .groupBy("doc_id")
        .agg(sum(col("dc")).as("n_trigrams"),
          sum(when(col("c3").isNull, col("dc")).otherwise(lit(0)))
            .as("n_backoff"),
          sum(col("dc") * term).cast("double").as("logprob"))
        .orderBy("doc_id")
    },

    // T5-STYLE SPAN CORRUPTION (Raffel et al., JMLR '20 §3.1.4) — the
    // denoising-pretraining data prep step: mask ~15% of tokens in
    // short contiguous spans, replace each span with a sentinel in
    // the input, and emit (sentinel, original tokens) as the target.
    // Spans are DETERMINISTIC and non-overlapping by construction:
    // tokens partition into 20-token blocks, and each block masks the
    // 3 positions starting at h32(doc_id#block) % 18 (3/20 = 15%
    // density; a short tail block masks only what exists). Every
    // decision is a pure function of (doc_id, position), so both
    // engines build byte-identical input/target strings — md5-pinned
    // — and re-running on any cluster reproduces the same corruption
    // (the property that makes the step resumable at 100 TB). Pure
    // per-row array math on the scan; zero shuffle.
    Q("span_corruption", {
      val h = duckH32("CAST(doc_id AS VARCHAR) || '#' || CAST(b AS VARCHAR)")
      s"""WITH arr AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
         |bh AS (SELECT doc_id, a, list_transform(generate_series(0, (len(a) - 1) // 20),
         |    b -> $h % 18) AS bh FROM arr),
         |m AS (SELECT doc_id, a, list_transform(generate_series(1, len(a)),
         |    i -> (i - 1) % 20 - bh[(i - 1) // 20 + 1]) AS rel FROM bh),
         |parts AS (SELECT doc_id, len(a) AS n_tokens,
         |    array_to_string(list_filter(list_transform(generate_series(1, len(a)),
         |      i -> CASE WHEN rel[i] = 0 THEN '<extra_' || CAST((i - 1) // 20 AS VARCHAR) || '>'
         |                WHEN rel[i] > 0 AND rel[i] <= 2 THEN NULL
         |                ELSE a[i] END), x -> x IS NOT NULL), ' ') AS input_text,
         |    array_to_string(list_filter(list_transform(generate_series(1, len(a)),
         |      i -> CASE WHEN rel[i] = 0 THEN '<extra_' || CAST((i - 1) // 20 AS VARCHAR) || '> ' || a[i]
         |                WHEN rel[i] > 0 AND rel[i] <= 2 THEN a[i]
         |                ELSE NULL END), x -> x IS NOT NULL), ' ') AS target_text,
         |    len(list_filter(list_transform(generate_series(1, len(a)),
         |      i -> rel[i] >= 0 AND rel[i] <= 2), x -> x)) AS n_masked,
         |    len(list_filter(list_transform(generate_series(1, len(a)),
         |      i -> rel[i] = 0), x -> x)) AS n_spans
         |  FROM m)
         |SELECT doc_id, n_tokens, n_masked, n_spans,
         |  md5(COALESCE(input_text, '')) AS input_md5,
         |  md5(COALESCE(target_text, '')) AS target_md5
         |FROM parts ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      val a = col("a")
      // rel = in-block offset minus the block's span start: 0 = span
      // head (sentinel), 1..2 = span body (dropped from input), else
      // untouched — ONE shared derivation drives all four outputs.
      // The hash depends only on (doc_id, block), so it computes ONCE
      // per block into bh (ceil(n/20) md5s per row, not n — md5 count
      // is the scan's dominant cost, same reasoning as MinHash's
      // one-md5-per-shingle rework).
      def blockOf(i0: org.apache.spark.sql.Column) = floor(i0 / 20)
      val bh = transform(
        sequence(lit(0L), floor((size(a) - 1) / 20).cast("long")),
        b => h32(concat(col("doc_id").cast("string"), lit("#"),
          b.cast("string"))) % 18)
      def rel(i0: org.apache.spark.sql.Column) =
        (i0 % 20) - element_at(col("bh"), (blockOf(i0) + 1).cast("int"))
      def sentinel(i0: org.apache.spark.sql.Column) =
        concat(lit("<extra_"), blockOf(i0).cast("long").cast("string"), lit(">"))
      val withRel = Tables.parallelize(Tables.load(s, dir, "documents")
          .select("doc_id", "text"))
        .select(col("doc_id"), split(col("text"), " ").as("a"))
        .select(col("doc_id"), a, bh.as("bh"))
        .select(col("doc_id"), a, transform(a, (_, i0) => rel(i0)).as("rel"))
      val n = size(a)
      withRel.select(col("doc_id"), n.as("n_tokens"),
          array_join(filter(transform(a, (t, i0) =>
            when(element_at(col("rel"), i0 + 1) === 0, sentinel(i0))
              .otherwise(when(element_at(col("rel"), i0 + 1) > 0 &&
                element_at(col("rel"), i0 + 1) <= 2, lit(null)).otherwise(t))),
            x => x.isNotNull), " ").as("input_text"),
          array_join(filter(transform(a, (t, i0) =>
            when(element_at(col("rel"), i0 + 1) === 0,
              concat(sentinel(i0), lit(" "), t))
              .otherwise(when(element_at(col("rel"), i0 + 1) > 0 &&
                element_at(col("rel"), i0 + 1) <= 2, t).otherwise(lit(null)))),
            x => x.isNotNull), " ").as("target_text"),
          size(filter(col("rel"), r => r >= 0 && r <= 2)).as("n_masked"),
          size(filter(col("rel"), r => r === 0)).as("n_spans"))
        .select(col("doc_id"), col("n_tokens"), col("n_masked"), col("n_spans"),
          md5(col("input_text")).as("input_md5"),
          md5(col("target_text")).as("target_md5"))
        .orderBy("doc_id")
    },

    // UNICODE NFC NORMALIZATION — the canonicalization pass that must
    // run before ANY hash-keyed dedup: composed ("é") and decomposed
    // ("e" + U+0301) forms of the same visible string hash apart, so
    // an un-normalized corpus silently under-dedups. Spark has no
    // built-in normalizer; [[graft.functions.NormalizeText]] is a
    // native codegen'd Catalyst expression around java.text.Normalizer
    // (UDF-free, fuses into the scan stage — at 100 TB this is pure
    // scan-side work with an allocation-free fast path for
    // already-normal strings). The ASCII fixture gets a deterministic
    // suffix — decomposed for even doc_ids, precomposed for odd — so
    // both the rewrite path and the identity path are exercised, and
    // the md5 of the normalized text pins the transform byte-exactly
    // against DuckDB's nfc_normalize.
    Q("unicode_normalize",
      """WITH e AS (SELECT doc_id, text ||
        |    CASE WHEN doc_id % 2 = 0
        |         THEN ' cafe' || chr(769) || ' nai' || chr(776) || 've'
        |         ELSE ' caf' || chr(233) || ' na' || chr(239) || 've' END AS t
        |  FROM documents),
        |n AS (SELECT doc_id, t, nfc_normalize(t) AS nt FROM e)
        |SELECT doc_id, length(t) AS len_raw, length(nt) AS len_nfc,
        |  length(t) <> length(nt) AS changed, md5(nt) AS nfc_md5
        |FROM n ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val t = concat(col("text"),
        when(col("doc_id") % 2 === 0, lit(" cafe\u0301 nai\u0308ve"))
          .otherwise(lit(" caf\u00e9 na\u00efve")))
      Tables.parallelize(
          Tables.load(s, dir, "documents").select("doc_id", "text"))
        .select(col("doc_id"), t.as("t"))
        .select(col("doc_id"), col("t"),
          graft.functions.NormalizeText.nfc(col("t")).as("nt"))
        .select(col("doc_id"), length(col("t")).as("len_raw"),
          length(col("nt")).as("len_nfc"),
          (length(col("t")) =!= length(col("nt"))).as("changed"),
          md5(col("nt")).as("nfc_md5"))
        .orderBy("doc_id")
    },

    // TOKEN ENTROPY — the information-theoretic quality signal beside
    // repetition_stats' ratio heuristics: per-doc unigram Shannon
    // entropy H = ln(n) − (Σ c·ln c)/n and its [0,1] normalization by
    // ln(types). Low entropy = degenerate/repetitive text (keyword
    // stuffing, boilerplate) even when no single token dominates. The
    // Σ c·ln c inner sum is quantized to DECIMAL(20,6) so the per-doc
    // total is summation-order-independent; the remaining ops are
    // single double-steps. One tokenize + per-doc aggregate —
    // shuffles only (doc_id, token) counts, never bodies.
    Q("token_entropy",
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |uc AS (SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2),
        |st AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n, COUNT(*) AS k,
        |    CAST(SUM(c * CAST(round(ln(CAST(c AS DOUBLE)), 6) AS DECIMAL(20,6))) AS DOUBLE) AS clnc
        |  FROM uc GROUP BY doc_id)
        |SELECT doc_id, n AS n_tokens, k AS n_types,
        |  round(ln(CAST(n AS DOUBLE)) - clnc / n, 6) AS entropy,
        |  CASE WHEN k = 1 THEN 0.0
        |       ELSE round((ln(CAST(n AS DOUBLE)) - clnc / n) / ln(CAST(k AS DOUBLE)), 6) END AS norm_entropy
        |FROM st ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val uc = Tables.parallelize(Tables.load(s, dir, "documents")
          .select("doc_id", "text"))
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      val st = uc.groupBy("doc_id")
        .agg(sum(col("c")).as("n"), count(lit(1)).as("k"),
          sum(col("c") * round(log(col("c").cast("double")), 6)
            .cast(DecimalType(20, 6))).cast("double").as("clnc"))
      val h = log(col("n").cast("double")) - col("clnc") / col("n")
      st.select(col("doc_id"), col("n").as("n_tokens"), col("k").as("n_types"),
          round(h, 6).as("entropy"),
          when(col("k") === 1, lit(0.0))
            .otherwise(round(h / log(col("k").cast("double")), 6))
            .as("norm_entropy"))
        .orderBy("doc_id")
    },

    // CONTENT-DEFINED CHUNKING (the storage-dedup boundary rule of
    // LBFS/FastCDC, at token granularity) — chunk boundaries fall
    // AFTER any token whose portable hash ≡ 0 (mod 8), so boundaries
    // depend only on LOCAL content: insert a paragraph and chunk
    // hashes downstream re-synchronize, which position-based chunking
    // (chunk_documents) cannot do. Expected chunk length is the mod
    // base (8 tokens). The cumulative boundary count runs in a window
    // PARTITIONED by doc (per-doc state, 1:1 with tasks at scale —
    // never a global cumsum); chunk text re-assembles order-exactly
    // via the rank-sorted struct fold. Downstream exact dedup keys on
    // chunk_md5 — see cdc_dedup.
    Q("cdc_chunks",
      s"""$cdcCtes
         |SELECT doc_id, chunk_idx, n_tokens, chunk_md5
         |FROM chunks ORDER BY doc_id, chunk_idx""".stripMargin) { (s, dir) =>
      TextQueries.cdcChunks(s, dir).orderBy("doc_id", "chunk_idx")
    },

    // CDC CHUNK-LEVEL DEDUP CENSUS — exact sub-document dedup over the
    // content-defined chunks: which chunk contents recur, in how many
    // documents, and how much token mass the copies add. This is the
    // storage/dataset dedup ledger (identical boilerplate fragments
    // across docs collapse to one chunk hash no matter where they sit
    // in the text). Only (hash, count) pairs shuffle — chunk bodies
    // reduce to md5 at the map side.
    // CDC CHUNK NOVELTY — the per-document view of cdc_dedup's census
    // (and the sub-document analog of ngram_novelty): an occurrence is
    // DUPLICATE iff a smaller (doc_id, chunk_idx) occurrence of the
    // same chunk hash exists anywhere in the corpus — the global
    // first-occurrence rule, which StreamDedup.cdcBatch reproduces
    // incrementally (StreamingSpec pins stream==this-query parity).
    // The rank window partitions by chunk_md5 (16-byte keys, bodies
    // reduced map-side); per-doc rollup is the only other exchange.
    Q("cdc_novelty",
      s"""$cdcCtes,
         |rk AS (SELECT doc_id, chunk_idx, n_tokens, row_number() OVER (
         |    PARTITION BY chunk_md5 ORDER BY doc_id, chunk_idx) AS rn FROM chunks)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
         |  CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
         |  CAST(SUM(CASE WHEN rn > 1 THEN n_tokens ELSE 0 END) AS BIGINT) AS dup_token_mass,
         |  round(1.0 - SUM(CASE WHEN rn > 1 THEN n_tokens ELSE 0 END) * 1.0
         |    / SUM(n_tokens), 6) AS novel_frac
         |FROM rk GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("chunk_md5").orderBy("doc_id", "chunk_idx")
      TextAnalysis.chunkDupStats(TextQueries.cdcChunks(s, dir)
          .withColumn("dup", row_number().over(w) > 1))
        .select(col("doc_id"), col("n_chunks"), col("n_dup_chunks"),
          col("dup_token_mass"),
          round(lit(1.0) - col("dup_token_mass") * lit(1.0) / col("token_mass"), 6)
            .as("novel_frac"))
        .orderBy("doc_id")
    },

    Q("cdc_dedup",
      s"""$cdcCtes
         |SELECT chunk_md5, CAST(COUNT(*) AS BIGINT) AS n_copies,
         |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |  CAST(MAX(n_tokens) AS BIGINT) AS chunk_tokens,
         |  CAST((COUNT(*) - 1) * MAX(n_tokens) AS BIGINT) AS dup_token_mass
         |FROM chunks GROUP BY chunk_md5 HAVING COUNT(*) > 1
         |ORDER BY dup_token_mass DESC, chunk_md5""".stripMargin) { (s, dir) =>
      TextQueries.cdcChunks(s, dir)
        .groupBy("chunk_md5")
        .agg(count(lit(1)).as("n_copies"),
          countDistinct(col("doc_id")).as("n_docs"),
          max(col("n_tokens")).as("chunk_tokens"),
          ((count(lit(1)) - 1) * max(col("n_tokens"))).as("dup_token_mass"))
        .filter(col("n_copies") > 1)
        .orderBy(col("dup_token_mass").desc, col("chunk_md5"))
    }
  )

  /** Shared CDC chunk derivation over the documents table (see
    * cdc_chunks); the op itself lives in [[TextAnalysis.cdcChunks]].
    */
  private[queries] def cdcChunks(
      s: org.apache.spark.sql.SparkSession, dir: String) =
    TextAnalysis.cdcChunks(Tables.parallelize(
      Tables.load(s, dir, "documents").select("doc_id", "text")))

  /** ONE oracle-side definition of the CDC chunk derivation (mirrors
    * [[TextAnalysis.cdcChunks]]): boundary after any token whose
    * portable hash ≡ 0 (mod 8), per-doc boundary cumsum, order-exact
    * chunk re-assembly. `chunks` is (doc_id, chunk_idx, n_tokens,
    * chunk_md5) — both cdc queries build on it, so the boundary rule
    * cannot drift between their oracles.
    */
  private[queries] val cdcCtes: String = {
    val h = duckH32("a[i]")
    s"""WITH arr AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
       |pos AS (SELECT doc_id, unnest(generate_series(1, len(a))) AS i, a FROM arr),
       |tk AS (SELECT doc_id, i, a[i] AS tok,
       |    CASE WHEN $h % 8 = 0 THEN 1 ELSE 0 END AS bdry FROM pos),
       |ck AS (SELECT doc_id, i, tok,
       |    CAST(COALESCE(SUM(bdry) OVER (PARTITION BY doc_id ORDER BY i
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS chunk_idx
       |  FROM tk),
       |chunks AS (SELECT doc_id, chunk_idx, COUNT(*) AS n_tokens,
       |    md5(string_agg(tok, ' ' ORDER BY i)) AS chunk_md5
       |  FROM ck GROUP BY 1, 2)""".stripMargin
  }

  /** ONE oracle-side definition of the greedy packing derivation
    * (mirrors [[packBins]]): hash shard, per-shard doc_id-ordered
    * cumsum, 2048-token bins. `bins` is (doc_id, shard, n_tokens,
    * seq_id) — pack_sequences and pack_efficiency both build on it,
    * so the binning rule cannot drift between packer and audit.
    */
  private[queries] val packCtes: String = {
    val h = duckH32("CAST(doc_id AS VARCHAR)")
    s"""WITH d AS (SELECT doc_id, $h % 8 AS shard,
       |    len(string_split(text, ' ')) AS n_tokens FROM documents),
       |c AS (SELECT doc_id, shard, n_tokens,
       |    SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM d),
       |bins AS (SELECT doc_id, shard, CAST(n_tokens AS BIGINT) AS n_tokens,
       |    CAST((cum - n_tokens) // 2048 AS BIGINT) AS seq_id
       |  FROM c)""".stripMargin
  }

  /** Engine-side twin of [[packCtes]]: (doc_id, shard, n_tokens,
    * seq_id) for every document.
    */
  private[queries] def packBins(
      s: org.apache.spark.sql.SparkSession, dir: String) = {
    val d = Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        (h32(col("doc_id").cast("string")) % 8).as("shard"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.withColumn("cum", sum(col("n_tokens")).over(w))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        floor((col("cum") - col("n_tokens")) / 2048).as("seq_id"))
  }

  /** source_cap quota — binds at every fixture scale (25 docs/source
    * at sf0.01) so the gate actually exercises the cut.
    */
  val CapPerSource = 10

  /** Winnowing window: every run of WinnowW consecutive k-grams
    * contributes at least one fingerprint (the winnowing guarantee,
    * pinned in PipelineShapesSpec); expected density is 2/(WinnowW+1).
    */
  val WinnowW = 4

  /** Position-encoding base for the winnowing tie-break: positions
    * must stay below it for the packed (hash, pos) BIGINT ordering to
    * be exact. 2^21 ≈ 2M token positions per document; h32's 2^32
    * range times this stays under 2^53 — exact in any engine's int64
    * (and even a double). Re-chunk longer documents (chunk_documents)
    * before fingerprinting.
    */
  val WinnowPosBase = 2097152L

  /** dup_spans: drop fingerprints appearing in more than this many
    * (doc, pos) slots before the self-join — corpus-wide boilerplate
    * k-grams would otherwise make the khash join hot-key quadratic.
    */
  val MaxFpDocFreq = 50

  /** dup_spans: minimum aligned fingerprint hits for a reported span. */
  val MinSharedFp = 3

  /** Shared winnowing CTE chain (arr, kg, kk, win, sel) — sel is the
    * DISTINCT (doc_id, pos, khash) fingerprint set. ONE definition
    * serves winnow_fingerprints and dup_spans, mirroring
    * [[winnowFingerprints]] below.
    */
  private[queries] val winnowCtes: String = {
    val h = duckH32("a[i] || ' ' || a[i+1] || ' ' || a[i+2]")
    s"""WITH arr AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
       |kg AS (SELECT doc_id, unnest(generate_series(1, len(a)-2)) AS i, a FROM arr),
       |kk AS (SELECT doc_id, i,
       |    $h * $WinnowPosBase + ($WinnowPosBase - 1 - i) AS key FROM kg),
       |win AS (SELECT doc_id, i, min(key) OVER (PARTITION BY doc_id ORDER BY i
       |    ROWS BETWEEN ${WinnowW - 1} PRECEDING AND CURRENT ROW) AS wk FROM kk),
       |sel AS (SELECT DISTINCT doc_id,
       |  $WinnowPosBase - 1 - (wk % $WinnowPosBase) AS pos,
       |  wk // $WinnowPosBase AS khash
       |FROM win WHERE i >= $WinnowW)""".stripMargin
  }

  /** The winnowed fingerprint set (doc_id, pos, khash), unordered —
    * the Spark twin of [[winnowCtes]]'s `sel`. One generator + one
    * keyed window per doc; 1-based gram index (Spark SQL brackets are
    * 0-based).
    */
  private[queries] def winnowFingerprints(
      s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    winnowFingerprintsOf(Tables.parallelize(Tables.load(s, dir, "documents")
      .select("doc_id", "text")))

  /** [[winnowFingerprints]] over an explicit (doc_id, text) frame —
    * split out so short-document behavior is unit-testable without a
    * fixture directory.
    */
  private[graft] def winnowFingerprintsOf(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = WinnowPosBase
    // docs with < 3 tokens have no 3-grams and MUST be filtered before
    // the sequence: sequence(1, 0) is the DESCENDING array [1, 0] in
    // Spark (not empty), and its out-of-range gram indices throw under
    // ANSI mode — the DuckDB twin's generate_series(1, len-2) is empty
    // for the same docs, so the filter is also the parity rule
    val kk = docs
      .select(col("doc_id"), split(col("text"), " ").as("a"))
      .filter(size(col("a")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(a)-2), " +
          "i -> struct(i AS i, concat_ws(' ', a[i-1], a[i], a[i+1]) AS g))")).as("kg"))
      .select(col("doc_id"), col("kg.i").as("i"),
        (h32(col("kg.g")) * base + (lit(base - 1) - col("kg.i"))).as("key"))
    val win = Window.partitionBy("doc_id").orderBy("i")
      .rowsBetween(-(WinnowW - 1), Window.currentRow)
    kk.withColumn("wk", min(col("key")).over(win))
      .filter(col("i") >= WinnowW)
      .select(col("doc_id"),
        (lit(base - 1) - col("wk") % base).as("pos"),
        expr(s"wk div ${base}L").as("khash"))
      .distinct()
  }
}
