package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (north-star
  * extension set): language-ID heuristic, quality scoring, token
  * counting, document fingerprinting. All pure column expressions —
  * codegen'd, no UDFs, no shuffle beyond the caller's aggregation.
  */
object TextAnalysis {

  /** Marker-token profiles for the n-gram/stopword language heuristic.
    * (The corpus is synthetic word soup, so profiles are fixed
    * in-vocabulary markers; the operator machinery — per-language
    * scoring + deterministic argmax — is what transfers to real data.)
    */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "key"),
    "es" -> Seq("data", "table", "row"),
    "de" -> Seq("join", "merge", "group"),
    "fr" -> Seq("filter", "sort", "window"),
    "zh" -> Seq("vector", "hash", "batch"))

  /** Occurrences of `word` as a whole token. */
  def tokenOccurrences(text: Column, word: String): Column =
    size(filter(split(text, " "), t => t === word))

  /** Per-row multiset histogram of a string-array column: one
    * struct(tok, cnt BIGINT) per distinct element, computed LOCALLY
    * (sort + run-length encode over the array). When the row carries a
    * unique id, `explode(histogram(arr))` produces the exact multiset
    * `explode(arr).groupBy(id, tok).count()` would — but the
    * corpus-wide exchange that the groupBy needs (every n-gram
    * occurrence hashed across the cluster) never exists: the histogram
    * is a narrow map-side expression and downstream per-id aggregates
    * partial-aggregate against whatever partitioning the scan already
    * has (guide §2.3/2.4 — aggregate before you shuffle, then don't
    * shuffle at all). Measured r14: see OPTIMIZATION_r14.md.
    */
  def histogram(arr: Column): Column = {
    // EVALUATE-ONCE BINDING: interpreted HOF lambdas re-evaluate any
    // outer expression subtree they reference once PER ELEMENT (no
    // common-subexpression elimination inside lambda bodies), so a
    // naive `element_at(sort_array(arr), i)` inside the run-detection
    // filter would re-sort — and re-build — the whole array k times
    // per row (measured r14: 73 s for trigram_backoff at sf0.1 vs
    // 2.2 s with the bindings). `transform(array(x), v -> body)`
    // evaluates x exactly once and binds it as a lambda VALUE, so each
    // intermediate (the sorted array, the run-start positions) is
    // computed once per row.
    def bind(x: Column)(body: Column => Column): Column =
      element_at(transform(array(x), body), 1)
    bind(arr) { a =>
      val m = size(a)
      val rle = bind(sort_array(a)) { srt =>
        // run starts: positions whose element differs from its
        // predecessor; each run ends where the next begins (m+1 last)
        bind(filter(sequence(lit(1), greatest(m, lit(1))), i =>
          i === 1 || element_at(srt, i) =!= element_at(srt, i - 1))) { sts =>
          zip_with(sts,
            concat(slice(sts, lit(2), greatest(size(sts) - 1, lit(0))),
              array(m + 1)),
            (st, en) => struct(element_at(srt, st).as("tok"),
              (en - st).cast("long").as("cnt")))
        }
      }
      // sequence() counts DOWN for m < 1 (same DuckDB generate_series
      // parity note as Dedup.shingles), hence the empty-array guard
      when(m >= 1, rle)
        .otherwise(array().cast("array<struct<tok:string,cnt:bigint>>"))
    }
  }

  /** Max in-array frequency of any element — the gopher "top token
    * fraction" numerator. Via [[histogram]] (O(k log k) sort + RLE per
    * row) instead of the old `transform(array_distinct(a), w ->
    * size(filter(a, t -> t = w)))`, which is O(types × tokens) per row
    * AND re-evaluates the array argument once per distinct element
    * (interpreted HOF lambdas have no CSE — see [[histogram]]).
    * Identical value: the max over distinct tokens of their in-array
    * count IS the max run length of the sorted array.
    */
  def maxTokenCount(arr: Column): Column =
    array_max(transform(histogram(arr), e => e.getField("cnt")))

  /** Per-language marker score: total marker-token occurrences. */
  def langScore(text: Column, markers: Seq[String]): Column =
    markers.map(tokenOccurrences(text, _)).reduce(_ + _)

  /** Deterministic argmax over profile scores (priority = profile
    * order on ties). Scores must be the columns produced by
    * [[langScore]] aliased s_<lang>.
    */
  def predictedLang(scoreCols: Seq[(String, Column)]): Column =
    scoreCols.zipWithIndex.foldRight(lit(scoreCols.last._1)) {
      case (((lang, score), i), elseCol) =>
        val rest = scoreCols.drop(i + 1)
        if (rest.isEmpty) elseCol
        else when(rest.map(r => score >= r._2).reduce(_ && _), lit(lang))
          .otherwise(elseCol)
    }

  def wsTokenCount(text: Column): Column = size(split(text, " "))

  /** BPE-ish subword segmentation count: alpha runs, digit runs, and
    * single non-alphanumeric glyphs.
    */
  def bpeishTokenCount(text: Column): Column =
    regexp_count(text, lit("[a-z]+|[0-9]+|[^a-z0-9 ]"))

  /** Simple quality score in [0,1]: length saturation × (1 − stopword
    * ratio). Deterministic double math (fixed expression shape).
    */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val n = wsTokenCount(text)
    val stops = langScore(text, stopwords)
    round(least(lit(1.0), n * lit(1.0) / 100.0)
      * (lit(1.0) - stops * lit(1.0) / n), 6)
  }

  /** Content-defined chunking (LBFS/FastCDC boundary rule at token
    * granularity): a chunk ends AFTER any token whose portable hash
    * ≡ 0 (mod `modBase`), so boundaries depend only on local content
    * and re-synchronize after insertions — the property positional
    * chunking lacks. Input needs (doc_id, text); returns one row per
    * (doc_id, chunk_idx) with the chunk's token count and md5. The
    * boundary cumsum window is PARTITIONED by doc (per-doc streaming
    * state at scale, never a global cumsum); chunk text re-assembles
    * order-exactly via the rank-sorted struct fold.
    */
  /** Per-document duplicate-chunk rollup over [[cdcChunks]] output
    * carrying a boolean `dup` column: (doc_id, n_chunks,
    * n_dup_chunks, dup_token_mass, token_mass). ONE definition of the
    * stats algebra serves the batch cdc_novelty query and the
    * streaming [[graft.streaming.StreamDedup.cdcBatch]] loop — their
    * advertised parity is structural, not coincidental.
    */
  def chunkDupStats(marked: DataFrame): DataFrame =
    marked.groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("dup"), 1L).otherwise(0L)).as("n_dup_chunks"),
        sum(when(col("dup"), col("n_tokens")).otherwise(lit(0L)))
          .as("dup_token_mass"),
        sum(col("n_tokens")).as("token_mass"))

  def cdcChunks(docs: DataFrame, modBase: Int = 8): DataFrame = {
    import graft.functions.PortableHash.h32
    val pos = docs
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("i0", "tok")))
      .select(col("doc_id"), (col("i0") + 1).as("i"), col("tok"),
        when(h32(col("tok")) % modBase === 0, 1L).otherwise(0L).as("bdry"))
    val w = Window.partitionBy("doc_id").orderBy("i")
      .rowsBetween(Window.unboundedPreceding, -1)
    pos.withColumn("chunk_idx", coalesce(sum(col("bdry")).over(w), lit(0L)))
      .groupBy("doc_id", "chunk_idx")
      .agg(count(lit(1)).as("n_tokens"),
        md5(array_join(
          transform(array_sort(collect_list(struct(col("i"), col("tok")))),
            x => x.getField("tok")), " ")).as("chunk_md5"))
  }
}
