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
