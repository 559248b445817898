package graft.ops

import org.apache.spark.sql.Column
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
}
