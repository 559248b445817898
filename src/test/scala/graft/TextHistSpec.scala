package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, TextAnalysis}

/** Pins the round-14 map-side histogram operators against the
  * dataflow shapes they replaced:
  *
  *  - TextAnalysis.histogram(arr) must produce, per row, the exact
  *    multiset that explode(arr).groupBy(id, tok).count() produces —
  *    the equivalence that lets per-document n-gram counts skip the
  *    corpus-wide (doc, n-gram) exchange (lang_id_nb,
  *    trigram_backoff, kneser_ney_bigram score sides).
  *  - TextAnalysis.maxTokenCount(arr) must equal the old
  *    O(types × tokens) distinct×filter scan (the gopher topf
  *    numerator) on every document.
  *  - Dedup.shingles must be unchanged by its evaluate-once binding
  *    (same arrays, incl. the <w-token empty-array guard).
  */
class TextHistSpec extends SparkSpec {

  private def docs = Tables.load(spark, sf001, "documents")
    .select("doc_id", "text")

  test("histogram == explode + groupBy(id, tok).count, corpus-wide") {
    val viaHist = docs
      .select(col("doc_id"),
        explode(TextAnalysis.histogram(split(col("text"), " "))).as("e"))
      .select(col("doc_id"), col("e.tok").as("tok"), col("e.cnt").as("n"))
    val viaGroup = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("n"))
    assert(viaHist.exceptAll(viaGroup).isEmpty && viaGroup.exceptAll(viaHist).isEmpty)
  }

  test("histogram handles empty, single-run and all-distinct arrays") {
    import spark.implicits._
    val rows = Seq(
      (1L, Seq.empty[String]),
      (2L, Seq("x")),
      (3L, Seq("x", "x", "x")),
      (4L, Seq("c", "a", "b")),
      (5L, Seq("b", "a", "b", "a", "b"))).toDF("id", "arr")
    val got = rows
      .select(col("id"), TextAnalysis.histogram(col("arr")).as("h"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(e =>
          (e.getString(0), e.getLong(1))).toList).toMap
    assert(got(1L) == Nil)
    assert(got(2L) == List(("x", 1L)))
    assert(got(3L) == List(("x", 3L)))
    assert(got(4L) == List(("a", 1L), ("b", 1L), ("c", 1L)))
    assert(got(5L) == List(("a", 2L), ("b", 3L)))
  }

  test("maxTokenCount == the distinct x filter scan it replaced") {
    val a = split(col("text"), " ")
    val oldForm = array_max(transform(array_distinct(a),
      w => size(filter(a, t => t === w)))).cast("long")
    val bad = docs
      .select(TextAnalysis.maxTokenCount(a).as("nu"), oldForm.as("ol"))
      .filter(col("nu") =!= col("ol")).count()
    assert(bad == 0L)
  }

  test("shingles unchanged by the evaluate-once binding (incl. short docs)") {
    import spark.implicits._
    val rows = Seq((1L, "a b c d"), (2L, "a b"), (3L, "a"), (4L, "x y z"))
      .toDF("doc_id", "text")
    val got = rows.select(col("doc_id"),
        Dedup.shingles(col("text"), 3).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(got(1L) == List("a b c", "b c d"))
    assert(got(2L) == Nil)
    assert(got(3L) == Nil)
    assert(got(4L) == List("x y z"))
  }
}
