package graft

import org.apache.spark.sql.functions._

import graft.functions.{FreqItemsAgg, TopKAgg}
import graft.ops.{Similarity, Skew}
import graft.plans.TopKPerGroup

/** Empty-input and degenerate-shape behavior: operators must return
  * empty/identity results, not throw — at 100 TB a partition-pruned
  * read or an over-selective filter routinely hands an operator zero
  * rows.
  */
class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  private def emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")

  test("FreqItemsAgg over an empty frame yields one row with an empty list") {
    val out = emptyDocs.agg(FreqItemsAgg(col("text"), 8).as("fi"))
      .select(size(col("fi"))).as[Int].collect()
    assert(out.toSeq === Seq(0))
  }

  test("TopKPerGroup over an empty frame yields zero rows") {
    val out = TopKPerGroup(emptyDocs, Seq("doc_id"),
      Seq(("text", false)), 3)
    assert(out.count() === 0)
    assert(out.columns.toSeq === Seq("doc_id", "text", "rn"))
  }

  test("saltedJoin with an empty dim: inner empty, left_outer keeps big side") {
    val big = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    val dim = Seq.empty[(Long, String)].toDF("k", "d")
    assert(Skew.saltedJoin(big, dim, "k", 4, "inner").count() === 0)
    val lo = Skew.saltedJoin(big, dim, "k", 4, "left_outer")
    assert(lo.count() === 2)
    assert(lo.filter(col("d").isNull).count() === 2)
  }

  test("kmeansStep on an empty frame keeps every centroid, zero counts") {
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val init = Similarity.centroidCoefs(3, 4)
    val (next, counts) = Similarity.kmeansStep(empty, "embedding", init)
    assert(counts.toSeq === Seq(0L, 0L, 0L))
    assert(next.map(_.toSeq).toSeq === init.map(_.toSeq).toSeq)
  }

  test("round-7 curation ops on empty frames: empty results, loud NB train") {
    import graft.ops.{Dedup, TextAnalysis}
    val emptyLangDocs = Seq.empty[(Long, String, String)]
      .toDF("doc_id", "lang", "text")
    assert(Dedup.containmentPairs(emptyLangDocs, maxDf = 50).count() === 0)
    assert(TextAnalysis.cdcChunks(emptyDocs).count() === 0)
    val (app, stats) = graft.streaming.StreamDedup.cdcBatch(
      emptyDocs, Seq.empty[(Long, Long, Long, String)]
        .toDF("doc_id", "chunk_idx", "n_tokens", "chunk_md5"))
    assert(app.count() === 0 && stats.count() === 0)
    // empty windowed-quantile input: zero windows, not a crash
    val emptyEv = Seq.empty[(java.sql.Timestamp, Double)].toDF("ts", "value")
    assert(graft.streaming.WindowedAggs.windowedQuantiles(
      emptyEv, "value", 64, Seq(0.5)).count() === 0)
    // an empty NB training set must fail LOUDLY at train time, not as
    // an opaque crash when the first document is scored
    val e = intercept[IllegalArgumentException](
      graft.streaming.StreamClassify.trainNb(
        emptyLangDocs.select("lang", "text")))
    assert(e.getMessage.contains("empty"))
  }

  test("TopKAgg over an empty group set returns no rows (not a crash)") {
    val out = emptyDocs
      .groupBy("doc_id")
      .agg(TopKAgg(col("doc_id").cast("double"), col("doc_id"),
        col("doc_id"), 3).as("t"))
    assert(out.count() === 0)
  }

  test("scoreLabelOf handles empty frames and degenerate texts") {
    import graft.queries.EvalQueries
    assert(EvalQueries.scoreLabelOf(emptyDocs).count() === 0)
    assert(EvalQueries.calibrationBins(
      EvalQueries.scoreLabelOf(emptyDocs)).count() === 0)
    // empty string still splits to one (empty) token; a one-word doc
    // exercises every ratio's n=1 denominator — neither may throw or
    // yield a null score
    val weird = Seq((1L, ""), (2L, "word")).toDF("doc_id", "text")
    val out = EvalQueries.scoreLabelOf(weird).collect()
    assert(out.length === 2)
    assert(out.forall(r => !r.isNullAt(1) && !r.isNullAt(2)))
  }

  test("lpaLabels: empty graph is empty; a two-node component converges to the min label") {
    import graft.queries.DedupQueries
    val noEdges = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(DedupQueries.lpaLabels(noEdges).count() === 0)
    // the self-vote regression guard: synchronous LPA WITHOUT it
    // oscillates on a pair forever and never merges the component
    val pair = Seq((10L, 20L), (20L, 10L)).toDF("a", "b")
    val got = DedupQueries.lpaLabels(pair)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(10L -> 10L, 20L -> 10L),
      s"pair did not converge to the min label: $got")
  }
}
