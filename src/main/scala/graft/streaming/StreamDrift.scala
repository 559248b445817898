package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming drift gate — the streaming twin of `ks_drift`: every
  * arriving micro-batch is two-sample-KS-tested against a REFERENCE
  * length distribution trained on the accepted corpus, and batches
  * that drift past the threshold are flagged before they pollute the
  * mix. The production split mirrors DSIR's train/score shape
  * ([[StreamSelect]]):
  *
  *  1. TRAIN (batch, rare): reduce the reference corpus to its
  *     token-length ECDF — a census-sized vector (distinct lengths),
  *     the same bounded-collect contract as the DSIR λ table and the
  *     k-means codebooks.
  *  2. GATE (streaming, forever): per micro-batch, aggregate the
  *     batch's length census DISTRIBUTED (one groupBy over the
  *     batch), collect the census (bounded by the same contract),
  *     and compute sup|G−F| in plain JVM arithmetic over the union
  *     support. One number per batch; no state store, no watermark —
  *     the reference rides as a broadcast-sized constant.
  *
  * KS here is the gate statistic, not an inference: the threshold is
  * an operating point (e.g. 0.15), chosen against the reference's
  * own batch-to-batch variation.
  */
object StreamDrift {

  /** A step ECDF: sorted distinct support values with cumulative
    * fractions. `at(x)` = F(x) (right-continuous).
    */
  final case class Ecdf(xs: Array[Int], fs: Array[Double]) {
    def at(x: Int): Double = {
      var lo = 0; var hi = xs.length // first index with xs(i) > x
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (xs(mid) <= x) lo = mid + 1 else hi = mid
      }
      if (lo == 0) 0.0 else fs(lo - 1)
    }
  }

  private def censusOf(docs: DataFrame): Array[(Int, Long)] =
    docs.select(size(split(col("text"), " ")).as("x"))
      .groupBy("x").agg(count(lit(1)).as("cnt"))
      .orderBy("x")
      .collect().map(r => (r.getInt(0), r.getLong(1)))

  private def ecdfOf(census: Array[(Int, Long)]): Ecdf = {
    val n = census.map(_._2).sum.toDouble
    var cum = 0L
    val fs = census.map { case (_, c) => cum += c; cum / n }
    Ecdf(census.map(_._1), fs)
  }

  /** TRAIN: the reference ECDF. The census collect is bounded by the
    * distinct-length count (hundreds), not the corpus — the same
    * contract every trained broadcast artifact here relies on.
    */
  def referenceEcdf(docs: DataFrame): Ecdf = ecdfOf(censusOf(docs))

  /** Two-sample KS between a batch census and the reference: the sup
    * is attained at a jump point of either step function, so scan the
    * union support.
    */
  private[graft] def ksAgainst(ref: Ecdf, census: Array[(Int, Long)]): Double = {
    if (census.isEmpty) return 0.0
    val g = ecdfOf(census)
    val union = (ref.xs ++ g.xs).distinct.sorted
    var ks = 0.0
    for (x <- union) {
      val d = math.abs(g.at(x) - ref.at(x))
      if (d > ks) ks = d
    }
    ks
  }

  /** GATE: one audit row for this micro-batch. The heavy half (the
    * census aggregation) runs distributed; only the census itself is
    * collected.
    */
  def batchAudit(batch: DataFrame, batchId: Long, ref: Ecdf,
                 threshold: Double): (Long, Long, Double, Boolean) = {
    val census = censusOf(batch)
    val n = census.map(_._2).sum
    val ks = ksAgainst(ref, census)
    (batchId, n, ks, ks > threshold)
  }

  /** Streaming wiring: checkpointed foreachBatch appending one audit
    * row per micro-batch through `sink` — compose with an alerting or
    * quarantine step downstream.
    */
  def gate(docs: DataFrame, ref: Ecdf, threshold: Double,
           checkpointDir: String)(
           sink: ((Long, Long, Double, Boolean)) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .foreachBatch((b: DataFrame, id: Long) =>
        sink(batchAudit(b, id, ref, threshold)))
      .option("checkpointLocation", checkpointDir)
}
