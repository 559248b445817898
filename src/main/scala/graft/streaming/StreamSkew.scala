package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming key-skew gate — the streaming twin of `key_skew_gini`:
  * every micro-batch's shuffle-key distribution is summarized (Gini +
  * top-10 share) and flagged when concentration crosses the
  * threshold, BEFORE the batch reaches a keyed stage that would
  * serialize on the hot key. Same production split as StreamDrift:
  * the census aggregation runs DISTRIBUTED per batch; only the
  * key-count census (one row per key in the batch) is collected for
  * the rank arithmetic — the bounded-collect contract every gate in
  * this package relies on.
  *
  * Gini uses the same rank formulation as the batch query
  * (2·Σi·cᵢ/(n·Σc) − (n+1)/n over counts ranked ascending, ties by
  * key), so gating decisions and the batch audit can never disagree
  * on the same data — pinned in StreamingSpec.
  */
object StreamSkew {

  /** One audit row for this micro-batch:
    * (batchId, nKeys, total, top10Share, gini, flagged).
    */
  def batchAudit(batch: DataFrame, batchId: Long, keyCol: String,
                 giniThreshold: Double): (Long, Long, Long, Double, Double, Boolean) = {
    val census = batch.groupBy(keyCol).agg(count(lit(1)).as("c"))
      .orderBy(col("c"), col(keyCol))
      .select(col("c")).collect().map(_.getLong(0))
    if (census.isEmpty) return (batchId, 0L, 0L, 0.0, 0.0, false)
    val n = census.length.toLong
    val total = census.sum
    var ic = 0L
    var i = 1L
    census.foreach { c => ic += i * c; i += 1 }
    val gini = 2.0 * ic / n / total - (n + 1.0) / n
    val top10 = census.takeRight(10).sum.toDouble / total
    (batchId, n, total, top10, gini, gini > giniThreshold)
  }

  /** Streaming wiring: checkpointed foreachBatch appending one audit
    * row per micro-batch through `sink` (the StreamDrift.gate shape).
    */
  def gate(events: DataFrame, keyCol: String, giniThreshold: Double,
           checkpointDir: String)(
           sink: ((Long, Long, Long, Double, Double, Boolean)) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream
      .foreachBatch((b: DataFrame, id: Long) =>
        sink(batchAudit(b, id, keyCol, giniThreshold)))
      .option("checkpointLocation", checkpointDir)
}
