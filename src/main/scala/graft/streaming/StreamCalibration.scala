package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.queries.EvalQueries

/** Streaming calibration monitor — the streaming twin of
  * `score_calibration`: the quality scorer's reliability census
  * maintained continuously over an unbounded document stream, so a
  * drifting score/label relationship (the model says 0.8, the rules
  * say 40% keep) surfaces while the corpus is still arriving instead
  * of in a post-hoc batch audit.
  *
  * Shape: the per-row (score, label) projection is STATELESS (the
  * exact expressions `score_calibration` uses — shared via
  * [[EvalQueries.scoreLabelOf]], so twin parity holds by construction
  * rather than by re-implementation), and the census is a standard
  * streaming aggregation whose state is 11 bin rows — constant-size
  * state at any stream length, no watermark needed (the census is
  * cumulative by design). The snapshot after any prefix equals the
  * batch query on that prefix, pinned under randomized arrival in
  * StreamingSpec.
  *
  * Reference grounding: the reference's stateful transform surface
  * (`/root/reference/src/main/java/ru/kafka/KafkaStreamApp.java:103-126`)
  * carries per-record state through a processor; here the analogous
  * monitor is declared as a streaming aggregation and Spark owns the
  * state store.
  */
object StreamCalibration {

  /** Reliability bins over a streaming (doc_id, text) frame. Use
    * outputMode Complete (the census is a full-table snapshot).
    */
  def bins(docs: DataFrame): DataFrame =
    EvalQueries.calibrationBins(EvalQueries.scoreLabelOf(docs))
}
