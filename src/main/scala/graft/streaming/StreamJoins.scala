package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** Stream-stream correlation (SURVEY §2.3 "absent join types" — a §7
  * extension; the reference only ever joins a stream against a
  * replicated table). Spark's stream-stream join keeps both sides in
  * the state store; the WATERMARK plus the INTERVAL bound are what make
  * that state bounded — without them the store grows forever, the
  * classic 100 TB streaming failure mode.
  */
object StreamJoins {

  /** Inner-join `left` events to `right` events of the same key with
    * `right.ts` in `[left.ts - lookback, left.ts]` (e.g. errors to the
    * clicks that preceded them). Both inputs carry the key under the
    * SAME name `key`; every other column must be disjoint between the
    * two sides. The right side's key is renamed to `<key>_r` in the
    * output. State expiry: each side's rows are dropped once the other
    * side's watermark passes the interval bound.
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   key: String, leftTs: String, rightTs: String,
                   lookbackMinutes: Int = 30,
                   watermarkDelay: String = "1 hour"): DataFrame = {
    val l = left.withWatermark(leftTs, watermarkDelay)
    val r = right.withColumnRenamed(key, s"${key}_r")
      .withWatermark(rightTs, watermarkDelay)
    l.join(r,
      expr(s"""$key = ${key}_r AND
              |$rightTs >= $leftTs - INTERVAL $lookbackMinutes MINUTES AND
              |$rightTs <= $leftTs""".stripMargin),
      "inner")
  }

  /** LEFT OUTER interval join — [[intervalJoin]] with the unmatched
    * left rows EMITTED (null-padded) once the watermark proves no
    * match can still arrive. This is the streaming "did anything
    * precede this error?" shape: inner joins silently drop the
    * no-antecedent case, which is usually the interesting one. The
    * null-padded row cannot be produced eagerly — a match may still
    * be in flight — so Spark holds the left row in state and emits
    * it only after the right watermark passes `leftTs`; that delayed
    * emission (correct, not late) is pinned in StreamingSpec by
    * advancing the watermark and watching the null row appear. Same
    * bounded-state argument as the inner form: watermark + interval
    * bound expire both sides.
    */
  def leftOuterIntervalJoin(left: DataFrame, right: DataFrame,
                            key: String, leftTs: String, rightTs: String,
                            lookbackMinutes: Int = 30,
                            watermarkDelay: String = "1 hour"): DataFrame = {
    val l = left.withWatermark(leftTs, watermarkDelay)
    val r = right.withColumnRenamed(key, s"${key}_r")
      .withWatermark(rightTs, watermarkDelay)
    l.join(r,
      expr(s"""$key = ${key}_r AND
              |$rightTs >= $leftTs - INTERVAL $lookbackMinutes MINUTES AND
              |$rightTs <= $leftTs""".stripMargin),
      "left_outer")
  }

  /** Streaming twin of the batch `range_join_pairs` query: a FORWARD
    * interval SELF-join — pairs of same-key events with the right
    * side's timestamp in `[left.ts, left.ts + window]` and the left
    * id strictly smaller. Pass the same streaming frame as both
    * conceptual sides; the two watermarked aliases Spark needs are
    * derived here. Each matched pair is emitted exactly once in
    * append mode regardless of arrival order (stream-stream join
    * state holds both sides until the opposite watermark passes the
    * interval bound — the same watermark+bound pair that keeps state
    * finite at scale; parity under randomized arrival is pinned in
    * StreamingSpec).
    */
  def forwardPairJoin(events: DataFrame, key: String, tsCol: String,
                      idCol: String, windowMinutes: Int,
                      watermarkDelay: String): DataFrame = {
    val l = events
      .select(events(key), events(tsCol).as("ts_l"), events(idCol).as("id_l"))
      .withWatermark("ts_l", watermarkDelay)
    val r = events
      .select(events(key).as(s"${key}_r"), events(tsCol).as("ts_r"),
        events(idCol).as("id_r"))
      .withWatermark("ts_r", watermarkDelay)
    l.join(r,
      expr(s"""$key = ${key}_r AND
              |ts_r >= ts_l AND
              |ts_r <= ts_l + INTERVAL $windowMinutes MINUTES AND
              |id_l < id_r""".stripMargin),
      "inner")
  }
}
