package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming deduplication — the streaming twin of the batch dedup
  * family (`graft.ops.Dedup`): keep the first arrival per key, with
  * state bounded by the watermark.
  *
  * Scale contract: unbounded `dropDuplicates` state grows with
  * distinct-keys-ever-seen — at 100 TB/day that is a state-store OOM
  * by design. `dropDuplicatesWithinWatermark` drops a key's state once
  * the watermark passes its event time + delay, so state is bounded by
  * (arrival rate x watermark horizon) regardless of total corpus size.
  * The trade: a duplicate arriving AFTER the horizon is re-emitted —
  * the standard at-least-once-window dedup contract (downstream
  * idempotent sinks absorb it, see ModerationStream's foreachBatch).
  */
object StreamDedup {

  /** First arrival per `keys`, state bounded by `delay` past the
    * watermark on `eventTimeCol`.
    */
  def firstPerKey(
      df: DataFrame,
      eventTimeCol: String,
      delay: String,
      keys: Seq[String]): DataFrame =
    df.withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark(keys)
}
