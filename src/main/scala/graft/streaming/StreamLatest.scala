package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming twin of the batch `latest_per_key` query — the KTable
  * semantics at the heart of the reference (a Kafka Streams
  * GlobalKTable is exactly "latest value per key", compacted over an
  * update stream; cf. `KafkaStreamApp.java:144-150` reading the
  * blocked-users topic as a table). The stream/table duality claim
  * (SURVEY §2 T4) says folding the update stream must reproduce the
  * batch table — StreamingSpec feeds the events fixture in randomized
  * order and checks the final snapshot equals the batch query row for
  * row.
  *
  * Implementation: a plain streaming aggregation — per key, max of
  * struct(ts, event_id, payload...). Struct comparison is
  * lexicographic by field, so the winner is the (ts DESC, event_id
  * DESC) row — the batch query's exact tie rule — regardless of
  * arrival order, and the aggregation state per key is ONE struct
  * (Spark keeps partial maxes in the state store; no history
  * buffered, no watermark needed because a table never expires its
  * keys). At scale this runs in update mode with an upsert/compaction
  * sink (foreachBatch MERGE keyed on user_id — the idempotent
  * batchId-keyed discipline of `ModerationStream`); the test uses
  * complete mode + memory sink purely to read the whole snapshot.
  */
object StreamLatest {

  case class KV(user_id: Long, event_id: Long, ts: Timestamp,
                event_type: String, value: Double)

  def latest(events: Dataset[KV]): DataFrame =
    events.groupBy(col("user_id"))
      .agg(max(struct(col("ts"), col("event_id"),
        col("event_type"), col("value"))).as("m"))
      .select(col("user_id"), col("m.event_id").as("event_id"),
        col("m.event_type").as("event_type"), col("m.value").as("value"))
}
