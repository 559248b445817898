package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset

/** Streaming twin of the batch `scd2_intervals` query: per-user
  * change-data-capture, emitting one StateChange row each time a
  * user's event_type differs from their previous (event-time-ordered)
  * one — the append-only feed from which an SCD2 history table
  * derives (each change closes its predecessor's interval; the batch
  * query's `lead` is exactly that join done after the fact).
  *
  * Built on [[OrderedReplay]]: change detection is order-sensitive
  * (A,B arriving as B,A must still emit A then B), so events replay
  * in sealed (ts, id) order and the fold state is just the previous
  * event_type. Output over any sealed prefix equals the batch
  * query's change rows on that prefix. Event types must be non-empty
  * strings (the empty string is the pre-first-event zero state).
  */
object StreamScd2 {

  case class ScdEvent(user_id: Long, event_id: Long, ts: Timestamp,
                      event_type: String)

  case class StateChange(user_id: Long, event_type: String,
                         valid_from: Timestamp)

  def changes(events: Dataset[ScdEvent],
              watermarkDelay: String = "1 hour"): Dataset[StateChange] = {
    import events.sparkSession.implicits._
    OrderedReplay.replay[ScdEvent, String, String, StateChange](
      events, "ts", watermarkDelay, _.user_id,
      e => Some((e.ts, e.event_id, e.event_type)),
      zero = "") { (user, prev, us, tpe) =>
      if (tpe == prev) (prev, Nil)
      else (tpe, List(StateChange(user, tpe, OrderedReplay.fromUs(us))))
    }
  }
}
