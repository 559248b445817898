package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset

/** Streaming twin of the batch `markov_transitions` query: per-user
  * event-adjacency emission (prev_type -> next_type) in exact
  * event-time order under out-of-order arrival — each adjacency of a
  * user's ordered history appends exactly once (StreamingSpec feeds
  * the fixture in randomized order and checks the aggregated matrix
  * equals the batch query's).
  *
  * Built on [[OrderedReplay]]: the fold state is ONE string — the
  * user's previous event type — because replay order reduces
  * "adjacent in the user's history" to "consecutive in the fold".
  * The transition MATRIX itself is a downstream rollup of this
  * append stream (count by (prev, next) — batch over the sink, or a
  * streaming aggregation in update mode); keeping the heavy ordered
  * part in the bounded-state replay and the counting in a plain
  * aggregate is what scales: state per user = one string + the
  * in-watermark buffer, never the history.
  */
object StreamTransitions {

  case class SeqEvent(user_id: Long, event_id: Long, ts: Timestamp,
                      event_type: String)

  case class Adjacency(user_id: Long, prev_type: String, next_type: String)

  def adjacencies(events: Dataset[SeqEvent],
                  watermarkDelay: String = "1 hour"): Dataset[Adjacency] = {
    import events.sparkSession.implicits._
    OrderedReplay.replay[SeqEvent, String, String, Adjacency](
      events, "ts", watermarkDelay, _.user_id,
      e => Some((e.ts, e.event_id, e.event_type)),
      zero = "") { (user, prev, _, ty) =>
      (ty, if (prev.isEmpty) Nil else List(Adjacency(user, prev, ty)))
    }
  }
}
