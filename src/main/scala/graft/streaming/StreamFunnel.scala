package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset

/** Streaming twin of the batch `funnel_steps` query: per-user ordered
  * conversion funnel (signup -> view -> click -> purchase), emitting
  * one Transition row the first time a user reaches each stage —
  * exactly once, equal to the batch query on any sealed prefix for
  * any in-watermark arrival order (StreamingSpec randomizes arrival).
  *
  * Built on [[OrderedReplay]] (watermark-sealed ordered replay): the
  * fold state is ONE int — the highest stage reached — because
  * replay order makes "next-stage event strictly after the current
  * stage's event" a simple type match. Stage-irrelevant events are
  * dropped before state, users with no progress store nothing, and
  * completed funnels keep a one-int tombstone so post-completion
  * arrivals can never re-emit (see OrderedReplay's lifecycle
  * contract for all three guarantees).
  */
object StreamFunnel {

  case class FunnelEvent(user_id: Long, event_id: Long, ts: Timestamp,
                         event_type: String)

  case class Transition(user_id: Long, stage: Int, ts: Timestamp)

  val StageTypes: Seq[String] = Seq("signup", "view", "click", "purchase")

  def transitions(events: Dataset[FunnelEvent],
                  watermarkDelay: String = "1 hour"): Dataset[Transition] = {
    import events.sparkSession.implicits._
    val idx: Map[String, Int] = StageTypes.zipWithIndex.toMap
    OrderedReplay.replay[FunnelEvent, Int, Int, Transition](
      events, "ts", watermarkDelay, _.user_id,
      e => idx.get(e.event_type).map(i => (e.ts, e.event_id, i)),
      zero = 0,
      finished = _ == StageTypes.size) { (user, stage, us, ty) =>
      if (ty == stage)
        (stage + 1, List(Transition(user, stage + 1, OrderedReplay.fromUs(us))))
      else (stage, Nil)
    }
  }
}
