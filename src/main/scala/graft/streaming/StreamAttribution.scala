package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset

/** Streaming twin of the batch `last_touch_attribution` query: each
  * user's most recent click-or-view rides as ONE small state value,
  * and every purchase emits an attribution row the moment ordered
  * replay proves nothing earlier can still arrive.
  *
  * Built on [[OrderedReplay]]: the fold state is the last touch type
  * (encoded as a byte-sized int), purchases emit (touch, cents) rows,
  * and every other event type is dropped BEFORE state. Because replay
  * order equals event-time order, "most recent prior touch" is simply
  * the current state at the purchase — the same as-of semantics the
  * batch query gets from [[graft.ops.AsOf]], with the same tie rule
  * (a touch at the purchase's exact timestamp but lower event_id
  * counts; later ids do not). StreamingSpec pins the aggregated
  * census equal to the batch query on the sealed prefix under
  * randomized arrival.
  *
  * State per user: one int + the watermark-bounded buffer — nothing
  * grows with history, which is what lets the attribution run forever.
  */
object StreamAttribution {

  case class TouchEvent(user_id: Long, event_id: Long, ts: Timestamp,
                        event_type: String, cents: Long)

  case class Attribution(user_id: Long, ts: Timestamp, touch: String,
                         cents: Long)

  /** 0 = no touch yet; 1 = click; 2 = view. */
  private val TouchCode = Map("click" -> 1, "view" -> 2)
  private val CodeTouch = Map(1 -> "click", 2 -> "view")

  def attribute(events: Dataset[TouchEvent],
                watermarkDelay: String = "1 hour"): Dataset[Attribution] = {
    import events.sparkSession.implicits._
    OrderedReplay.replay[TouchEvent, Int, (Int, Long), Attribution](
      events, "ts", watermarkDelay, _.user_id,
      e => e.event_type match {
        case "click" | "view" =>
          Some((e.ts, e.event_id, (TouchCode(e.event_type), 0L)))
        case "purchase" => Some((e.ts, e.event_id, (0, e.cents)))
        case _ => None
      },
      zero = 0) { (user, lastTouch, us, p) =>
      val (code, cents) = p
      if (code > 0) (code, Nil) // a touch: update state, emit nothing
      else (lastTouch, List(Attribution(user, OrderedReplay.fromUs(us),
        CodeTouch.getOrElse(lastTouch, "none"), cents)))
    }
  }
}
