package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time sessionization with custom keyed state — the streaming
  * twin of the batch `sessionize` query (gaps-and-islands over a
  * 30-minute inactivity gap) and the SURVEY §2.6 T6 state-store
  * surface exercised with MUTABLE per-key state (the reference's
  * stores are read-only; this is the §7 extension).
  *
  * Design: one open session per key lives in [[GroupState]]; events of
  * a micro-batch are folded in event-time order, closing a session
  * in-stream whenever the gap is exceeded by actual data; quiescent
  * sessions are closed by an event-time TIMEOUT once the watermark
  * passes `last + gap` — so results are identical to the batch
  * gaps-and-islands computation for any in-watermark arrival order.
  * State size is O(1) per active key (three longs), the shape that
  * holds at 100 TB/day key cardinalities; expired keys are removed.
  */
object EventTimeSessions {

  case class SessionEvent(user_id: Long, ts: Timestamp)

  /** The open (not yet emitted) session of one key; times in epoch ms. */
  case class OpenSession(start: Long, last: Long, n: Long)

  case class Session(user_id: Long, session_start: Timestamp,
                     session_end: Timestamp, n_events: Long)

  def sessions(events: Dataset[SessionEvent],
               gapMinutes: Int = 30,
               watermarkDelay: String = "1 hour"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L

    def close(user: Long, s: OpenSession): Session =
      Session(user, new Timestamp(s.start), new Timestamp(s.last), s.n)

    def fn(user: Long, evs: Iterator[SessionEvent],
           state: GroupState[OpenSession]): Iterator[Session] = {
      val out = collection.mutable.ListBuffer[Session]()
      if (state.hasTimedOut) {
        // watermark passed last + gap with no new data: session is final
        state.getOption.foreach(s => out += close(user, s))
        state.remove()
      } else {
        val sorted = evs.toSeq.sortBy(_.ts.getTime)
        var cur = state.getOption
        sorted.foreach { e =>
          val t = e.ts.getTime
          cur match {
            case None =>
              cur = Some(OpenSession(t, t, 1))
            case Some(s) if t - s.last > gapMs =>
              out += close(user, s)
              cur = Some(OpenSession(t, t, 1))
            case Some(s) =>
              cur = Some(s.copy(last = math.max(s.last, t), n = s.n + 1))
          }
        }
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.last + gapMs)
        }
      }
      out.iterator
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
