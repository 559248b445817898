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
  * Design: the state of a key is the list of OPEN islands — sessions
  * the watermark has not yet sealed. An arriving event merges into an
  * island when it falls within `gap` of it, and may BRIDGE two islands
  * into one; otherwise it opens a new island. Islands are emitted (and
  * dropped from state) only once the watermark passes `last + gap`, so
  * output equals the batch gaps-and-islands computation for ANY
  * in-watermark arrival order — including events that arrive in a later
  * micro-batch with an earlier timestamp than the open session.
  *
  * State size is O(open islands) per key, which the watermark bounds to
  * the islands inside one watermark-delay horizon — the shape that
  * holds at 100 TB/day key cardinalities; sealed islands leave state,
  * and fully quiescent keys are removed on timeout.
  */
object EventTimeSessions {

  case class SessionEvent(user_id: Long, ts: Timestamp)

  /** One not-yet-sealed session of a key; times in epoch ms. */
  case class OpenSession(start: Long, last: Long, n: Long)

  case class SessionList(islands: List[OpenSession])

  case class Session(user_id: Long, session_start: Timestamp,
                     session_end: Timestamp, n_events: Long)

  def sessions(events: Dataset[SessionEvent],
               gapMinutes: Int = 30,
               watermarkDelay: String = "1 hour"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L

    def close(user: Long, s: OpenSession): Session =
      Session(user, new Timestamp(s.start), new Timestamp(s.last), s.n)

    /** Merge t into the sorted island list: joins every island within
      * `gap` of t (at most the two neighbors) or opens a new one.
      */
    def addEvent(sorted: List[OpenSession], t: Long): List[OpenSession] = {
      val (before, rest) = sorted.span(_.last < t - gapMs)
      val (touching, after) = rest.span(_.start <= t + gapMs)
      val merged =
        if (touching.isEmpty) OpenSession(t, t, 1)
        else OpenSession(math.min(touching.head.start, t),
          math.max(touching.last.last, t),
          touching.map(_.n).sum + 1)
      before ::: merged :: after
    }

    def fn(user: Long, evs: Iterator[SessionEvent],
           state: GroupState[SessionList]): Iterator[Session] = {
      var islands = state.getOption.map(_.islands).getOrElse(Nil)
      // flatMapGroupsWithState does NOT auto-drop beyond-watermark rows
      // (unlike windowed aggregation). An event with ts + gap <= wm
      // would form an island that seals IN THIS BATCH, duplicating or
      // overlapping a session already emitted for the key — so discard
      // it, matching the windowed-agg late-data contract.
      val wm = state.getCurrentWatermarkMs()
      evs.toSeq.filter(_.ts.getTime + gapMs > wm)
        .sortBy(_.ts.getTime).foreach { e =>
          islands = addEvent(islands, e.ts.getTime)
        }
      // seal every island the watermark has passed (watermark is 0 in
      // the very first batch, so nothing seals prematurely)
      val (sealed_, open) = islands.partition(_.last + gapMs <= wm)
      if (open.isEmpty) state.remove()
      else {
        state.update(SessionList(open))
        // wake up when the earliest island becomes sealable
        state.setTimeoutTimestamp(open.map(_.last).min + gapMs)
      }
      sealed_.map(close(user, _)).iterator
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionList, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
