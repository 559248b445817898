package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch `funnel_steps` query: per-user ordered
  * conversion funnel (signup -> view -> click -> purchase) as custom
  * keyed state, emitting one Transition row the first time a user
  * reaches each stage.
  *
  * Correct ordered-funnel semantics under out-of-order arrival need
  * more than the batch query's cascaded running-mins: a late-arriving
  * earlier `signup` can retroactively qualify a `view` we already saw.
  * So the state buffers in-watermark events and REPLAYS the sealed
  * prefix: each batch, events with ts <= watermark can no longer be
  * preceded by unseen arrivals (the watermark contract), so they are
  * folded into the 4-stage machine in (ts, event_id) order — the same
  * total order the batch query's window uses — and transitions are
  * emitted append-only, exactly once. Output over any sealed prefix
  * equals the batch query on that prefix for ANY in-watermark arrival
  * order (StreamingSpec randomizes arrival to pin this).
  *
  * State per user = highest stage reached (one int) + the unsealed
  * event buffer, which the watermark horizon bounds exactly as in
  * [[EventTimeSessions]]; stage-irrelevant event types are dropped
  * before buffering. Users with no funnel progress and no buffer
  * store NOTHING (the store scales with funnel entrants, not with
  * the user universe), while a completed funnel keeps a one-int
  * tombstone so post-completion arrivals can never re-emit
  * transitions. Late events (ts <= watermark on arrival) are
  * discarded, matching the windowed-aggregation late-data contract.
  */
object StreamFunnel {

  case class FunnelEvent(user_id: Long, event_id: Long, ts: Timestamp,
                         event_type: String)

  /** stage: 0..4 = how far the user has progressed; buf = unsealed
    * (epoch ms, event_id, stage index) triples. */
  case class FunnelState(stage: Int, buf: List[(Long, Long, Int)])

  case class Transition(user_id: Long, stage: Int, ts: Timestamp)

  val StageTypes: Seq[String] = Seq("signup", "view", "click", "purchase")

  def transitions(events: Dataset[FunnelEvent],
                  watermarkDelay: String = "1 hour"): Dataset[Transition] = {
    import events.sparkSession.implicits._
    val idx: Map[String, Int] = StageTypes.zipWithIndex.toMap

    // buffer timestamps as MICROSECONDS: Timestamp.getTime truncates
    // to ms, and two same-millisecond events would replay in id order
    // instead of the batch window's full-precision (ts, id) order
    def toUs(t: Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    def fromUs(us: Long): Timestamp = {
      val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
      t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }

    def fn(user: Long, evs: Iterator[FunnelEvent],
           state: GroupState[FunnelState]): Iterator[Transition] = {
      val wm = state.getCurrentWatermarkMs()
      val st0 = state.getOption.getOrElse(FunnelState(0, Nil))
      // keep only stage-relevant, non-late arrivals (lateness and
      // sealing compare at ms like the engine's watermark itself)
      val incoming = evs.flatMap { e =>
        idx.get(e.event_type).filter(_ => e.ts.getTime > wm)
          .map(i => (toUs(e.ts), e.event_id, i))
      }.toList
      val (sealed_, open) =
        (st0.buf ::: incoming).partition(t => Math.floorDiv(t._1, 1000L) <= wm)
      var stage = st0.stage
      val out = List.newBuilder[Transition]
      // sealed events replay in (ts, event_id) order; equal-ts events
      // always seal in the same batch, so the concatenation of sealed
      // groups across batches is itself globally (ts, id)-sorted
      sealed_.sortBy(t => (t._1, t._2)).foreach { case (t, _, ty) =>
        if (stage < 4 && ty == stage) {
          stage += 1
          out += Transition(user, stage, fromUs(t))
        }
      }
      // a completed funnel KEEPS a one-int tombstone (buffer dropped):
      // removing it would let a later in-watermark event re-create the
      // key at stage 0 and re-emit duplicate transitions, breaking the
      // exactly-once contract. Conversely, a key with NO progress and
      // NO buffer stores nothing — otherwise every user who never
      // enters the funnel would grow the store forever. At production
      // retention horizons the tombstones get a TTL via
      // setTimeoutTimestamp + a re-conversion policy; exactly-once
      // within the retention window is the strongest claim possible.
      val keep = if (stage == 4) Nil else open
      if (stage == 0 && keep.isEmpty) { if (state.exists) state.remove() }
      else {
        state.update(FunnelState(stage, keep))
        // wake when the earliest buffered event becomes sealable
        // (timeout timestamps are in ms; the buffer is in us)
        if (keep.nonEmpty)
          state.setTimeoutTimestamp(Math.floorDiv(keep.map(_._1).min, 1000L))
      }
      out.result().iterator
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, Transition](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
