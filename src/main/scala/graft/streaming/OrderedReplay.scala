package graft.streaming

import java.sql.Timestamp

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Watermark-sealed ordered replay: the reusable streaming combinator
  * under [[StreamFunnel]], [[StreamCohort]] and [[StreamScd2]].
  *
  * Many per-key streaming computations are ORDER-SENSITIVE folds of
  * the key's event history (funnels, cohort assignment, change
  * detection): the result depends on event-time order, which arrival
  * order does not respect. This operator restores exact order-fold
  * semantics under out-of-order arrival:
  *
  *  - arriving events buffer in keyed state (late ones — event time at
  *    or below the watermark — are discarded, the windowed-aggregation
  *    late-data contract);
  *  - each batch, the SEALED prefix (event time <= watermark, which no
  *    future arrival can precede, by the watermark guarantee) replays
  *    through the user fold in (event-time µs, event_id) order;
  *  - equal-timestamp events always seal together, so concatenating
  *    sealed groups across batches replays the exact global order;
  *  - outputs append exactly once; fold state persists per key.
  *
  * State per key = the fold state + the unsealed buffer, which the
  * watermark horizon bounds. Keys whose fold state still equals
  * `zero` with an empty buffer store NOTHING (the store scales with
  * keys the fold actually engaged); `finished` folds drop their
  * buffer and keep a tombstone so emission can never repeat.
  *
  * Timestamps are carried at microsecond precision ([[Timestamp]]
  * getters truncate to ms, which would mis-order same-millisecond
  * events); sealing and lateness compare at ms like the engine's own
  * watermark.
  */
object OrderedReplay {

  /** s: fold state; buf: unsealed (us, event_id, payload) triples. */
  case class RState[S, P](s: S, buf: List[(Long, Long, P)])

  def toUs(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  def fromUs(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** @param extract   per-event (ts, id, payload), or None to drop the
    *                   event before it ever reaches state
    * @param zero      initial fold state; keys at `zero` with no
    *                   buffer are not stored
    * @param finished  folds that can emit nothing further: buffer is
    *                   dropped, the state rides on as a tombstone
    * @param step      (key, state, eventTimeUs, payload) => (state',
    *                   outputs) — invoked in exact event-time order
    */
  def replay[E, S: TypeTag, P: TypeTag, O](
      events: Dataset[E],
      tsCol: String,
      watermarkDelay: String,
      key: E => Long,
      extract: E => Option[(Timestamp, Long, P)],
      zero: S,
      finished: S => Boolean = (_: S) => false)(
      step: (Long, S, Long, P) => (S, List[O]))(
      implicit outEnc: Encoder[O]): Dataset[O] = {
    import events.sparkSession.implicits._
    implicit val stateEnc: Encoder[RState[S, P]] = Encoders.product[RState[S, P]]

    def fn(k: Long, evs: Iterator[E],
           state: GroupState[RState[S, P]]): Iterator[O] = {
      val wm = state.getCurrentWatermarkMs()
      val st0 = state.getOption.getOrElse(RState(zero, List.empty[(Long, Long, P)]))
      val incoming = evs.flatMap { e =>
        extract(e).collect {
          case (t, id, p) if t.getTime > wm => (toUs(t), id, p)
        }
      }.toList
      val (sealed_, open) =
        (st0.buf ::: incoming).partition(t => Math.floorDiv(t._1, 1000L) <= wm)
      var s = st0.s
      val out = List.newBuilder[O]
      sealed_.sortBy(t => (t._1, t._2)).foreach { case (us, _, p) =>
        val (s2, os) = step(k, s, us, p)
        s = s2
        out ++= os
      }
      val keep = if (finished(s)) Nil else open
      if (s == zero && keep.isEmpty) { if (state.exists) state.remove() }
      else {
        state.update(RState(s, keep))
        // wake when the earliest buffered event becomes sealable
        // (timeout timestamps are ms; the buffer is us)
        if (keep.nonEmpty)
          state.setTimeoutTimestamp(Math.floorDiv(keep.map(_._1).min, 1000L))
      }
      out.result().iterator
    }

    events
      .withWatermark(tsCol, watermarkDelay)
      .groupByKey(key)
      .flatMapGroupsWithState[RState[S, P], O](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
