package graft.streaming

import java.sql.Timestamp
import java.time.LocalDate

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch `cohort_retention` query: per-user
  * keyed state emits one Activity row the first time a user is active
  * at each day-offset from their cohort day, exactly once; counting
  * rows per (cohort_day, day_offset) downstream reproduces the batch
  * retention matrix over any sealed prefix.
  *
  * Same watermark-sealed ordered replay as [[StreamFunnel]]: the
  * cohort day is the user's FIRST event, and a late-but-in-watermark
  * earlier arrival would re-base every offset — so events buffer until
  * the watermark seals them, and the first SEALED event fixes the
  * cohort permanently (the watermark contract guarantees nothing
  * earlier can still arrive). Offsets replay in event-time order and
  * deduplicate through a bitmask, so emission is append-only.
  *
  * State per user = one epoch-day long + one bitmask int + the
  * watermark-bounded unsealed buffer. Cohort state is inherently
  * permanent (a user's cohort never expires while retention is
  * tracked); production deployments bound it with a retention-window
  * TTL, after which a user simply stops contributing new offsets.
  */
object StreamCohort {

  case class CohortEvent(user_id: Long, event_id: Long, ts: Timestamp)

  /** cohortDay = -1 until the first sealed event fixes it. */
  case class CohortState(cohortDay: Long, seenMask: Int,
                         buf: List[(Long, Long)])

  case class Activity(user_id: Long, cohort_day: LocalDate, day_offset: Int)

  private val UsPerDay = 86400L * 1000000L

  def activities(events: Dataset[CohortEvent],
                 maxOffset: Int = 7,
                 watermarkDelay: String = "1 hour"): Dataset[Activity] = {
    import events.sparkSession.implicits._
    require(maxOffset < 31, "offset bitmask is an Int")

    def toUs(t: Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

    def fn(user: Long, evs: Iterator[CohortEvent],
           state: GroupState[CohortState]): Iterator[Activity] = {
      val wm = state.getCurrentWatermarkMs()
      val st0 = state.getOption.getOrElse(CohortState(-1L, 0, Nil))
      val incoming = evs.collect {
        case e if e.ts.getTime > wm => (toUs(e.ts), e.event_id)
      }.toList
      val (sealed_, open) =
        (st0.buf ::: incoming).partition(t => Math.floorDiv(t._1, 1000L) <= wm)
      var cohortDay = st0.cohortDay
      var mask = st0.seenMask
      val out = List.newBuilder[Activity]
      sealed_.sortBy(identity).foreach { case (us, _) =>
        val day = Math.floorDiv(us, UsPerDay)
        if (cohortDay < 0) cohortDay = day
        val off = (day - cohortDay).toInt
        if (off <= maxOffset && (mask & (1 << off)) == 0) {
          mask |= 1 << off
          out += Activity(user, LocalDate.ofEpochDay(cohortDay), off)
        }
      }
      if (cohortDay < 0 && open.isEmpty) { if (state.exists) state.remove() }
      else {
        state.update(CohortState(cohortDay, mask, open))
        if (open.nonEmpty)
          state.setTimeoutTimestamp(Math.floorDiv(open.map(_._1).min, 1000L))
      }
      out.result().iterator
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[CohortState, Activity](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
