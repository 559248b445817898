package graft.streaming

import java.sql.Timestamp
import java.time.LocalDate

import org.apache.spark.sql.Dataset

/** Streaming twin of the batch `cohort_retention` query: per-user
  * keyed state emits one Activity row the first time a user is active
  * at each day-offset from their cohort day, exactly once; counting
  * rows per (cohort_day, day_offset) downstream reproduces the batch
  * retention matrix over any sealed prefix.
  *
  * Built on [[OrderedReplay]]: the cohort day is the user's FIRST
  * event, and a late-but-in-watermark earlier arrival would re-base
  * every offset — replay order fixes the cohort at the first SEALED
  * event (nothing earlier can still arrive, by the watermark
  * contract). Fold state = (epoch cohort day, seen-offset bitmask);
  * it is inherently permanent — a user's cohort never expires while
  * retention is tracked — and production deployments bound it with a
  * retention-window TTL, after which a user simply stops contributing
  * new offsets.
  */
object StreamCohort {

  case class CohortEvent(user_id: Long, event_id: Long, ts: Timestamp)

  case class Activity(user_id: Long, cohort_day: LocalDate, day_offset: Int)

  private val UsPerDay = 86400L * 1000000L

  def activities(events: Dataset[CohortEvent],
                 maxOffset: Int = 7,
                 watermarkDelay: String = "1 hour"): Dataset[Activity] = {
    import events.sparkSession.implicits._
    require(maxOffset < 31, "offset bitmask is an Int")
    // Long.MinValue (not -1) as the unset sentinel: valid epoch days
    // are negative for pre-1970 event times, and a colliding sentinel
    // would silently re-base the cohort on every subsequent event
    val Unset = Long.MinValue
    OrderedReplay.replay[CohortEvent, (Long, Int), Boolean, Activity](
      events, "ts", watermarkDelay, _.user_id,
      e => Some((e.ts, e.event_id, true)),
      zero = (Unset, 0)) { case (user, (day0, mask), us, _) =>
      val day = Math.floorDiv(us, UsPerDay)
      val cohortDay = if (day0 == Unset) day else day0
      val off = (day - cohortDay).toInt
      if (off <= maxOffset && (mask & (1 << off)) == 0)
        ((cohortDay, mask | (1 << off)),
          List(Activity(user, LocalDate.ofEpochDay(cohortDay), off)))
      else ((cohortDay, mask), Nil)
    }
  }
}
