package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset

/** Streaming twin of the batch `sprt_boundary` query: Wald's
  * sequential probability ratio test over the daily conversion
  * census, emitted day by day as each day seals.
  *
  * Built on [[OrderedReplay]] under ONE global key — a sequential
  * test is a single global monitor by definition. The stream this
  * monitor consumes is the per-user-DAY outcome stream (one record
  * per user-event; the fold dedups users within the open day), so
  * state is the open day's user→converted map — bounded by ACTIVE
  * users per day, never history — plus two cumulative integers.
  * An event from a later day closes the open day: the census row
  * joins the cumulative totals and the LLR is recomputed from the
  * exact integers × the same literal log-ratios as the batch query
  * (never a running float sum), so every emitted row equals the
  * batch row bit-for-bit; the only delta is the final, still-open
  * day, which a stream cannot close until the watermark passes it.
  *
  * Heartbeat contract: events with user_id < 0 advance replay time
  * (sealing earlier days) but never join the census — the standard
  * way to close a quiet stream's tail without corrupting it.
  */
object StreamSprt {

  case class OutcomeEvent(user_id: Long, event_id: Long, ts: Timestamp,
                          converted: Boolean)

  case class SprtRow(day: Timestamp, n_cum: Long, k_cum: Long, llr: Double,
                     state: String, decided: Boolean)

  /** dayUs = -1 marks "no day open yet". */
  case class St(dayUs: Long, open: Map[Long, Boolean],
                nCum: Long, kCum: Long, decided: Boolean)

  private val (p0, p1) = (0.30, 0.40)
  private[streaming] val la = math.log(p1 / p0)
  private[streaming] val lb = math.log((1 - p1) / (1 - p0))
  private val up = math.log(0.95 / 0.05)
  private val lo = math.log(0.05 / 0.95)

  private def dayFloorUs(us: Long): Long =
    us - Math.floorMod(us, 86400L * 1000000L)

  /** Close the open day: fold its user census into the cumulative
    * totals and build the emitted row — the batch query's exact
    * arithmetic (integers × literal constants, 6-dp HALF_UP). */
  private def close(st: St): (St, SprtRow) = {
    val n = st.nCum + st.open.size
    val k = st.kCum + st.open.count(_._2)
    val llr = k * la + (n - k) * lb
    val state =
      if (llr >= up) "accept_h1"
      else if (llr <= lo) "accept_h0"
      else "continue"
    val decided = st.decided || state != "continue"
    val row = SprtRow(OrderedReplay.fromUs(st.dayUs), n, k,
      BigDecimal(llr).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      state, decided)
    (St(-1L, Map.empty, n, k, decided), row)
  }

  def monitor(events: Dataset[OutcomeEvent],
              watermarkDelay: String = "1 day"): Dataset[SprtRow] = {
    import events.sparkSession.implicits._
    OrderedReplay.replay[OutcomeEvent, St, (Long, Boolean), SprtRow](
      events, "ts", watermarkDelay, _ => 0L,
      e => Some((e.ts, e.event_id, (e.user_id, e.converted))),
      zero = St(-1L, Map.empty, 0L, 0L, decided = false)) { (_, st0, us, p) =>
      val (user, conv) = p
      val d = dayFloorUs(us)
      // a later day closes the open one (replay order guarantees
      // nothing earlier can still arrive)
      val (st, out) =
        if (st0.dayUs != -1L && d > st0.dayUs) {
          val (closed, row) = close(st0)
          (closed, List(row))
        } else (st0, Nil)
      if (user < 0) (st, out) // heartbeat: seals, never joins the census
      else {
        val open = st.open.updated(user, st.open.getOrElse(user, false) || conv)
        (St(d, open, st.nCum, st.kCum, st.decided), out)
      }
    }
  }
}
