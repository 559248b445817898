package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset

/** Streaming twin of the batch `holt_winters` query: additive triple
  * exponential smoothing (season 24) over the global hourly cent
  * census, emitted hour by hour as each hour seals.
  *
  * Built on [[OrderedReplay]] under one global key (a single series).
  * The batch init is deliberately non-causal — l0/b0 average the
  * first TWO days — so the stream buffers the first 48 CLOSED hours,
  * then replays t = 25..48 in one burst and switches to the O(1)
  * recurrence; every later close emits immediately. State after
  * warmup: level + trend + the 24-slot seasonal ring, all stored as
  * 6-dp-scaled integers (the decimal-quantization contract makes
  * every iterate an exact multiple of 1e-6), plus the open hour's
  * cent accumulator — O(season), independent of history.
  *
  * Heartbeat contract (StreamSprt's): events flagged `heartbeat`
  * advance replay time — sealing earlier hours — but never open an
  * hour or contribute cents. StreamingSpec pins bit-exact equality
  * with the batch rows under randomized arrival.
  */
object StreamHoltWinters {

  case class HourEvent(event_id: Long, ts: Timestamp, cents: Long,
                       heartbeat: Boolean)

  case class HwRow(t: Long, hour: Timestamp, y_cents: Long, level: Double,
                   trend: Double, seasonal: Double, fitted: Double)

  /** phase 0 = warmup (buf accumulates closed hours), 1 = recurrence.
    * l6/b6/ring are 6-dp-scaled (×1e6) exact integers. */
  case class St(openHourUs: Long, openCents: Long, phase: Int,
                buf: List[(Long, Long)], l6: Long, b6: Long,
                ring: List[Long], t: Long)

  private val Season = 24
  private val Warm = 2 * Season

  private def hourFloorUs(us: Long): Long =
    us - Math.floorMod(us, 3600L * 1000000L)

  private def bd6(scaled: Long) = BigDecimal(scaled, 6)
  private def q6l(x: BigDecimal): Long =
    x.setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .bigDecimal.movePointRight(6).longValueExact()
  private def rd6(x: Double) = BigDecimal(x)
    .setScale(6, BigDecimal.RoundingMode.HALF_UP)

  /** One recurrence step at closed hour (hourUs, y), t already
    * incremented — the batch fold's exact arithmetic. */
  private def step(st: St, hourUs: Long, y: Long): (St, HwRow) = {
    val l = bd6(st.l6); val b = bd6(st.b6)
    val sOld = bd6(st.ring.head)
    val fitted = l + b + sOld
    val lnew = BigDecimal("0.2") * (BigDecimal(y) - sOld) +
      BigDecimal("0.8") * (l + b)
    // quantize lnew ONCE and reuse it, exactly as the batch fold
    val lq = q6l(lnew)
    val bq = q6l(BigDecimal("0.1") * (bd6(lq) - l) + BigDecimal("0.9") * b)
    val sq = q6l(BigDecimal("0.3") * (BigDecimal(y) - bd6(lq)) +
      BigDecimal("0.7") * sOld)
    val row = HwRow(st.t, OrderedReplay.fromUs(hourUs), y,
      bd6(lq).toDouble, bd6(bq).toDouble, bd6(sq).toDouble, fitted.toDouble)
    (st.copy(l6 = lq, b6 = bq, ring = st.ring.tail :+ sq), row)
  }

  /** Close the open hour; in warmup, crossing 48 closed hours runs
    * init + the buffered t=25..48 replay in one burst. */
  private def close(st0: St): (St, List[HwRow]) = {
    val closed = (st0.openHourUs, st0.openCents)
    if (st0.phase == 1) {
      val st1 = st0.copy(t = st0.t + 1)
      val (st2, row) = step(st1, closed._1, closed._2)
      (st2, List(row))
    } else {
      val buf = st0.buf :+ closed
      if (buf.length < Warm) (st0.copy(buf = buf), Nil)
      else {
        // init: the batch query's double-divide + 6-dp quantize
        val s1 = buf.take(Season).map(_._2).sum
        val s2 = buf.slice(Season, Warm).map(_._2).sum
        val l0 = rd6(s1.toDouble / 24.0)
        val b0 = rd6((s2 - s1).toDouble / 576.0)
        val ring0 = buf.take(Season).map(r => q6l(BigDecimal(r._2) - l0))
        var st = St(-1L, 0L, 1, Nil, q6l(l0), q6l(b0), ring0, Season.toLong)
        val out = scala.collection.mutable.ListBuffer.empty[HwRow]
        buf.drop(Season).foreach { case (h, y) =>
          st = st.copy(t = st.t + 1)
          val (s2n, row) = step(st, h, y)
          st = s2n; out += row
        }
        (st, out.toList)
      }
    }
  }

  def smooth(events: Dataset[HourEvent],
             watermarkDelay: String = "1 hour"): Dataset[HwRow] = {
    import events.sparkSession.implicits._
    OrderedReplay.replay[HourEvent, St, (Long, Boolean), HwRow](
      events, "ts", watermarkDelay, _ => 0L,
      e => Some((e.ts, e.event_id, (e.cents, e.heartbeat))),
      zero = St(-1L, 0L, 0, Nil, 0L, 0L, Nil, 0L)) { (_, st0, us, p) =>
      val (cents, hb) = p
      val h = hourFloorUs(us)
      val (st, out) =
        if (st0.openHourUs != -1L && h > st0.openHourUs) {
          val (c, rows) = close(st0)
          (c.copy(openHourUs = -1L, openCents = 0L), rows)
        } else (st0, Nil)
      if (hb) (st, out) // heartbeat: seals, never opens an hour
      else if (st.openHourUs == -1L)
        (st.copy(openHourUs = h, openCents = cents), out)
      else (st.copy(openCents = st.openCents + cents), out)
    }
  }
}
