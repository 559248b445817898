package graft.streaming

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.sql.Timestamp

import org.apache.spark.sql.Dataset

/** Streaming twin of the batch `ewma_trend` query: per event_type, the
  * truncated dyadic-weight EWMA over the HOURLY value census, emitted
  * as each hour seals.
  *
  * Built on [[OrderedReplay]]: events replay per type in exact
  * event-time order, the fold accumulates the current hour's exact
  * cent sum, and an event from a LATER hour closes every hour before
  * it — at close, the EWMA over (closed value :: last K-1 closed
  * values) is emitted and the value shifts into the ring. Hours with
  * no events never existed in the batch census either (both sides
  * smooth over PRESENT hours), so each emitted row equals the batch
  * row bit-for-bit; the only delta is the final, still-open hour per
  * type, which a stream cannot close until the watermark passes it —
  * StreamingSpec pins rows == batch-minus-last-open-hour under
  * randomized arrival.
  *
  * State per type: one hour accumulator + a K-1 ring of closed cent
  * sums — O(K) per key, independent of corpus size. The exactness
  * story is the batch query's: dyadic integer weights × exact cent
  * sums, one double divide, HALF_UP 6 dp — the arithmetic here is
  * the same written sequence in JVM BigDecimal/double ops.
  */
object StreamEwma {

  case class ValueEvent(event_type: String, event_id: Long, ts: Timestamp,
                        cents: Long)

  case class EwmaRow(event_type: String, hour: Timestamp, v: Double,
                     ewma: Double)

  /** hourUs = -1 marks "no hour open yet"; ring is most-recent-first
    * closed cent sums (at most K-1 kept). */
  case class St(hourUs: Long, cents: Long, ring: List[Long])

  val K = 12
  private val weights: IndexedSeq[Long] =
    (0 until K).map(k => 1L << (K - 1 - k))

  /** Stable 32-bit key for the type string (the replay combinator
    * keys on Long) — PortableHash's md5 construction. A 2^-32 hash
    * collision would co-mingle two types' rings; with a handful of
    * types this is negligible, and a deployment with a large keyspace
    * should widen the key to the full md5 instead. */
  private def typeKey(s: String): Long = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  private def hourFloorUs(us: Long): Long =
    us - Math.floorMod(us, 3600L * 1000000L)

  /** EWMA at the hour whose cent sum is `cur`, with `ring` the closed
    * sums of the K-1 most recent prior present hours: exactly the
    * batch query's unrolled-lag arithmetic. */
  private[streaming] def ewmaOf(cur: Long, ring: List[Long]): Double = {
    val vals = cur :: ring
    var num = BigDecimal(0)
    var den = 0L
    vals.take(K).zipWithIndex.foreach { case (c, k) =>
      num += BigDecimal(c) * weights(k)
      den += weights(k)
    }
    // batch: round(CAST(num_decimal(2dp) AS DOUBLE) / den, 6); cents
    // carry the 2dp scale, so divide by 100 first (decimal->double is
    // nearest, as is x/100.0) then by den, then HALF_UP to 6 dp
    val raw = num.toDouble / 100.0 / den
    BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  def trend(events: Dataset[ValueEvent],
            watermarkDelay: String = "1 hour"): Dataset[EwmaRow] = {
    import events.sparkSession.implicits._
    OrderedReplay.replay[ValueEvent, St, (String, Long), EwmaRow](
      events, "ts", watermarkDelay, e => typeKey(e.event_type),
      e => Some((e.ts, e.event_id, (e.event_type, e.cents))),
      zero = St(-1L, 0L, Nil)) { (_, st, us, p) =>
      val (ty, cents) = p
      val h = hourFloorUs(us)
      if (st.hourUs == -1L)
        (St(h, cents, st.ring), Nil)
      else if (h == st.hourUs)
        (St(h, st.cents + cents, st.ring), Nil)
      else {
        // later hour arrived: the open hour is complete (replay order
        // guarantees nothing earlier can still arrive)
        val row = EwmaRow(ty, OrderedReplay.fromUs(st.hourUs),
          st.cents / 100.0, ewmaOf(st.cents, st.ring))
        (St(h, cents, (st.cents :: st.ring).take(K - 1)), List(row))
      }
    }
  }
}
