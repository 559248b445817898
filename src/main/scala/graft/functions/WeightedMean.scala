package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` (SURVEY §2.7 aggregate extension point): exact
  * weighted mean over 2-decimal money values weighted by integral
  * quantities. The buffer is integer cents x integer weight, so the
  * partial-aggregation merge is exact and associative — the result is
  * identical for any partitioning (and matches the DuckDB oracle's
  * integer-sum formulation bit-for-bit).
  *
  * Input rows: (group key, value, weight).
  */
class WeightedMean extends Aggregator[(String, Double, Double), WeightedMean.Buf, Double] {
  import WeightedMean.Buf

  override def zero: Buf = Buf(0L, 0L)

  override def reduce(b: Buf, a: (String, Double, Double)): Buf = {
    val w = math.round(a._3)
    Buf(b.sumCents + math.round(a._2 * 100) * w, b.sumW + w)
  }

  override def merge(x: Buf, y: Buf): Buf =
    Buf(x.sumCents + y.sumCents, x.sumW + y.sumW)

  override def finish(b: Buf): Double =
    if (b.sumW == 0) Double.NaN
    else (b.sumCents.toDouble / 100.0) / b.sumW.toDouble

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object WeightedMean {
  case class Buf(sumCents: Long, sumW: Long)
}
