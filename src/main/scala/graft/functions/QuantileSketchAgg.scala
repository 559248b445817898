package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable KLL-style quantile sketch (compactor hierarchy): level i
  * holds items that each represent 2^i input rows; when a level
  * exceeds `k` items it is sorted and every other item is promoted to
  * level i+1 with doubled weight (an odd leftover stays behind at its
  * own level, so total represented weight is preserved EXACTLY —
  * `n` always equals the true input count).
  *
  * Memory is O(k·log(n/k)) per group and merge is levelwise
  * concatenation + re-compaction — associative and commutative up to
  * the sketch's rank-error guarantee, so map-side combine, AQE
  * re-partitioning and retries all stay within the same error bound
  * (ε ≈ log2(n/k)/k rank error; k=256 at 10^12 rows is still < 2%).
  *
  * This is the SKETCH twin of the exact `percentiles` query: exact
  * interpolated percentiles need a full sort of every group — fine as
  * one big sort-based pass, but not mergeable and not streamable. The
  * sketch is the shape a 100 TB daily pipeline actually runs (same
  * trade-off as `approx_distinct`'s HLL vs the exact count, and the
  * CMS vs exact frequencies): tiny mergeable state, bounded error,
  * one pass. Engines differ on sketch internals, so like the other
  * sketches it is rows-only at the gate; QuantileSketchSpec pins the
  * rank-error bound against the exact sort.
  *
  * Compaction offset alternates deterministically (no RNG state): the
  * classic KLL uses a random bit for unbiasedness; the alternating
  * bit keeps the same worst-case rank error and makes a fixed
  * single-partition input bit-reproducible.
  */
case class QuantileSketchAgg(
    child: Expression,
    k: Int,
    probs: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSketch] with ImplicitCastInputTypes {

  require(k >= 8, s"sketch size k=$k too small")
  require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1))

  override def inputTypes: Seq[GraftSqlBridge.AbstractDataType] = Seq(DoubleType)

  override def createAggregationBuffer(): QuantileSketch = new QuantileSketch(k)

  override def update(buf: QuantileSketch, input: InternalRow): QuantileSketch = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }

  override def merge(b1: QuantileSketch, b2: QuantileSketch): QuantileSketch = {
    b1.mergeIn(b2)
    b1
  }

  override def eval(buf: QuantileSketch): Any =
    if (buf.n == 0) null
    else new GenericArrayData(probs.map(buf.quantile).toArray[Any])

  override def serialize(buf: QuantileSketch): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): QuantileSketch =
    QuantileSketch.fromBytes(bytes)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "approx_quantiles_kll"

  override def withNewMutableAggBufferOffset(offset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileSketchAgg =
    copy(child = newChildren(0))
}

object QuantileSketchAgg {
  /** Column API: array of quantile estimates at `probs` (null for an
    * all-null/empty group).
    */
  def apply(value: Column, k: Int, probs: Seq[Double]): Column =
    GraftSqlBridge.column(
      QuantileSketchAgg(GraftSqlBridge.expression(value), k, probs)
        .toAggregateExpression())
}

/** The mutable sketch state (one per group per task). */
final class QuantileSketch(val k: Int) extends Serializable {

  /** levels(i): unsorted items of weight 2^i. */
  private[functions] val levels: ArrayBuffer[ArrayBuffer[Double]] =
    ArrayBuffer(ArrayBuffer.empty[Double])
  /** True number of rows represented (exact at all times). */
  var n: Long = 0L
  private[functions] var flip: Boolean = false

  def add(v: Double): Unit = {
    levels(0) += v
    n += 1
    if (levels(0).size >= k) compactFrom(0)
  }

  def mergeIn(other: QuantileSketch): Unit = {
    while (levels.size < other.levels.size) levels += ArrayBuffer.empty[Double]
    var i = 0
    while (i < other.levels.size) {
      levels(i) ++= other.levels(i)
      i += 1
    }
    n += other.n
    flip ^= other.flip
    compactFrom(0)
  }

  /** Compact every overflowing level from `i0` upward. Promotion can
    * overflow the next level, so the scan continues to the top.
    */
  private def compactFrom(i0: Int): Unit = {
    var i = i0
    while (i < levels.size) {
      if (levels(i).size >= k) {
        if (i + 1 == levels.size) levels += ArrayBuffer.empty[Double]
        val s = levels(i).sorted
        val buf = levels(i)
        buf.clear()
        var start = 0
        if (s.size % 2 == 1) { buf += s(0); start = 1 } // odd leftover keeps its weight
        var j = start + (if (flip) 1 else 0)
        flip = !flip
        while (j < s.size) { levels(i + 1) += s(j); j += 2 }
      }
      i += 1
    }
  }

  /** Lower weighted quantile: the smallest item whose cumulative
    * weight exceeds floor(p·(n-1)).
    */
  def quantile(p: Double): Double = {
    require(n > 0, "quantile of an empty sketch")
    val items = ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < levels.size) {
      val w = 1L << i
      levels(i).foreach(v => items += ((v, w)))
      i += 1
    }
    val sorted = items.sortBy(_._1)
    val target = math.min((p * (n - 1)).toLong, n - 1)
    var cum = 0L
    var idx = 0
    while (idx < sorted.size) {
      cum += sorted(idx)._2
      if (cum > target) return sorted(idx)._1
      idx += 1
    }
    sorted.last._1
  }

  def toBytes: Array[Byte] = {
    val sz = levels.map(_.size).sum
    val bb = ByteBuffer.allocate(4 + 8 + 1 + 4 + levels.size * 4 + sz * 8)
    bb.putInt(k); bb.putLong(n); bb.put(if (flip) 1.toByte else 0.toByte)
    bb.putInt(levels.size)
    levels.foreach { l =>
      bb.putInt(l.size)
      l.foreach(bb.putDouble)
    }
    bb.array()
  }
}

object QuantileSketch {
  def fromBytes(bytes: Array[Byte]): QuantileSketch = {
    val bb = ByteBuffer.wrap(bytes)
    val sk = new QuantileSketch(bb.getInt)
    sk.n = bb.getLong
    // the bit only steers WHICH half survives future compactions;
    // restoring it exactly keeps single-partition runs reproducible
    sk.flip = bb.get() == 1
    val nLevels = bb.getInt
    while (sk.levels.size < nLevels) sk.levels += ArrayBuffer.empty[Double]
    var i = 0
    while (i < nLevels) {
      var m = bb.getInt
      while (m > 0) { sk.levels(i) += bb.getDouble; m -= 1 }
      i += 1
    }
    sk
  }
}
