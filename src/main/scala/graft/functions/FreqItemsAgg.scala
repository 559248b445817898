package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items ("heavy hitters") sketch as a
  * `TypedImperativeAggregate` — the top-k member of the mergeable-
  * sketch family (HLL ≈ distinct counts, CMS ≈ point counts, KLL ≈
  * quantiles, MG ≈ frequent items).
  *
  * Buffer: at most `capacity` (item, counter) pairs. Update: increment
  * a present item; insert if there is room; otherwise decrement ALL
  * counters (dropping zeros) — the classic MG step. Merge: sum
  * counters pairwise, then subtract the (capacity+1)-th largest count
  * from every item and drop non-positives (Agarwal et al.'s mergeable-
  * summaries rule) — at most `capacity` survivors, deterministic
  * regardless of map iteration order because survival depends only on
  * the count value.
  *
  * Guarantees: every estimate undercounts by at most N/(capacity+1)
  * (N = stream length), any item with true frequency above that bound
  * is PRESENT in the sketch, and — the property the oracle leans on —
  * when the true distinct count never exceeds `capacity`, no decrement
  * ever fires and all counts are EXACT.
  *
  * Scale: O(capacity) memory per group regardless of input
  * cardinality; only buffers shuffle. eval emits (item, est) structs
  * sorted by (est DESC, item ASC) — a deterministic total order, so
  * any top-k prefix cut is reproducible cross-engine.
  */
case class FreqItemsAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(capacity > 0, "capacity must be positive")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.toString
      buf.get(s) match {
        case Some(c) => buf.update(s, c + 1)
        case None if buf.size < capacity => buf.update(s, 1L)
        case None =>
          // decrement-all: every tracked counter absorbs this arrival.
          // Iterate a SNAPSHOT — scala 2.13 mutable.HashMap.foreach
          // silently STOPS iterating when an existing key's value is
          // updated mid-loop (observed: 2 of 11 entries visited), so
          // in-place mutation during foreach corrupts the sketch.
          buf.toArray.foreach { case (k, c) =>
            if (c == 1L) buf.remove(k) else buf.update(k, c - 1)
          }
      }
    }
    buf
  }

  override def merge(b1: mutable.HashMap[String, Long],
                     b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (k, c) => b1.update(k, b1.getOrElse(k, 0L) + c) }
    if (b1.size > capacity) {
      // subtract the (capacity+1)-th largest count, drop non-positives.
      // Snapshot iteration, same reason as update's decrement loop:
      // foreach + in-place update on scala 2.13 mutable.HashMap stops
      // early — FreqItemsProps caught >capacity survivors from exactly
      // this (two entries visited, nine skipped, one removed).
      val d = b1.values.toArray.sorted(Ordering[Long].reverse).apply(capacity)
      b1.toArray.foreach { case (k, c) =>
        if (c - d <= 0L) b1.remove(k) else b1.update(k, c - d)
      }
    }
    b1
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toArray.sortBy { case (item, est) => (-est, item) }
    new GenericArrayData(sorted.map { case (item, est) =>
      InternalRow(UTF8String.fromString(item), est)
    })
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) => out.writeUTF(k); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = mutable.HashMap.empty[String, Long]
    (0 until n).foreach(_ => m.update(in.readUTF(), in.readLong()))
    m
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = child :: Nil
  override def prettyName: String = "freq_items"

  override def withNewMutableAggBufferOffset(offset: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqItemsAgg =
    copy(child = newChildren.head)
}

object FreqItemsAgg {
  /** Column API: aggregate to a (est DESC, item ASC)-sorted struct array. */
  def apply(c: Column, capacity: Int): Column =
    GraftSqlBridge.column(
      FreqItemsAgg(GraftSqlBridge.expression(c), capacity)
        .toAggregateExpression())
}
