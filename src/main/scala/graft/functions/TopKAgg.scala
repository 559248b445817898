package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k as a `TypedImperativeAggregate`: keep the k best
  * (value DESC, tie1 ASC, tie2 ASC) rows per group in an O(k) buffer
  * with map-side combine.
  *
  * The window-function form (`row_number() <= k`, see `topk_per_group`)
  * shuffles and sorts EVERY row of a group under one reducer; this
  * aggregate shuffles only k-row buffers per (group, map partition) and
  * never materializes a group — the shape that survives a 100 TB group
  * (same state bound as the reference's store-backed transforms would
  * need; SURVEY §2.7 aggregate extension point).
  *
  * Buffer ordering is total (value, then both tiebreaks), so any
  * partial-aggregation plan — map-side combine, AQE re-partitioning,
  * retries — yields identical output.
  */
case class TopKAgg(
    sortVal: Expression,
    tie1: Expression,
    tie2: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Long, Long)]]
  with ImplicitCastInputTypes {

  // Declared input types make misuse an ANALYSIS-time error (with
  // coercion-friendly casts inserted where safe, e.g. int/decimal
  // inputs) instead of a mid-task ClassCastException in update()'s
  // asInstanceOf extraction.
  override def inputTypes: Seq[GraftSqlBridge.AbstractDataType] =
    Seq(DoubleType, LongType, LongType)

  private type Row3 = (Double, Long, Long)

  /** true iff a ranks strictly before b (value DESC, ties ASC).
    * Double comparison is the SQL total order (java.lang.Double
    * .compare: NaN greatest, i.e. first under DESC — matching
    * `row_number() OVER (ORDER BY v DESC)`); -0.0 is normalized to 0.0
    * at insert so the two zeros tie like Spark's sort.
    */
  private def before(a: Row3, b: Row3): Boolean = {
    val cmp = java.lang.Double.compare(b._1, a._1) // descending
    cmp < 0 || (cmp == 0 &&
      (a._2 < b._2 || (a._2 == b._2 && a._3 < b._3)))
  }

  override def createAggregationBuffer(): ArrayBuffer[Row3] =
    new ArrayBuffer[Row3](k + 1)

  private def insert(buf: ArrayBuffer[Row3], r: Row3): ArrayBuffer[Row3] = {
    if (buf.size == k && !before(r, buf.last)) return buf
    var i = buf.size
    while (i > 0 && before(r, buf(i - 1))) i -= 1
    buf.insert(i, r)
    if (buf.size > k) buf.remove(k)
    buf
  }

  override def update(buf: ArrayBuffer[Row3], input: InternalRow): ArrayBuffer[Row3] = {
    val v = sortVal.eval(input)
    val t1 = tie1.eval(input)
    val t2 = tie2.eval(input)
    if (v == null || t1 == null || t2 == null) buf
    else {
      val raw = v.asInstanceOf[Double]
      val d = if (raw == 0.0) 0.0 else raw // fold -0.0 into 0.0
      insert(buf, (d, t1.asInstanceOf[Long], t2.asInstanceOf[Long]))
    }
  }

  override def merge(b1: ArrayBuffer[Row3], b2: ArrayBuffer[Row3]): ArrayBuffer[Row3] = {
    b2.foreach(insert(b1, _))
    b1
  }

  override def eval(buf: ArrayBuffer[Row3]): Any =
    new GenericArrayData(buf.map { case (v, t1, t2) =>
      InternalRow(v, t1, t2)
    }.toArray[Any])

  override def serialize(buf: ArrayBuffer[Row3]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 24)
    bb.putInt(buf.size)
    buf.foreach { case (v, t1, t2) => bb.putDouble(v); bb.putLong(t1); bb.putLong(t2) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Row3] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf += ((bb.getDouble, bb.getLong, bb.getLong)); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("value", DoubleType, nullable = false),
    StructField("tie1", LongType, nullable = false),
    StructField("tie2", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(sortVal, tie1, tie2)
  override def prettyName: String = "top_k"

  override def withNewMutableAggBufferOffset(offset: Int): TopKAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(sortVal = newChildren(0), tie1 = newChildren(1), tie2 = newChildren(2))
}

object TopKAgg {
  /** Column API: array of the k best (value DESC, tie1, tie2) structs. */
  def apply(sortVal: Column, tie1: Column, tie2: Column, k: Int): Column =
    GraftSqlBridge.column(
      TopKAgg(GraftSqlBridge.expression(sortVal),
        GraftSqlBridge.expression(tie1),
        GraftSqlBridge.expression(tie2), k)
        .toAggregateExpression())
}
