package graft.functions

import java.math.RoundingMode

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: the product-quantization query LUT —
  * for every subspace m and codebook entry c, the 6-dp-rounded dot of
  * the query's m-th subvector with codebook entry c, flattened to one
  * `array<double>` of M*K values indexed [m*K + c].
  *
  * Why native instead of the composed `array(round(subDot(...)), ...)`
  * form: M*K entries x subDim multiply-adds unroll to a ~3000-node
  * expression tree that Catalyst re-analyzes and re-optimizes on every
  * run and janino compiles per novel codebook matrix (data-dependent —
  * every Lloyd step changes it). Here the codebooks are ONE codegen
  * reference object, the generated code is a constant-size method
  * call, and whole-stage codegen stays fused — the same argument as
  * [[CentroidAssign]], which this mirrors.
  *
  * Exact parity with the composed form it replaces (pinned by
  * KMeansSpec): each subspace dot folds left-to-right from 0.0 with
  * the float widened to double before multiplying (0.0 + t0 == t0
  * exactly, so seeding at 0.0 equals the reduceLeft of the terms),
  * then rounds to 6 dp with the same BigDecimal HALF_UP rule as
  * Spark's `round` — identical values to the DuckDB oracle's
  * `round(list_sum(list_transform(...)), 6)`.
  */
case class PqLut(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_lut"

  // Array params compare by reference under the synthesized case-class
  // equals, which would defeat Catalyst canonicalization (semantically
  // identical LUTs never dedup) — compare codebook contents instead.
  override def equals(other: Any): Boolean = other match {
    case PqLut(c, cb) =>
      c == child && java.util.Arrays.deepEquals(
        cb.asInstanceOf[Array[AnyRef]], codebooks.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() +
      java.util.Arrays.deepHashCode(codebooks.asInstanceOf[Array[AnyRef]])

  override protected def nullSafeEval(input: Any): Any =
    lut(input.asInstanceOf[ArrayData])

  def lut(arr: ArrayData): ArrayData = {
    val m = codebooks.length
    val k = codebooks(0).length
    val sub = codebooks(0)(0).length
    val out = new Array[Double](m * k)
    val n = arr.numElements()
    var mi = 0
    while (mi < m) {
      val off = mi * sub
      // Clamp to the embedding's actual length (mirrors CentroidAssign):
      // a short embedding contributes zero terms past its end instead of
      // throwing ArrayIndexOutOfBounds from inside codegen'd code.
      val lim = { val r = n - off; if (r < sub) (if (r < 0) 0 else r) else sub }
      var c = 0
      while (c < k) {
        val cen = codebooks(mi)(c)
        var s = 0.0
        var i = 0
        while (i < lim) { s += arr.getFloat(off + i).toDouble * cen(i); i += 1 }
        out(mi * k + c) = java.math.BigDecimal.valueOf(s)
          .setScale(6, RoundingMode.HALF_UP).doubleValue()
        c += 1
      }
      mi += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val selfRef = ctx.addReferenceObj("pqLut", this, classOf[PqLut].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $selfRef.lut($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

object PqLut {
  /** Column-API entry point. */
  def apply(embedding: Column, codebooks: Array[Array[Array[Double]]]): Column =
    GraftSqlBridge.column(
      PqLut(GraftSqlBridge.expression(embedding), codebooks))
}
