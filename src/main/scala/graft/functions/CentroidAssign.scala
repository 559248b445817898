package graft.functions

import java.math.RoundingMode

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Native Catalyst expression: nearest-centroid assignment for a
  * float-embedding column against a constant centroid matrix.
  *
  * Why native instead of composing `round(dot(...))` columns: with
  * data-dependent centroids (every k-means iteration produces a new
  * matrix) the composed form inlines k×dim literal terms into the
  * plan — each novel matrix forces a fresh multi-second janino
  * compile of a 500+-term expression, and the higher-order-function
  * variant interprets a lambda per element (~2.5 ms/row measured at
  * k=8, dim=64). Here the matrix is ONE codegen reference object and
  * the generated code is a constant-size method call wrapping a tight
  * JVM loop — compile cost O(1) in k×dim, runtime a few hundred flops
  * per row, and whole-stage codegen stays fused (no CodegenFallback).
  *
  * Exact parity with the composed form (pinned by KMeansSpec): dots
  * fold left-to-right from 0.0 with each float widened to double
  * before multiplying; each sim is rounded to 6 dp with the same
  * BigDecimal HALF_UP rule as Spark's `round`; ties take the lowest
  * centroid index (strict `>` keeps the earlier winner).
  */
case class CentroidAssign(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "centroid_assign"

  // Array params compare by reference under the synthesized case-class
  // equals, which would defeat Catalyst canonicalization — compare
  // centroid contents instead (mirrors PqLut).
  override def equals(other: Any): Boolean = other match {
    case CentroidAssign(c, cen) =>
      c == child && java.util.Arrays.deepEquals(
        cen.asInstanceOf[Array[AnyRef]], centroids.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() +
      java.util.Arrays.deepHashCode(centroids.asInstanceOf[Array[AnyRef]])

  override protected def nullSafeEval(input: Any): Any =
    assign(input.asInstanceOf[ArrayData])

  def assign(arr: ArrayData): Int =
    CentroidAssign.assignSlice(arr, 0, arr.numElements(), centroids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val selfRef = ctx.addReferenceObj("centroidAssign", this,
      classOf[CentroidAssign].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $selfRef.assign($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidAssign =
    copy(child = newChild)
}

object CentroidAssign {
  /** Column-API entry point. */
  def apply(embedding: Column, centroids: Array[Array[Double]]): Column =
    GraftSqlBridge.column(
      CentroidAssign(GraftSqlBridge.expression(embedding), centroids))

  /** The assignment loop over elements [offset, offset + len) of `arr`
    * — EXACTLY what `assign` computes over `slice(arr, offset+1, len)`
    * (slices past the array end shorten, matching `slice`), shared so
    * [[LloydUpdateAgg]]'s in-aggregate assignment is the same code
    * path the map-side [[CentroidAssign]] expression runs.
    */
  def assignSlice(arr: ArrayData, offset: Int, len: Int,
                  centroids: Array[Array[Double]]): Int = {
    val n = arr.numElements()
    val avail = if (n - offset < len) n - offset else len
    var best = -1
    var bestSim = 0.0
    var c = 0
    while (c < centroids.length) {
      val cen = centroids(c)
      val d = if (avail < cen.length) avail else cen.length
      var s = 0.0
      var i = 0
      while (i < d) { s += arr.getFloat(offset + i).toDouble * cen(i); i += 1 }
      val r = java.math.BigDecimal.valueOf(s)
        .setScale(6, RoundingMode.HALF_UP).doubleValue()
      if (best < 0 || r > bestSim) { best = c; bestSim = r }
      c += 1
    }
    best
  }
}
