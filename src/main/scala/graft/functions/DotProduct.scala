package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: index-ordered dot product of two array
  * columns in double — the pair-path hot loop of every similarity
  * query (ANN probes, SemDeDup, dedup_embedding, the streaming twins).
  *
  * Why native: the composed `aggregate(zip_with(a, b, ...))` form is
  * CodegenFallback — Spark interprets the two lambdas per ELEMENT, and
  * a cosine evaluates THREE of them per pair (dot + two norms). On the
  * block-pair joins that's the dominant per-task work (guide §1.2 step
  * 2). Here the product-sum is one tight JVM loop behind a constant
  * codegen call — whole-stage codegen stays fused, no lambda
  * interpretation exists.
  *
  * Exact parity with the HOF form (pinned by DotProductSpec, and by
  * every similarity query's oracle hash):
  *  - identical float semantics: elements promoted to double BEFORE
  *    multiplying, products added LEFT-TO-RIGHT from 0.0 (the
  *    `aggregate` fold order);
  *  - null semantics replicate `aggregate(zip_with(...))`: a null
  *    array, a null element on either side, or a LENGTH MISMATCH
  *    (zip_with pads the shorter side with nulls, nulling the sum)
  *    all yield null;
  *  - elements may be float or double per side (embeddings vs literal
  *    plane/centroid arrays) — each side reads its own element type,
  *    exactly as `x.cast("double") * y` promoted them.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  private def isFloat(e: Expression): Boolean = elemType(e) match {
    case FloatType => true
    case DoubleType => false
    case t => throw new IllegalArgumentException(
      s"dot_product over unsupported element type $t") // fail LOUD, never misread
  }
  @transient private lazy val leftIsFloat = isFloat(left)
  @transient private lazy val rightIsFloat = isFloat(right)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val r = dotOrNull(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (r == null) null else r.doubleValue()
  }

  def dotOrNull(x: ArrayData, y: ArrayData): java.lang.Double = {
    val n = x.numElements()
    // zip_with pads the shorter array with nulls -> null product -> null sum
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (leftIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rightIsFloat) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val selfRef = ctx.addReferenceObj("dotProduct", this,
      classOf[DotProduct].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |java.lang.Double ${ev.value}_r = $selfRef.dotOrNull($a, $b);
      |if (${ev.value}_r == null) {
      |  ${ev.isNull} = true;
      |} else {
      |  ${ev.value} = ${ev.value}_r.doubleValue();
      |}
      |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      DotProduct(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
