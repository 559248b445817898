package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Jaro-Winkler string similarity.
  *
  * Spark ships levenshtein but no Jaro-Winkler, which is the standard
  * entity-resolution comparator for short identifier-ish strings
  * (names, titles) — edit distance over-penalizes transpositions that
  * are typographically common. Semantics are pinned to the canonical
  * definition as implemented by DuckDB's `jaro_winkler_similarity`
  * (verified bitwise-identical over randomized fuzz + fixtures in
  * JaroWinklerProps): match window max(|a|,|b|)/2 − 1, half-counted
  * transpositions, prefix bonus ℓ·0.1·(1−j) for ℓ ≤ 4 applied only
  * when j > 0.7, and 0.0 (not 1.0) when either side is empty.
  *
  * Whole-stage-codegen friendly: `doGenCode` emits a static call (no
  * CodegenFallback), so the comparator fuses into the surrounding
  * generated join/filter code — the right shape for the blocked-pair
  * ER scan where this sits in the hot loop. O(|a|·window) time,
  * two small int arrays per call, no regex, no allocation beyond the
  * codepoint arrays.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.sim(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinkler.sim($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Column-API entry point: `jaro_winkler(a, b)`. */
  def apply(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      JaroWinkler(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Static comparator the generated code calls. Codepoint-based, so
    * supplementary-plane characters compare as single symbols (same
    * unit DuckDB uses).
    */
  def sim(ua: UTF8String, ub: UTF8String): Double = {
    val a = StringSymbols.of(ua)
    val b = StringSymbols.of(ub)
    val l1 = a.length
    val l2 = b.length
    // DuckDB convention: ANY empty side (including both) scores 0.0
    if (l1 == 0 || l2 == 0) return 0.0
    val window = {
      val w = (if (l1 > l2) l1 else l2) / 2 - 1
      if (w < 0) 0 else w
    }
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = if (i - window > 0) i - window else 0
      val hi = if (i + window + 1 < l2) i + window + 1 else l2
      var j = lo
      var done = false
      while (j < hi && !done) {
        if (!m2(j) && a(i) == b(j)) {
          m1(i) = true; m2(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched symbols out of order, half-counted
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val j = (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
    // Winkler prefix bonus: common prefix up to 4, only above 0.7
    if (j > 0.7) {
      var l = 0
      val lim = math.min(4, math.min(l1, l2))
      while (l < lim && a(l) == b(l)) l += 1
      j + l * 0.1 * (1 - j)
    } else j
  }
}
