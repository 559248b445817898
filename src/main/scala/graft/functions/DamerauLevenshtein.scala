package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: FULL Damerau-Levenshtein distance
  * (Lowrance-Wagner — unrestricted edits around an adjacent
  * transposition, so dl("CA","ABC") = 2 where the restricted/OSA
  * variant says 3). Spark ships only plain levenshtein; the
  * transposition-aware distance is the integer-exact sibling of
  * [[JaroWinkler]] for entity-resolution match rules. Semantics are
  * pinned to DuckDB's `damerau_levenshtein` (randomized fuzz found 0
  * diffs over 4000 pairs; DamerauProps pins fixtures + invariants,
  * the er_damerau_census oracle run is the corpus-scale proof).
  *
  * Codegen-friendly: `doGenCode` emits a static call, fusing into the
  * surrounding generated join/filter loop. O(|a|·|b|) ints plus a
  * small last-occurrence map per call — fine for the short
  * identifier-ish strings ER blocks compare; returns LONG to match
  * DuckDB's column type.
  */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "damerau_levenshtein"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DamerauLevenshtein.dist(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.DamerauLevenshtein.dist($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)
}

object DamerauLevenshtein {

  /** Column-API entry point: `damerau_levenshtein(a, b)`. */
  def apply(a: Column, b: Column): Column =
    GraftSqlBridge.column(DamerauLevenshtein(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Static distance the generated code calls (codepoint symbols). */
  def dist(ua: UTF8String, ub: UTF8String): Long = {
    val a = ua.toString.codePoints().toArray
    val b = ub.toString.codePoints().toArray
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0) return l2.toLong
    if (l2 == 0) return l1.toLong
    val inf = l1 + l2
    // (l1+2) x (l2+2) matrix with the Lowrance-Wagner sentinel border
    val w = l2 + 2
    val d = new Array[Int]((l1 + 2) * w)
    d(0) = inf
    var i = 0
    while (i <= l1) { d((i + 1) * w) = inf; d((i + 1) * w + 1) = i; i += 1 }
    var j = 0
    while (j <= l2) { d(j + 1) = inf; d(w + j + 1) = j; j += 1 }
    // last row index (1-based) where each symbol occurred in `a`
    val da = new java.util.HashMap[Integer, Integer]()
    i = 1
    while (i <= l1) {
      var db = 0
      j = 1
      while (j <= l2) {
        val k = { val v = da.get(b(j - 1)); if (v == null) 0 else v.intValue() }
        val l = db
        val cost = if (a(i - 1) == b(j - 1)) { db = j; 0 } else 1
        var m = d(i * w + j) + cost                    // substitution / match
        val ins = d((i + 1) * w + j) + 1               // insertion
        if (ins < m) m = ins
        val del = d(i * w + j + 1) + 1                 // deletion
        if (del < m) m = del
        val tr = d(k * w + l) + (i - k - 1) + 1 + (j - l - 1) // transposition
        if (tr < m) m = tr
        d((i + 1) * w + j + 1) = m
        j += 1
      }
      da.put(a(i - 1), i)
      i += 1
    }
    d((l1 + 1) * w + l2 + 1).toLong
  }
}
