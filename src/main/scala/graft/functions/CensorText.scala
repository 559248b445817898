package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.{Column, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: single-pass text censoring.
  *
  * The reference censors by running one `replaceAll` per forbidden word
  * over the already-rewritten string (MessageFilterProcessor.java:38-41)
  * — O(words × text). At 100 TB that is the hot loop, so the scale path
  * compiles ALL words into one case-insensitive alternation regex
  * (longest-first, each literal `Pattern.quote`d) and masks every match
  * with '*' × match-length in a single scan — O(text), independent of
  * word-list size, and the compiled `Pattern` is planned once and
  * shipped as a codegen reference object (no per-row compilation).
  *
  * Whole-stage-codegen friendly: implements `doGenCode` (no
  * CodegenFallback), so it fuses into the surrounding generated code.
  *
  * Equivalence with the sequential fold holds when no word's mask output
  * could be re-matched by another word (always true: masks are '*' which
  * never appears in quoted literals unless a word contains '*' —
  * and then longest-first ordering still matches the reference for
  * non-overlapping occurrences). The golden tests pin both paths.
  */
case class CensorText(child: Expression, words: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "censor_text"

  @transient private lazy val pattern: Pattern = CensorText.compile(words)

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      CensorText.censor(pattern, input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patRef = ctx.addReferenceObj("censorPattern", pattern,
      classOf[Pattern].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.CensorText.censor($patRef, $c.toString()));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): CensorText =
    copy(child = newChild)
}

object CensorText {

  /** Column-API entry point: `censor_text(col, words)`. */
  def apply(text: Column, words: Seq[String]): Column =
    GraftSqlBridge.column(CensorText(GraftSqlBridge.expression(text), words))

  /** Compile the alternation pattern; null for an empty word list
    * (censoring with no words is the identity).
    */
  def compile(words: Seq[String]): Pattern =
    if (words.isEmpty) null
    else Pattern.compile(
      words.distinct.sortBy(w => (-w.length, w))
        .map(Pattern.quote).mkString("(?i)", "|", ""))

  /** Single scan; called from both interpreted eval and generated code. */
  def censor(pattern: Pattern, s: String): String = {
    if (pattern == null) return s
    val m = pattern.matcher(s)
    if (!m.find()) return s
    val sb = new java.lang.StringBuilder(s.length)
    var last = 0
    do {
      sb.append(s, last, m.start())
      var i = m.start()
      while (i < m.end()) { sb.append('*'); i += 1 }
      last = m.end()
    } while (m.find())
    sb.append(s, last, s.length)
    sb.toString
  }

  /** Register as SQL function `censor_text(text, word1, word2, ...)`
    * (word args must be string literals).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "censor_text",
      (exprs: Seq[Expression]) => CensorText(
        exprs.head,
        exprs.tail.map(_.eval(null).asInstanceOf[UTF8String].toString)),
      "built-in")
}
