package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode normalization (NFC/NFD/NFKC/
  * NFKD) via `java.text.Normalizer`.
  *
  * Spark ships no Unicode-normalization function, and text curation
  * needs one before ANY hash-keyed dedup: the same visible string in
  * composed ("é") and decomposed ("e" + U+0301) form hashes to two
  * different md5s, so un-normalized corpora silently under-dedup.
  * A UDF would work but drops out of whole-stage codegen; this
  * expression implements `doGenCode` (no CodegenFallback) so the
  * normalize call fuses into the surrounding generated stage like any
  * built-in — at 100 TB the pass is scan-side, zero shuffle.
  *
  * The fast path mirrors `Normalizer.isNormalized`: already-normal
  * strings (the overwhelming majority of real corpora, and ALL pure
  * ASCII) return the input `UTF8String` without copying.
  */
case class NormalizeText(child: Expression, form: String)
    extends UnaryExpression {

  require(NormalizeText.Forms.contains(form),
    s"unknown normalization form '$form' (expected one of ${NormalizeText.Forms})")

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "normalize_text"

  @transient private lazy val nf: Normalizer.Form = Normalizer.Form.valueOf(form)

  override protected def nullSafeEval(input: Any): Any =
    NormalizeText.normalize(input.asInstanceOf[UTF8String], nf)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val formRef = ctx.addReferenceObj("normForm", nf,
      classOf[Normalizer.Form].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NormalizeText.normalize($c, $formRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {

  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  /** Column-API entry point: `NormalizeText.nfc(col)` etc. */
  def apply(text: Column, form: String): Column =
    GraftSqlBridge.column(NormalizeText(GraftSqlBridge.expression(text), form))

  def nfc(text: Column): Column = apply(text, "NFC")

  /** Called from both interpreted eval and generated code. Returns the
    * INPUT object unchanged when already normalized — no allocation on
    * the common path.
    */
  def normalize(s: UTF8String, form: Normalizer.Form): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }
}
