package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: single-pass HTML entity decode — named
  * (`&quot; &apos; &lt; &gt; &amp;`) and numeric (`&#NNN;` decimal,
  * `&#xHH;` lowercase-x hex) in ONE left-to-right scan that never
  * re-reads its own output, so decode cascades (the classic `&amp;lt;`
  * → `<` bug of ordered replace chains) are structurally impossible.
  *
  * Why not built-ins: Spark has no replace-with-computed-replacement,
  * and its `chr` wraps the code point mod 256 (Latin-1 legacy) —
  * silently corrupting `&#8217;` (curly apostrophe) and `&#8212;`
  * (em-dash), the commonest real-web entities. This expression decodes
  * the full Unicode range (`Character.toChars`, incl. astral planes).
  *
  * Anything that is not a decodable entity stays VERBATIM (real crawl
  * HTML is full of stray ampersands; a loud error would kill the
  * pipeline on the first malformed page): unknown names, missing `;`,
  * empty digit runs, digit runs past the caps (6 hex / 7 decimal —
  * 0x10FFFF needs exactly that many), surrogate code points, and
  * beyond-Unicode values. The caps and the verbatim rule are mirrored
  * EXACTLY by the DuckDB oracle twin ([[graft.queries.Html
  * .duckVisible]]), which brackets numeric entities with a sentinel,
  * splits, and decodes each piece exactly once — same
  * no-rescan semantics, same guard arithmetic.
  *
  * Whole-stage-codegen friendly: implements `doGenCode` (no
  * CodegenFallback), so it fuses into the surrounding generated code.
  */
case class DecodeHtmlEntities(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "decode_html_entities"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      DecodeHtmlEntities.decode(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.DecodeHtmlEntities.decode($c.toString()));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): DecodeHtmlEntities =
    copy(child = newChild)
}

object DecodeHtmlEntities {

  /** Column-API entry point: `decode_html_entities(col)`. */
  def apply(text: Column): Column =
    GraftSqlBridge.column(DecodeHtmlEntities(GraftSqlBridge.expression(text)))

  // HTML4 core names (HTML5's full 2k-name table is a data-file swap —
  // same scan, bigger lookup)
  private val Names = Array("quot;", "apos;", "lt;", "gt;", "amp;")
  private val Chars = Array('"', '\'', '<', '>', '&')

  /** Single scan; called from both interpreted eval and generated code. */
  def decode(s: String): String = {
    var i = s.indexOf('&')
    if (i < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var last = 0
    while (i >= 0) {
      sb.append(s, last, i)
      val end = tryEntity(s, i, sb)
      last = if (end < 0) { sb.append('&'); i + 1 } else end
      i = s.indexOf('&', last)
    }
    sb.append(s, last, s.length)
    sb.toString
  }

  /** Decode one entity at `s(at) == '&'`: append the decoded char(s)
    * to `sb` and return the index just past the `;`, or -1 (nothing
    * appended — caller emits the '&' verbatim and rescans from at+1;
    * the skipped region contains no '&', so output equals input).
    */
  private def tryEntity(s: String, at: Int, sb: java.lang.StringBuilder): Int = {
    val n = s.length
    if (at + 1 >= n) return -1
    if (s.charAt(at + 1) == '#') {
      val hex = at + 2 < n && s.charAt(at + 2) == 'x'
      val d0 = if (hex) at + 3 else at + 2
      val maxDigits = if (hex) 6 else 7
      var j = d0
      var cp = 0
      while (j < n && s.charAt(j) != ';') {
        val c = s.charAt(j)
        val v =
          if (c >= '0' && c <= '9') c - '0'
          else if (hex && c >= 'a' && c <= 'f') c - 'a' + 10
          else if (hex && c >= 'A' && c <= 'F') c - 'A' + 10
          else return -1
        if (j - d0 >= maxDigits) return -1 // run past the cap: verbatim
        cp = cp * (if (hex) 16 else 10) + v
        j += 1
      }
      if (j >= n || j == d0) return -1 // no ';' / empty digit run
      if (cp > 0x10FFFF || (cp >= 0xD800 && cp <= 0xDFFF)) return -1
      sb.appendCodePoint(cp)
      j + 1
    } else {
      var k = 0
      while (k < Names.length) {
        val name = Names(k)
        if (s.regionMatches(at + 1, name, 0, name.length)) {
          sb.append(Chars(k)); return at + 1 + name.length
        }
        k += 1
      }
      -1
    }
  }
}
