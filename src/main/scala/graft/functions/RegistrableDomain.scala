package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: hostname → registrable domain under a
  * public-suffix table (the Mozilla PSL shape): match the LONGEST
  * suffix whose labels equal the host's trailing labels, and return
  * that suffix plus one label. A host that IS a bare public suffix
  * returns itself (there is no registrant to attribute to); a host
  * whose trailing label is unknown to the table falls back to the
  * pre-PSL heuristic (last two labels).
  *
  * This is the production PSL shape at 100 TB: the suffix table is a
  * PLAN-SHIPPED reference object — one per executor, like a broadcast
  * dimension but with zero join in the corpus path — and the fold is a
  * codegen'd scalar, so registrable-domain extraction stays fused into
  * the scan projection. The broadcast-JOIN formulation of the same
  * fold exists too ([[graft.queries.WebCurationQueries]]'
  * `psl_domain_fold`), run against the dimension-bounded distinct-host
  * census where a join is the right shape.
  *
  * Whole-stage-codegen friendly (doGenCode, no CodegenFallback); the
  * DuckDB oracle twin ([[graft.queries.WebCuration.duckDomain]]) runs
  * the same longest-suffix rule as a correlated subquery over the same
  * table as a VALUES list.
  */
case class RegistrableDomain(child: Expression, suffixes: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "registrable_domain"

  @transient private lazy val table: RegistrableDomain.Table =
    RegistrableDomain.compile(suffixes)

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      RegistrableDomain.fold(table, input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("pslTable", table,
      classOf[RegistrableDomain.Table].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.RegistrableDomain.fold($tableRef, $c.toString()));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): RegistrableDomain =
    copy(child = newChild)
}

object RegistrableDomain {

  /** Column-API entry point. */
  def apply(host: Column, suffixes: Seq[String]): Column =
    GraftSqlBridge.column(
      RegistrableDomain(GraftSqlBridge.expression(host), suffixes))

  /** Compiled rule table — the full PSL grammar: literal suffixes,
    * wildcard rules (`*.ck`: ANY single label under the parent is a
    * public suffix), and exception rules (`!www.ck`: despite a
    * matching wildcard, `www.ck` is registrable — its public suffix
    * is the exception minus its leading label). O(1) membership per
    * candidate + the label-depth bound that caps the right-to-left
    * candidate walk.
    */
  final class Table(val exact: java.util.HashSet[String],
                    val wildcardParents: java.util.HashSet[String],
                    val exceptions: java.util.HashSet[String],
                    val maxLabels: Int)
      extends Serializable

  def compile(rules: Seq[String]): Table = {
    val exact = new java.util.HashSet[String]()
    val wild = new java.util.HashSet[String]()
    val exc = new java.util.HashSet[String]()
    var maxLabels = 1
    rules.foreach { r =>
      val labels =
        if (r.startsWith("*.")) { wild.add(r.drop(2)); r.count(_ == '.') + 1 }
        else if (r.startsWith("!")) { exc.add(r.drop(1)); r.count(_ == '.') + 1 }
        else { exact.add(r); r.count(_ == '.') + 1 }
      if (labels > maxLabels) maxLabels = labels
    }
    new Table(exact, wild, exc, maxLabels)
  }

  /** PSL fold; called from interpreted eval and generated code.
    * Exception rules prevail over everything (the PSL algorithm), so
    * they are scanned first; then candidate suffixes — the host's
    * last k labels for k from min(maxLabels, nLabels) down to 1 —
    * match a literal entry or a wildcard (candidate minus its first
    * label is a wildcard parent), longest first.
    *
    * The host is NORMALIZED first — lowercased (the PSL is
    * lowercase; DNS names compare case-insensitively) and stripped of
    * one trailing dot (the FQDN root-dot form) — so real-crawl inputs
    * like `Example.CO.UK` or `example.com.` fold correctly instead of
    * silently missing the table and taking the last-two-labels
    * fallback. Both transforms are no-ops on already-normal hosts,
    * which is what every oracle fixture synthesizes — the DuckDB
    * twins stay byte-equal without their own lower().
    */
  def fold(t: Table, host0: String): String = {
    val lower = host0.toLowerCase(java.util.Locale.ROOT)
    val host =
      if (lower.nonEmpty && lower.charAt(lower.length - 1) == '.')
        lower.substring(0, lower.length - 1)
      else lower
    val parts = host.split('.')
    val nl = parts.length
    // an exception rule's match IS the registrable domain (its public
    // suffix is the rule minus the leading label)
    if (!t.exceptions.isEmpty) {
      var k = math.min(t.maxLabels, nl)
      while (k >= 1) {
        val cand = join(parts, nl - k)
        if (t.exceptions.contains(cand)) return cand
        k -= 1
      }
    }
    var k = math.min(t.maxLabels, nl)
    while (k >= 1) {
      val cand = join(parts, nl - k)
      val isSuffix = t.exact.contains(cand) ||
        (k >= 2 && t.wildcardParents.contains(join(parts, nl - k + 1)))
      if (isSuffix) {
        return if (k == nl) host // the host IS a bare public suffix
        else join(parts, nl - k - 1) // suffix + one label
      }
      k -= 1
    }
    if (nl <= 2) host else join(parts, nl - 2) // unknown TLD: last two
  }

  private def join(parts: Array[String], from: Int): String = {
    val sb = new java.lang.StringBuilder()
    var i = from
    while (i < parts.length) {
      if (i > from) sb.append('.')
      sb.append(parts(i))
      i += 1
    }
    sb.toString
  }
}
