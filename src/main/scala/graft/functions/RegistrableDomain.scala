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

  /** Compiled suffix table: O(1) membership + the label-depth bound
    * that caps the right-to-left candidate walk.
    */
  final class Table(val set: java.util.HashSet[String], val maxLabels: Int)
      extends Serializable

  def compile(suffixes: Seq[String]): Table = {
    val set = new java.util.HashSet[String]()
    suffixes.foreach(set.add)
    val maxLabels =
      if (suffixes.isEmpty) 1
      else suffixes.map(_.count(_ == '.') + 1).max
    new Table(set, maxLabels)
  }

  /** Longest-suffix fold; called from interpreted eval and generated
    * code. Candidate suffixes are the host's last k labels for k from
    * min(maxLabels, nLabels) down to 1 — first (longest) hit wins.
    */
  def fold(t: Table, host: String): String = {
    val parts = host.split('.')
    val nl = parts.length
    var k = math.min(t.maxLabels, nl)
    while (k >= 1) {
      if (t.set.contains(join(parts, nl - k))) {
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
