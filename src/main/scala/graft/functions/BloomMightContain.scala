package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftSqlBridge.AbstractDataType
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst expression: bloom-filter membership probe.
  *
  * The map-side pre-filter of a bloom semi join (see
  * `ExtraQueries.bloom_semi_join`) runs once per FACT row — at 100 TB
  * that is the hottest scan in the plan, so it must stay inside
  * whole-stage codegen. A Scala UDF there is the classic anti-pattern:
  * it boxes every key, breaks the codegen span in half, and hides the
  * predicate from Catalyst. This expression instead ships the built
  * filter as a codegen reference object (broadcast-equivalent in
  * local mode; the task-binary ships it to executors on a cluster) and
  * compiles the probe to a direct `mightContainLong` call — same
  * technique as Spark's own runtime-injected `BloomFilterMightContain`.
  *
  * False positives only, never false negatives, so a residual exact
  * semi join downstream keeps the result exact.
  */
case class BloomMightContain(child: Expression, bloom: BloomFilter)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomRef = ctx.addReferenceObj("bloomFilter", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $bloomRef.mightContainLong($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  /** Column-API entry point: probe `bloom` with a long key column. */
  def apply(key: Column, bloom: BloomFilter): Column =
    GraftSqlBridge.column(BloomMightContain(GraftSqlBridge.expression(key), bloom))
}
