package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Whole-operator extension (the custom LogicalPlan + Strategy +
  * SparkPlan rung of the ladder): top-k rows per group with their rank,
  * executed as per-partition BOUNDED HEAPS instead of a window sort.
  *
  * Spark's own plan for `row_number() OVER w <= k` is WindowGroupLimit
  * + WindowExec — both SORT every input partition, O(n log n) per
  * partition with the full partition materialized. This operator keeps
  * a k-element heap per group: O(n log k) time, O(groups × k) memory,
  * no sort buffer, and the final per-group sort touches k rows. At
  * 100 TB the difference is a full shuffle-spill sort vs a scan that
  * retains k rows per group per task.
  *
  * One exchange on the group keys is still required (and requested via
  * `requiredChildDistribution`, so Catalyst plans it — or elides it if
  * the child is already clustered, e.g. bucketed tables). A map-side
  * pre-heap could cut shuffle volume further; the aggregate-based
  * `TopKAgg` already covers that shape, this operator covers the
  * row-preserving one.
  *
  * The caller's `order` must be a TOTAL order (unique tie-break) for
  * deterministic output — same contract as every ranked query here.
  */
case class TopKPerGroupNode(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: AttributeReference,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  // rankAttr is born here, not read from the child — without this,
  // CheckAnalysis flags it as a missing input attribute
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupNode =
    copy(child = newChild)
}

/** Two-phase execution, mirroring partial/final aggregation: the
  * `partial` instance runs on raw input partitions with NO distribution
  * requirement and prunes each to ≤ k rows per group (so the exchange
  * carries k·groups rows per task, not the input); the final instance
  * requires clustering, merges the per-partition survivors, and emits
  * ranks. Without the partial pass the exchange ships EVERY row — the
  * single biggest cost at scale (and measurably slower than
  * WindowGroupLimit, which has its own partial pruning).
  */
case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: AttributeReference,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] =
    if (partial) child.output else child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      if (partial) Nil else rankAttr :: Nil)

  // final: all surviving rows of a group meet in one task (Catalyst
  // inserts the hash exchange or reuses an existing clustering);
  // partial: runs wherever the data already is
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) super.requiredChildDistribution
    else ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val grouping = groupExprs
    val sortOrder = order
    val limit = k
    val outAttrs = output
    val isPartial = partial
    child.execute().mapPartitions { iter =>
      // projections/orderings hold generated classes — construct them
      // per partition (they are not serializable), from the captured
      // expressions
      val groupProj = UnsafeProjection.create(grouping, childOutput)
      val ordering = RowOrdering.create(sortOrder, childOutput)
      // max-heap under `ordering`: head is the WORST retained row, so
      // a better arrival evicts it in O(log k)
      val heaps = mutable.HashMap.empty[InternalRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val heap = heaps.getOrElseUpdate(groupProj(row).copy(),
          mutable.PriorityQueue.empty[InternalRow](ordering))
        if (heap.size < limit) heap.enqueue(row.copy())
        else if (ordering.compare(row, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(row.copy())
        }
      }
      if (isPartial) {
        // survivors only, no ranks — order irrelevant, the final pass
        // re-heaps
        heaps.valuesIterator.flatMap(_.iterator)
      } else {
        val outProj = UnsafeProjection.create(outAttrs, outAttrs)
        val joined = new JoinedRow
        heaps.iterator.flatMap { case (_, heap) =>
          val ranked: Seq[InternalRow] = heap.dequeueAll.reverse
          ranked.iterator.zipWithIndex.map { case (row, i) =>
            outProj(joined(row, InternalRow(i + 1)))
          }
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

/** Planner strategy translating the logical node — injected by
  * [[GraftExtensions]].
  */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(g, o, k, rank, child) =>
      TopKPerGroupExec(g, o, k, rank, partial = false,
        TopKPerGroupExec(g, o, k, rank, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopKPerGroup {

  /** Entry point: top `k` rows of `df` per `groupCols`, ordered by
    * `order` — (column name, descending?) pairs forming a TOTAL order
    * — plus a 1-based `rn` column: the output contract of
    * `row_number() OVER w <= k`. Columns are resolved here against the
    * analyzed child (name-based), so the node enters the plan fully
    * resolved — the analyzer does not resolve expressions inside
    * foreign operators.
    */
  def apply(df: DataFrame, groupCols: Seq[String], order: Seq[(String, Boolean)],
            k: Int, rankName: String = "rn"): DataFrame = {
    val plan = df.queryExecution.analyzed
    def attr(n: String): Attribute =
      plan.output.find(_.name.equalsIgnoreCase(n)).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not in ${plan.output.map(_.name).mkString(", ")}"))
    val g = groupCols.map(attr)
    val o = order.map { case (n, desc) =>
      SortOrder(attr(n),
        if (desc) org.apache.spark.sql.catalyst.expressions.Descending
        else org.apache.spark.sql.catalyst.expressions.Ascending)
    }
    val rank = AttributeReference(rankName, IntegerType, nullable = false)()
    GraftSqlBridge.ofRows(df.sparkSession,
      TopKPerGroupNode(g, o, k, rank, plan))
  }
}
