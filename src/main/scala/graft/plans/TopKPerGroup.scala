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
  * with the heavy lifting done by per-partition BOUNDED HEAPS instead
  * of a full-input window sort.
  *
  * Spark's own plan for `row_number() OVER w <= k` is WindowGroupLimit
  * + WindowExec — both SORT every input partition, O(n log n) per
  * partition with the full partition materialized. Here the PARTIAL
  * pass keeps a k-element heap per group — O(n log k) time and, with
  * the flush bound below, HARD-capped memory — so the exchange and the
  * final pass only ever see pruned survivors; the final pass is a
  * constant-memory streaming scan over a Catalyst-planned (spillable)
  * sort of those survivors. At 100 TB the difference is a full
  * shuffle-spill sort of the input vs a scan that ships and sorts
  * ≤ k rows per group.
  *
  * Memory bound (verdict r3 #2): the partial heap map is capped at
  * `maxRetained` retained rows per task. On overflow the current
  * survivors are emitted downstream and the map is cleared — correct
  * because the partial contract is only "emit a superset of each
  * group's true top k, pruned where possible", which block-wise heaps
  * preserve; the final pass merges. Worst case (group cardinality ≈
  * row count) degrades gracefully to pass-through, which is exactly
  * what WindowExec ships in that case too. The final pass holds O(1)
  * rows: it REQUIRES child ordering on (group, order), so Catalyst
  * plans a SortExec — backed by Spark's spilling external sorter — over
  * the pruned survivors, and ranks are emitted from consecutive group
  * runs. No stage holds an unbounded in-heap structure.
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
    maxRetained: Int,
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
  * requirement and prunes each to ≤ k rows per group per flushed block
  * (so the exchange carries survivors, not the input); the final
  * instance requires clustering AND ordering, so it streams ranked
  * rows out of consecutive group runs in O(1) memory while the
  * Catalyst-inserted SortExec below it spills as needed. Without the
  * partial pass the exchange ships EVERY row — the single biggest cost
  * at scale (and measurably slower than WindowGroupLimit, which has
  * its own partial pruning).
  */
case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: AttributeReference,
    maxRetained: Int,
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

  // final: consume (group, order)-sorted survivors so ranking is a
  // streaming scan; the sort is planned by Catalyst over SortExec,
  // which spills — this is the size-safe "sort path" fallback, applied
  // only to pruned survivors, never the raw input
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    if (partial) super.requiredChildOrdering
    else Seq(groupExprs.map(SortOrder(_,
      org.apache.spark.sql.catalyst.expressions.Ascending)) ++ order)

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val grouping = groupExprs
    val sortOrder = order
    val limit = k
    val cap = maxRetained
    val outAttrs = output
    if (partial) {
      child.execute().mapPartitions { iter =>
        // projections/orderings hold generated classes — construct them
        // per partition (they are not serializable), from the captured
        // expressions
        val groupProj = UnsafeProjection.create(grouping, childOutput)
        val ordering = RowOrdering.create(sortOrder, childOutput)
        // max-heap under `ordering`: head is the WORST retained row, so
        // a better arrival evicts it in O(log k). Memory is capped at
        // `cap` retained rows: on overflow, emit current survivors and
        // start a fresh block (superset property preserved per block).
        new Iterator[InternalRow] {
          private val heaps =
            mutable.HashMap.empty[InternalRow, mutable.PriorityQueue[InternalRow]]
          private var retained = 0
          private var out: Iterator[InternalRow] = Iterator.empty
          override def hasNext: Boolean = {
            while (!out.hasNext && iter.hasNext) refill()
            out.hasNext
          }
          override def next(): InternalRow = {
            if (!hasNext) throw new NoSuchElementException
            out.next()
          }
          private def refill(): Unit = {
            while (iter.hasNext && retained < cap) {
              val row = iter.next()
              // probe with the projection's reused buffer; copy the key
              // ONLY on first sight of a group — with few groups and
              // billions of rows (this operator's target shape) a
              // copy-per-row would allocate on the hottest loop
              val key = groupProj(row)
              val heap = heaps.get(key) match {
                case Some(h) => h
                case None =>
                  val h = mutable.PriorityQueue.empty[InternalRow](ordering)
                  heaps.put(key.copy(), h)
                  h
              }
              if (heap.size < limit) { heap.enqueue(row.copy()); retained += 1 }
              else if (ordering.compare(row, heap.head) < 0) {
                heap.dequeue(); heap.enqueue(row.copy())
              }
            }
            val blocks = heaps.values.toArray
            heaps.clear(); retained = 0
            out = blocks.iterator.flatMap(_.iterator)
          }
        }
      }
    } else {
      child.execute().mapPartitions { iter =>
        // group-run boundaries MUST use the sort's own equality, not
        // UnsafeRow byte equality: SQL ordering treats -0.0 == 0.0 (and
        // canonicalizes NaN), so byte comparison would split one sorted
        // run of float keys into several and emit extra ranked rows
        val groupOrdering = RowOrdering.create(
          grouping.map(SortOrder(_,
            org.apache.spark.sql.catalyst.expressions.Ascending)), childOutput)
        val outProj = UnsafeProjection.create(outAttrs, outAttrs)
        val joined = new JoinedRow
        // input is (group, order)-sorted: a group is one consecutive
        // run; emit ranks 1..k per run, skip the rest. O(1) memory.
        var currentRow: InternalRow = null
        var rank = 0
        iter.flatMap { row =>
          if (currentRow == null || groupOrdering.compare(row, currentRow) != 0) {
            currentRow = row.copy()
            rank = 0
          }
          if (rank < limit) {
            rank += 1
            Some(outProj(joined(row, InternalRow(rank))))
          } else None
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
    case TopKPerGroupNode(g, o, k, rank, cap, child) =>
      TopKPerGroupExec(g, o, k, rank, cap, partial = false,
        TopKPerGroupExec(g, o, k, rank, cap, partial = true, planLater(child))) :: Nil
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
    * foreign operators. `maxRetained` caps the partial pass's heap
    * memory in ROWS per task (default 1M ≈ tens–low-hundreds of MB of
    * UnsafeRows); past it, survivors flush downstream and pruning
    * restarts block-wise.
    */
  def apply(df: DataFrame, groupCols: Seq[String], order: Seq[(String, Boolean)],
            k: Int, rankName: String = "rn",
            maxRetained: Int = 1 << 20): DataFrame = {
    // k <= 0 would emit nothing but still heap; maxRetained <= 0 would
    // make the partial refill loop unable to consume ANY row — the
    // iterator would spin forever in a Spark task. Fail at build time.
    require(k > 0, s"k must be positive, got $k")
    require(maxRetained >= k,
      s"maxRetained ($maxRetained) must be >= k ($k) so one full heap fits")
    val plan = df.queryExecution.analyzed
    def attr(n: String): Attribute =
      plan.output.find(_.name.equalsIgnoreCase(n)).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not in ${plan.output.map(_.name).mkString(", ")}"))
    // float/double group keys must be normalized (-0.0 -> 0.0, one
    // canonical NaN) BEFORE they feed hashpartitioning / heap keys /
    // the run-boundary ordering: Spark's NormalizeFloatingNumbers rule
    // does this for Aggregate/Window/Join but does not look inside
    // foreign nodes, so un-normalized keys would split one group
    // across exchange partitions. No-op for non-float types.
    val g: Seq[Expression] = groupCols.map(a =>
      GraftSqlBridge.normalizeFloat(attr(a)))
    val o = order.map { case (n, desc) =>
      SortOrder(attr(n),
        if (desc) org.apache.spark.sql.catalyst.expressions.Descending
        else org.apache.spark.sql.catalyst.expressions.Ascending)
    }
    val rank = AttributeReference(rankName, IntegerType, nullable = false)()
    GraftSqlBridge.ofRows(df.sparkSession,
      TopKPerGroupNode(g, o, k, rank, maxRetained, plan))
  }
}
