package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualTo, Expression, IsNull}
import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the "null probe" idiom
  *
  *   SELECT <left cols> FROM l LEFT OUTER JOIN r ON l.k = r.k
  *   WHERE r.k IS NULL
  *
  * into a LEFT ANTI join. This is the literal shape of the reference's
  * blocked-users check (leftJoin + null filter,
  * KafkaStreamApp.java:157-166) and the most common hand-written
  * anti-join; Catalyst (4.1) does NOT perform this rewrite itself —
  * the left-outer plan materializes every matched row only to discard
  * it, and at scale carries the full right side through the join.
  *
  * Soundness conditions checked:
  *  - the IS NULL column is a bare attribute of the RIGHT side that
  *    appears as one side of an equi-join conjunct (so a matched row
  *    can never have it null — equality never matches null);
  *  - the parent Project references only LEFT-side output (the anti
  *    join drops right columns from scope).
  */
object RewriteNullProbeAsAntiJoin extends Rule[LogicalPlan] {

  private def equalityAttrs(cond: Expression): Seq[Attribute] = cond match {
    case And(l, r) => equalityAttrs(l) ++ equalityAttrs(r)
    case EqualTo(a: Attribute, b: Attribute) => Seq(a, b)
    case EqualTo(a: Attribute, _) => Seq(a)
    case EqualTo(_, b: Attribute) => Seq(b)
    case _ => Seq.empty
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projList,
        Filter(IsNull(probe: Attribute),
          j @ Join(left, right, LeftOuter, Some(cond), _)))
        if right.outputSet.contains(probe)
          && equalityAttrs(cond).exists(_.semanticEquals(probe))
          && projList.forall(_.references.subsetOf(left.outputSet)) =>
      p.copy(child = j.copy(joinType = LeftAnti))
  }
}
