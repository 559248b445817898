package graft

import scala.collection.mutable

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.FreqItemsAgg

/** Property checks of the Misra-Gries kernel — pure JVM (buffer ops
  * driven directly, no Spark jobs per sample): exactness below
  * capacity, the N/(capacity+1) undercount bound and guaranteed
  * heavy-hitter presence above it, and merge/update equivalence for
  * arbitrary stream splits.
  */
object FreqItemsProps extends Properties("freq_items") {

  private def agg(cap: Int) = FreqItemsAgg(
    org.apache.spark.sql.catalyst.expressions.BoundReference(
      0, org.apache.spark.sql.types.StringType, nullable = true), cap)

  /** Drive the PRODUCTION update path: each item arrives as an
    * InternalRow through the bound child expression.
    */
  private def ingest(cap: Int, items: Seq[String]): mutable.HashMap[String, Long] = {
    val a = agg(cap)
    items.foldLeft(a.createAggregationBuffer()) { (b, s) =>
      a.update(b, org.apache.spark.sql.catalyst.InternalRow(
        org.apache.spark.unsafe.types.UTF8String.fromString(s)))
    }
  }

  private val genItems: Gen[List[String]] = for {
    n <- Gen.chooseNum(0, 300)
    xs <- Gen.listOfN(n, Gen.oneOf((0 until 40).map(i => s"w$i")))
  } yield xs

  property("exact when distinct <= capacity") =
    forAll(genItems) { items =>
      val buf = ingest(64, items) // 40 possible items < 64
      val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      buf.toMap == truth
    }

  property("never overcounts; undercount bounded; heavy hitters present") =
    forAll(genItems) { items =>
      val cap = 8
      val buf = ingest(cap, items)
      val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val bound = items.size.toLong / (cap + 1)
      val noOver = buf.forall { case (k, est) => est <= truth.getOrElse(k, 0L) }
      val bounded = truth.forall { case (k, c) => c - buf.getOrElse(k, 0L) <= bound }
      val heaviesPresent = truth.forall { case (k, c) =>
        c <= bound || buf.contains(k)
      }
      noOver && bounded && heaviesPresent
    }

  property("merge of split streams equals the bound, any split point") =
    forAll(genItems, Gen.chooseNum(0, 300)) { (items, cut) =>
      val cap = 8
      val (l, r) = items.splitAt(cut.min(items.size))
      val merged = agg(cap).merge(ingest(cap, l), ingest(cap, r))
      val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val bound = items.size.toLong / (cap + 1)
      merged.size <= cap &&
        merged.forall { case (k, est) => est <= truth.getOrElse(k, 0L) } &&
        truth.forall { case (k, c) => c - merged.getOrElse(k, 0L) <= bound }
    }
}
