package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.catalyst.util.GenericArrayData

import graft.functions.CentroidAssign

/** Property check: the native CentroidAssign loop equals an
  * independent spec of the composed column semantics —
  * `ivfAssign(centroidSims(...))` = first index whose rounded dot is
  * >= every later one, with each dot a left fold of
  * double(float)*double from 0.0 and each sim rounded 6 dp HALF_UP
  * (Spark's `round`). Pure JVM, no Spark jobs per sample.
  */
object CentroidProps extends Properties("centroid_assign") {

  private def specAssign(v: Array[Float], cents: Array[Array[Double]]): Int = {
    val sims = cents.map { cen =>
      var s = 0.0
      var i = 0
      val d = math.min(v.length, cen.length)
      while (i < d) { s += v(i).toDouble * cen(i); i += 1 }
      java.math.BigDecimal.valueOf(s)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    }
    // ivfAssign: first c with sims(c) >= sims(o) for all o > c
    (0 until sims.length - 1)
      .find(c => (c + 1 until sims.length).forall(o => sims(c) >= sims(o)))
      .getOrElse(sims.length - 1)
  }

  private val genVec: Gen[Array[Float]] = for {
    d <- Gen.chooseNum(1, 16)
    vs <- Gen.listOfN(d, Gen.chooseNum(-2.0f, 2.0f))
  } yield vs.toArray

  private val genCents: Gen[Array[Array[Double]]] = for {
    k <- Gen.chooseNum(1, 5)
    d <- Gen.chooseNum(1, 16)
    rows <- Gen.listOfN(k, Gen.listOfN(d, Gen.chooseNum(-1.0, 1.0)))
  } yield rows.map(_.toArray).toArray

  property("native loop equals composed-column spec") =
    forAll(genVec, genCents) { (v, cents) =>
      val expr = CentroidAssign(
        org.apache.spark.sql.catalyst.expressions.Literal(1), cents)
      expr.assign(new GenericArrayData(v.map(x => x: Any))) == specAssign(v, cents)
    }

  property("identical sims tie to the lowest index") =
    forAll(genVec) { v =>
      val cen = Array.fill(3)(Array.fill(v.length)(0.5))
      val expr = CentroidAssign(
        org.apache.spark.sql.catalyst.expressions.Literal(1), cen)
      expr.assign(new GenericArrayData(v.map(x => x: Any))) == 0
    }
}
