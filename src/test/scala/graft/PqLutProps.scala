package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.catalyst.util.GenericArrayData

import graft.functions.PqLut

/** Property check: the native PqLut loop equals an independent spec of
  * the composed column semantics it replaced — entry [m*K + c] is the
  * dot of subvector m with codebook entry c, each term
  * double(float)*double, left-folded from 0.0, rounded 6 dp HALF_UP
  * (Spark's `round`). Pure JVM, no Spark jobs per sample — the
  * fixture-level pin against the actual composed columns lives in
  * KMeansSpec.
  */
object PqLutProps extends Properties("pq_lut") {

  private def specLut(v: Array[Float],
                      cbs: Array[Array[Array[Double]]]): Array[Double] = {
    val m = cbs.length
    val k = cbs(0).length
    val sub = cbs(0)(0).length
    val out = new Array[Double](m * k)
    for (mi <- 0 until m; c <- 0 until k) {
      var s = 0.0
      var i = 0
      while (i < sub) { s += v(mi * sub + i).toDouble * cbs(mi)(c)(i); i += 1 }
      out(mi * k + c) = java.math.BigDecimal.valueOf(s)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    }
    out
  }

  private val genCase: Gen[(Array[Float], Array[Array[Array[Double]]])] = for {
    m <- Gen.chooseNum(1, 4)
    sub <- Gen.chooseNum(1, 6)
    k <- Gen.chooseNum(1, 5)
    vs <- Gen.listOfN(m * sub, Gen.chooseNum(-2.0f, 2.0f))
    cbs <- Gen.listOfN(m,
      Gen.listOfN(k, Gen.listOfN(sub, Gen.chooseNum(-1.0, 1.0))))
  } yield (vs.toArray, cbs.map(_.map(_.toArray).toArray).toArray)

  property("native loop equals composed-column spec") =
    forAll(genCase) { case (v, cbs) =>
      val expr = PqLut(
        org.apache.spark.sql.catalyst.expressions.Literal(1), cbs)
      val got = expr.lut(new GenericArrayData(v.map(x => x: Any)))
        .toDoubleArray()
      got.sameElements(specLut(v, cbs))
    }
}
