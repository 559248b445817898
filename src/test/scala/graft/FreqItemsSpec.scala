package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.FreqItemsAgg

class FreqItemsSpec extends SparkSpec {
  import spark.implicits._

  private def run(items: Seq[String], cap: Int, parts: Int): Seq[(String, Long)] =
    items.toDF("x").repartition(parts)
      .agg(FreqItemsAgg(col("x"), cap).as("fi"))
      .select(explode(col("fi")).as("f"))
      .select("f.item", "f.est").as[(String, Long)].collect().toSeq

  test("exact counts when distinct items fit the capacity") {
    val items = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(10)("c")
    val got = run(items, 8, 5)
    assert(got === Seq(("a", 40L), ("b", 25L), ("c", 10L)))
  }

  test("lossy regime: estimates never exceed truth, heavy hitter survives") {
    // 200 'hot' + 300 singleton noise items, capacity 16:
    // true(hot)=200 > N/(cap+1) = 500/17 ~ 29 -> hot MUST survive,
    // and every estimate is an undercount by at most N/(cap+1)
    val noise = (0 until 300).map(i => s"n$i")
    val items = Seq.fill(200)("hot") ++ noise
    val got = run(items, 16, 7).toMap
    assert(got.contains("hot"), s"heavy hitter evicted: $got")
    val n = items.size.toLong
    val bound = n / 17 + 1
    assert(got("hot") <= 200L && got("hot") >= 200L - bound,
      s"hot estimate ${got("hot")} outside [${200L - bound}, 200]")
    // no estimate exceeds its true count (MG never overcounts)
    got.foreach { case (item, est) =>
      val truth = items.count(_ == item).toLong
      assert(est <= truth, s"$item overcounted: $est > $truth")
    }
  }

  test("partition-count independence in the exact regime") {
    val items = (0 until 50).flatMap(i => Seq.fill(i + 1)(s"w$i"))
    val a = run(items, 64, 1)
    val b = run(items, 64, 13)
    assert(a === b, "exact-regime sketch differs across partitionings")
  }

  test("merge truncation regression: iterate-while-mutating stopped early") {
    // exact buffers from the ScalaCheck counterexample: combined map is
    // {w20: 2} + ten singletons, d = 1 -> sole survivor must be w20.
    // The foreach+update-in-place form visited 2 of 11 entries (scala
    // 2.13 HashMap stops iterating on in-place value update) and left
    // 10 survivors.
    import scala.collection.mutable
    val a = graft.functions.FreqItemsAgg(
      org.apache.spark.sql.catalyst.expressions.BoundReference(
        0, org.apache.spark.sql.types.StringType, nullable = true), 8)
    val b1 = mutable.HashMap("w25" -> 1L, "w30" -> 1L, "w16" -> 1L,
      "w29" -> 1L, "w9" -> 1L, "w18" -> 1L, "w32" -> 1L)
    val b2 = mutable.HashMap("w20" -> 2L, "w13" -> 1L, "w11" -> 1L, "w19" -> 1L)
    val merged = a.merge(b1, b2)
    assert(merged.toMap === Map("w20" -> 1L))
  }

  test("deterministic (est DESC, item ASC) order with ties") {
    val items = Seq("b", "a", "c", "b", "a", "c") // all tied at 2
    val got = run(items, 8, 3)
    assert(got === Seq(("a", 2L), ("b", 2L), ("c", 2L)))
  }
}
