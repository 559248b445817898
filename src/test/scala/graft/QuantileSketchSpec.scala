package graft

import org.apache.spark.sql.functions._

import graft.functions.{QuantileSketch, QuantileSketchAgg}

/** KLL quantile sketch: weight accounting, rank-error bound vs the
  * exact sort, and merge stability across partitionings.
  */
class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  private def rankError(sorted: Array[Double], est: Double, p: Double): Double = {
    // rank of the estimate = share of values strictly below it; for a
    // valid sketch answer this sits within eps of p
    val below = sorted.count(_ < est).toDouble
    math.abs(below / sorted.length - p)
  }

  test("n is exact and small inputs are exact") {
    val sk = new QuantileSketch(64)
    (1 to 50).foreach(v => sk.add(v.toDouble))
    assert(sk.n === 50)
    // below k items nothing compacts: quantiles are exact lower quantiles
    assert(sk.quantile(0.0) === 1.0)
    assert(sk.quantile(0.5) === 25.0) // floor(0.5*49)=24 -> 25th value
    assert(sk.quantile(1.0) === 50.0)
  }

  test("rank error stays under 3% against the exact sort (adversarial orders)") {
    val n = 60000
    val asc = (1 to n).map(_.toDouble)
    val desc = asc.reverse
    // deterministic shuffle: md5-ish affine scramble
    val scrambled = asc.sortBy(v => (v.toLong * 48271) % 2147483647)
    val exact = asc.toArray // already sorted
    for ((order, tag) <- Seq(asc -> "asc", desc -> "desc", scrambled -> "scrambled")) {
      val sk = new QuantileSketch(256)
      order.foreach(sk.add)
      assert(sk.n === n)
      for (p <- Seq(0.01, 0.25, 0.5, 0.75, 0.99)) {
        val err = rankError(exact, sk.quantile(p), p)
        assert(err <= 0.03, s"$tag p=$p rank error $err")
      }
    }
  }

  test("merge preserves exact n and the error bound") {
    val parts = (0 until 8).map { pid =>
      val sk = new QuantileSketch(256)
      (pid until 60000 by 8).foreach(v => sk.add(v.toDouble))
      sk
    }
    val merged = parts.reduce { (a, b) => a.mergeIn(b); a }
    assert(merged.n === 60000)
    val exact = (0 until 60000).map(_.toDouble).toArray
    for (p <- Seq(0.1, 0.5, 0.9)) {
      val err = rankError(exact, merged.quantile(p), p)
      assert(err <= 0.03, s"merged p=$p rank error $err")
    }
  }

  test("serde round-trip preserves state") {
    val sk = new QuantileSketch(64)
    (1 to 10000).foreach(v => sk.add(v.toDouble))
    val back = QuantileSketch.fromBytes(sk.toBytes)
    assert(back.n === sk.n)
    for (p <- Seq(0.25, 0.5, 0.75))
      assert(back.quantile(p) === sk.quantile(p))
  }

  test("aggregate matches the exact percentiles query within bound at sf0.001") {
    val li = Tables.load(spark, sf0001, "lineitem")
      .select("l_returnflag", "l_extendedprice")
    val est = li.groupBy("l_returnflag")
      .agg(QuantileSketchAgg(col("l_extendedprice"), 256,
        Seq(0.25, 0.5, 0.75)).as("qs"))
      .select(col("l_returnflag"), col("qs"))
      .as[(String, Seq[Double])].collect().toMap
    val groups = li.as[(String, Double)].collect().groupBy(_._1)
    for ((flag, rows) <- groups) {
      val sorted = rows.map(_._2).sorted
      for ((p, i) <- Seq(0.25, 0.5, 0.75).zipWithIndex) {
        val err = rankError(sorted, est(flag)(i), p)
        assert(err <= 0.03, s"$flag p=$p rank error $err")
      }
    }
  }

  test("null inputs are skipped; all-null group evaluates to null") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("b", None))
      .toDF("g", "v")
    val got = df.groupBy("g")
      .agg(QuantileSketchAgg(col("v"), 64, Seq(0.5)).as("qs"))
      .select(col("g"), col("qs")).as[(String, Option[Seq[Double]])]
      .collect().toMap
    assert(got("a") === Some(Seq(1.0)))
    assert(got("b") === None)
  }
}
