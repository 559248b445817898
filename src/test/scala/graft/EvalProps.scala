package graft

/** Randomized checks (seeded, deterministic) for the census-derived
  * order statistics shared by quantile_normalize and winsorize_stats:
  * on ANY integer multiset, the census-cumsum construction must equal
  * the textbook sort-based type-7 interpolated quantile — the census
  * route exists purely so the corpus never has to be globally sorted,
  * so equality with the sorted definition IS its correctness
  * statement. Value ranges are kept tiny to force heavy ties — the
  * case where a naive rank construction (rank-of-first vs rank-range)
  * goes wrong.
  */
class EvalProps extends SparkSpec {

  import graft.queries.EvalQueries

  private def referenceQuantile(sorted: Vector[Int], p: Double): Double = {
    val pos = p * (sorted.length - 1)
    val (lo, hi) = (sorted(pos.floor.toInt), sorted(pos.ceil.toInt))
    if (pos.floor == pos.ceil) lo.toDouble
    else (pos.ceil - pos) * lo + (pos - pos.floor) * hi
  }

  test("censusQuantiles equals the sort-based type-7 quantile on random multisets") {
    import spark.implicits._
    val ps = Seq(0.0, 0.05, 0.25, 0.5, 0.75, 0.95, 1.0)
    val rnd = new scala.util.Random(1234)
    for (trial <- 1 to 20) {
      val n = 1 + rnd.nextInt(60)
      val xs = List.fill(n)(rnd.nextInt(13))
      val got = EvalQueries.censusQuantiles(xs.toDF("n_chars"), ps)
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      val sorted = xs.sorted.toVector
      ps.zipWithIndex.foreach { case (p, k) =>
        val expect = referenceQuantile(sorted, p)
        assert(got(k) === expect,
          s"trial $trial p=$p over $n values: got ${got(k)}, expected $expect")
      }
    }
  }

  test("quantiles are monotone in p and bounded by the extremes") {
    import spark.implicits._
    val ps = (0 to 10).map(_ / 10.0)
    val rnd = new scala.util.Random(99)
    for (_ <- 1 to 8) {
      val xs = List.fill(1 + rnd.nextInt(40))(rnd.nextInt(9))
      val qs = EvalQueries.censusQuantiles(xs.toDF("n_chars"), ps)
        .orderBy("k").collect().map(_.getDouble(1))
      assert(qs.zip(qs.tail).forall { case (a, b) => b >= a },
        s"not monotone: ${qs.mkString(",")}")
      assert(qs.head === xs.min.toDouble && qs.last === xs.max.toDouble)
    }
  }
}
