package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.JaroWinkler

/** Pins for the native Jaro-Winkler expression. The er_jaro_winkler
  * oracle run IS the cross-engine parity proof (6-dp hash-exact vs
  * DuckDB's jaro_winkler_similarity over every blocked pair); these
  * pin the algebraic invariants, the published known answers, the
  * DuckDB edge conventions, and interpreted-vs-codegen agreement.
  */
class JaroWinklerProps extends SparkSpec {

  private def jw(a: String, b: String): Double =
    JaroWinkler.sim(UTF8String.fromString(a), UTF8String.fromString(b))

  test("known answers match the published values (and DuckDB bitwise)") {
    assert(jw("martha", "marhta") === 0.9611111111111111)
    assert(jw("DIXON", "DICKSONX") === 0.8133333333333332)
    assert(jw("abcd", "abcd") === 1.0)
    // below the 0.7 boost threshold the prefix bonus must NOT apply
    assert(jw("abcdxxxxxx", "abcdyyyyyy") === 0.6)
  }

  test("DuckDB edge conventions: empty sides score 0, window-0 transposition") {
    assert(jw("", "") === 0.0, "both-empty is 0.0 in DuckDB, not 1.0")
    assert(jw("", "abc") === 0.0)
    assert(jw("abc", "") === 0.0)
    // |a|=|b|=2 gives match window 0: 'ab' vs 'ba' has NO matches
    assert(jw("ab", "ba") === 0.0)
  }

  test("symmetry, range, and identity hold on random strings") {
    val rnd = new scala.util.Random(42)
    def word(): String =
      Seq.fill(rnd.nextInt(13))(('a' + rnd.nextInt(6)).toChar).mkString
    (1 to 2000).foreach { _ =>
      val (a, b) = (word(), word())
      val s = jw(a, b)
      assert(s >= 0.0 && s <= 1.0, s"'$a' '$b' -> $s")
      assert(s === jw(b, a), s"asymmetric on '$a' '$b'")
      if (a.nonEmpty) assert(jw(a, a) === 1.0)
    }
  }

  test("prefix bonus is monotone: sharing a longer prefix never scores lower") {
    // same suffix edited, growing agreed prefix
    val base = "qwertyuiop"
    val scores = (0 to 4).map { l =>
      jw(base, base.take(l) + "zzzzzz")
    }
    // not necessarily monotone in general strings, but for this
    // family each added agreed char weakly increases similarity
    scores.zip(scores.tail).foreach { case (x, y) => assert(x <= y) }
  }

  test("interpreted eval and whole-stage codegen agree through the Column API") {
    import spark.implicits._
    val pairs = Seq(("martha", "marhta"), ("DIXON", "DICKSONX"),
      ("small ring", "small rings"), ("", ""), ("ab", "ba"))
    // go through spark.range so ConvertToLocalRelation cannot fold the
    // projection away — the expression must run inside generated code
    val df = spark.range(pairs.size)
      .select(
        element_at(lit(pairs.map(_._1).toArray), col("id").cast("int") + 1).as("a"),
        element_at(lit(pairs.map(_._2).toArray), col("id").cast("int") + 1).as("b"))
    val viaPlan = df.select(JaroWinkler(col("a"), col("b"))).as[Double].collect()
    val direct = pairs.map { case (a, b) => jw(a, b) }
    assert(viaPlan.toSeq === direct)
    // and the projection stays inside whole-stage codegen (the "*(n)"
    // prefix in the executed plan; no CodegenFallback wrapper)
    val plan = df.select(JaroWinkler(col("a"), col("b")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("jaro_winkler"),
      s"codegen lost:\n$plan")
  }
}
