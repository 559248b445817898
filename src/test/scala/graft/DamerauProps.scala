package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.DamerauLevenshtein

/** Pins for the native full Damerau-Levenshtein expression. The
  * er_damerau_census oracle run is the corpus-scale cross-engine
  * proof (integer-exact vs DuckDB over every blocked pair); these pin
  * the variant choice (FULL DL, not OSA), metric axioms, and
  * interpreted-vs-codegen agreement.
  */
class DamerauProps extends SparkSpec {

  private def dl(a: String, b: String): Long =
    DamerauLevenshtein.dist(UTF8String.fromString(a), UTF8String.fromString(b))

  test("full-DL fixtures: the CA/ABC discriminator and classics") {
    // the variant discriminator: OSA says 3, full DL says 2
    assert(dl("CA", "ABC") === 2L)
    assert(dl("ab", "ba") === 1L)
    assert(dl("kitten", "sitting") === 3L)
    assert(dl("abcdef", "abcfed") === 2L)
    assert(dl("", "abc") === 3L && dl("abc", "") === 3L && dl("", "") === 0L)
    assert(dl("same", "same") === 0L)
  }

  test("metric axioms on random strings") {
    val rnd = new scala.util.Random(7)
    def word(): String =
      Seq.fill(rnd.nextInt(10))(('a' + rnd.nextInt(4)).toChar).mkString
    (1 to 1500).foreach { _ =>
      val (a, b, c) = (word(), word(), word())
      val ab = dl(a, b)
      assert(ab === dl(b, a), s"symmetry broke on '$a' '$b'")
      assert(ab >= math.abs(a.length - b.length).toLong &&
        ab <= math.max(a.length, b.length).toLong)
      assert((ab == 0) === (a == b))
      assert(ab <= dl(a, c) + dl(c, b), s"triangle broke on '$a' '$b' via '$c'")
      // transpositions only help: DL never exceeds plain levenshtein
      val lev = org.apache.commons.text.similarity.LevenshteinDistance
        .getDefaultInstance.apply(a, b).toLong
      assert(ab <= lev)
    }
  }

  test("interpreted eval and codegen agree through the Column API") {
    val pairs = Seq(("CA", "ABC"), ("ab", "ba"), ("small ring", "small rings"),
      ("", ""), ("kitten", "sitting"))
    val df = spark.range(pairs.size)
      .select(
        element_at(lit(pairs.map(_._1).toArray), col("id").cast("int") + 1).as("a"),
        element_at(lit(pairs.map(_._2).toArray), col("id").cast("int") + 1).as("b"))
    import spark.implicits._
    val viaPlan = df.select(DamerauLevenshtein(col("a"), col("b")))
      .as[Long].collect()
    assert(viaPlan.toSeq === pairs.map { case (a, b) => dl(a, b) })
    val plan = df.select(DamerauLevenshtein(col("a"), col("b")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("damerau_levenshtein"),
      s"codegen lost:\n$plan")
  }

  test("ASCII fast path == generic codepoint path (shift bijection)") {
    // Both comparators depend only on the symbol-EQUALITY pattern and
    // lengths, so shifting every ASCII char into the CJK plane (a
    // bijection) forces the non-ASCII generic path and must give the
    // exact same distance/similarity as the ASCII fast path.
    def shift(s: String): String =
      s.map(c => (c + 0x4E00).toChar).mkString
    val rnd = new scala.util.Random(11)
    def word(): String =
      Seq.fill(rnd.nextInt(24))(('a' + rnd.nextInt(5)).toChar).mkString
    (1 to 2000).foreach { _ =>
      val (a, b) = (word(), word())
      assert(dl(a, b) === dl(shift(a), shift(b)),
        s"DL path divergence on '$a' '$b'")
      val jwA = graft.functions.JaroWinkler.sim(
        UTF8String.fromString(a), UTF8String.fromString(b))
      val jwG = graft.functions.JaroWinkler.sim(
        UTF8String.fromString(shift(a)), UTF8String.fromString(shift(b)))
      assert(jwA === jwG, s"JW path divergence on '$a' '$b'")
    }
    // supplementary-plane sanity: codepoints (not UTF-16 units) are the
    // comparison symbol, so one emoji counts as ONE edit
    assert(dl("a😀b", "ab") === 1L)
  }
}
