package graft

import org.apache.spark.sql.functions._

/** Vocabulary-statistics operators (VocabQueries): accounting
  * identities for the Heaps-law stats, the sign and arity of the Zipf
  * fit, and an independent recount of the BPE pair extraction.
  */
class VocabSpec extends SparkSpec {

  private def run(name: String, dir: String) =
    SparkEntry.allQueries.find(_.name == name).get.run(spark, dir)

  test("heaps_vocab invariants: hapax <= types <= tokens, ttr in (0,1]") {
    val rows = run("heaps_vocab", sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nTok, nTyp, nHap, ttr) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(nHap <= nTyp && nTyp <= nTok, s"${r.getString(0)}: $nHap <= $nTyp <= $nTok")
      assert(ttr > 0 && ttr <= 1.0)
    }
    // total tokens must equal a direct whitespace-token count
    val direct = Tables.load(spark, sf001, "documents")
      .select(explode(split(col("text"), " ")).as("t"))
      .where(length(col("t")) > 0).count()
    assert(rows.map(_.getLong(1)).sum == direct)
  }

  test("zipf_slope is negative (frequency falls with rank)") {
    val r = run("zipf_slope", sf001).collect()(0)
    assert(r.getDouble(0) < 0, s"zipf slope ${r.getDouble(0)} not negative")
    assert(r.getLong(1) > 1 && r.getLong(1) <= 100)
  }

  test("bpe_pairs match an independent per-token recount at sf0.001") {
    val got = run("bpe_pairs", sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.forall(_._1.length == 2))
    // counts arrive sorted desc with the pair as tiebreak
    assert(got.sameElements(got.sortBy { case (p, n) => (-n, p) }))
    val manual = Tables.load(spark, sf0001, "documents")
      .select("text").collect()
      .flatMap(_.getString(0).split(" "))
      .filter(_.length > 1)
      .flatMap(w => w.sliding(2))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    got.foreach { case (p, n) =>
      assert(manual(p) == n, s"pair $p: query $n != manual ${manual(p)}")
    }
  }
}
