package graft

import org.apache.spark.sql.functions._

import graft.ops.Dedup
import graft.queries.PrefixJaccard

/** Prefix-filtering guarantees: candidates must be a SUPERSET of the
  * true >=t pairs (completeness — losing a pair here is silent data
  * corruption at scale) while being a strict subset of the all-pairs
  * collision space (the point of the technique).
  */
class PrefixFilterSpec extends SparkSpec {
  import spark.implicits._

  private val t = 0.5

  test("prefix candidates contain every true >=t pair (completeness)") {
    val result = PrefixJaccard.run(spark, sf0001, t)
      .select("doc_id_1", "doc_id_2").as[(Long, Long)].collect().toSet
    val cands = PrefixJaccard.candidates(spark, sf0001, t)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(result.nonEmpty, "fixture should contain near-duplicate pairs")
    assert(result.subsetOf(cands),
      s"prefix filter LOST pairs: ${result -- cands}")
  }

  test("candidate stage has no single-partition Exchange; verify never broadcasts the corpus") {
    // Scale invariant (verdict r3 #1): a SinglePartition exchange means
    // some stage funnels the dictionary/corpus through one task.
    val candPlan = PrefixJaccard.candidates(spark, sf0001, t)
      .queryExecution.executedPlan.toString
    assert(!candPlan.contains("SinglePartition"),
      s"candidate stage funnels through one partition:\n$candPlan")
    val fullPlan = PrefixJaccard.run(spark, sf0001, t)
      .queryExecution.executedPlan.toString
    assert(!fullPlan.contains("SinglePartition"),
      "full pipeline has a single-partition Exchange")
    // The docset (corpus-sized) side must reach BOTH verify joins via
    // shuffle, not broadcast — the shuffle_hash hints must have stuck.
    // (The dictionary join inside the candidate stage MAY auto-broadcast
    // at this fixture size; that choice is size-based, so it adaptively
    // flips to a shuffle join when the dictionary outgrows the
    // threshold — not a pinned scale hazard like an explicit
    // broadcast() would be.)
    val shjCount = "ShuffledHashJoin".r.findAllIn(fullPlan).length
    assert(shjCount >= 2,
      s"expected both verify joins (d1, d2) as ShuffledHashJoin, found $shjCount:\n$fullPlan")
  }

  test("prefix filtering prunes the collision pair space") {
    val dsh = Dedup.distinctShingles(
      Tables.load(spark, sf0001, "documents").select("doc_id", "text"),
      "doc_id", "text")
    val allPairs = dsh.as("a")
      .join(dsh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).distinct().count()
    val cands = PrefixJaccard.candidates(spark, sf0001, t).count()
    assert(cands < allPairs,
      s"prefix produced $cands candidates vs $allPairs all collision pairs")
  }
}
