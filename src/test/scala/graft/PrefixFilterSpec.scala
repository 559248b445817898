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
