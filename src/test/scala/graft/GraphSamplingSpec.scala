package graft

import org.apache.spark.sql.functions._

/** Invariants for the dup-graph PageRank and the deterministic
  * weighted sampler (value-level parity is pinned by the DuckDB
  * oracle; these pin the algebra the oracle can't see).
  */
class GraphSamplingSpec extends SparkSpec {

  private def run(name: String, dir: String) =
    SparkEntry.allQueries.find(_.name == name).get.run(spark, dir)

  test("pagerank holds the damping floor and conserves mass") {
    val rows = run("pagerank_dups", sf001).collect()
    assert(rows.nonEmpty)
    // every node receives at least the teleport mass
    rows.foreach(r => assert(r.getDouble(1) >= 0.15 - 1e-9,
      s"doc ${r.getLong(0)} below damping floor: ${r.getDouble(1)}"))
    // no dangling nodes (deg >= 1 by construction) => total rank
    // approaches N; 3 iterations from r0 = 1 stay within a few %
    val n = rows.length.toDouble
    val mass = rows.map(_.getDouble(1)).sum
    assert(math.abs(mass - n) / n < 0.1, s"rank mass $mass vs $n nodes")
    // hubs outrank leaves: max-degree node vs a degree-minimal node
    val byDeg = rows.sortBy(_.getLong(2))
    assert(byDeg.last.getDouble(1) >= byDeg.head.getDouble(1))
  }

  test("weighted_sample takes min(k, eligible) per source with valid keys") {
    val rows = run("weighted_sample", sf001).collect()
    val perSource = rows.groupBy(_.getString(0)).view.mapValues(_.length)
    val eligible = Tables.load(spark, sf001, "documents")
      .where(col("n_chars") > 0)
      .groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    eligible.foreach { case (src, n) =>
      assert(perSource.getOrElse(src, 0) == math.min(5L, n),
        s"source $src: got ${perSource.getOrElse(src, 0)} of $n eligible")
    }
    // -ln(u)/w with u in (0,1] is non-negative
    rows.foreach(r => assert(r.getDouble(3) >= 0.0))
  }
}
