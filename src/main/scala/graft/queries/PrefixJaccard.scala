package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Dedup

/** Prefix-filtered exact Jaccard self-join — see the
  * `dedup_prefix_jaccard` query comment for the algorithm; split out
  * so PrefixFilterSpec can exercise the candidate stage alone.
  *
  * Scale shape: the global rarity ranking is a dictionary-sized sort
  * (the same build step every PPJoin implementation pays, broadcastable
  * after aggregation); prefixes shrink each doc to a
  * (1 - t)-fraction of its set; candidate generation is in-bucket pair
  * expansion on prefix shingles only; exact verification touches the
  * candidate pairs, never the all-pairs space. Verification compares
  * per-doc arrays of 64-bit shingle hashes (xxhash64 — ~1e-12
  * collision odds across the corpus vs per-doc set sizes; an intra-doc
  * collision would distort the intersection count), sized so the
  * whole docset table broadcasts and the verify join is shuffle-free:
  * arrays of longs are ~5x smaller than the shingle strings.
  */
object PrefixJaccard {

  /** (doc_id, shingle, n, pos) with pos ordered by global rarity. */
  private def rankedShingles(s: SparkSession, dir: String): DataFrame = {
    val dsh = Dedup.distinctShingles(
      Tables.parallelize(Tables.load(s, dir, "documents")
        .select("doc_id", "text")), "doc_id", "text")
      .withColumn("n", count(lit(1)).over(Window.partitionBy("doc_id")))
    // dictionary: global shingle frequencies, rarity rank = total order
    // (freq asc, shingle asc). The single-partition window is over the
    // aggregated DICTIONARY, not the corpus.
    val dict = dsh.groupBy("shingle").agg(count(lit(1)).as("freq"))
      .withColumn("rank",
        row_number().over(Window.orderBy(col("freq"), col("shingle"))))
      .select("shingle", "rank")
    dsh.join(dict, "shingle")
      .withColumn("pos", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("rank"))))
  }

  /** Candidate pairs (d1 < d2, with set sizes) from prefix collisions. */
  private[graft] def candidates(s: SparkSession, dir: String, t: Double): DataFrame =
    rankedShingles(s, dir)
      // prefix length n - ceil(t*n) + 1: a pair with J >= t MUST
      // collide inside both prefixes under any consistent global order
      .filter(col("pos") <= col("n") - ceil(lit(t) * col("n")) + 1)
      .groupBy("shingle")
      .agg(sort_array(collect_set(struct(col("doc_id"), col("n")))).as("xs"))
      .filter(size(col("xs")) > 1)
      .select(explode(flatten(transform(col("xs"), (x, i) =>
        transform(slice(col("xs"), i + 2, size(col("xs"))),
          y => struct(x.as("a"), y.as("b")))))).as("p"))
      .select(col("p.a.doc_id").as("d1"), col("p.b.doc_id").as("d2"),
        col("p.a.n").as("na"), col("p.b.n").as("nb"))
      // PPJoin length filter: J >= t forces t*|A| <= |B| <= |A|/t —
      // prune before the distinct shuffle and the verify join
      // (completeness preserved; ~24% of candidates on the fixture)
      .filter(lit(t) * col("na") <= col("nb") && col("nb") <= col("na") / lit(t))
      .distinct()

  /** Full pipeline: candidates -> exact verify -> threshold. */
  def run(s: SparkSession, dir: String, t: Double): DataFrame = {
    val docsets = Dedup.distinctShingles(
      Tables.load(s, dir, "documents").select("doc_id", "text"),
      "doc_id", "text")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(xxhash64(col("shingle")))).as("toks"))
    val cands = candidates(s, dir, t)
    val inter = size(array_intersect(col("t1"), col("t2")))
    cands
      .join(broadcast(docsets.select(col("doc_id").as("d1"), col("toks").as("t1"))), "d1")
      .join(broadcast(docsets.select(col("doc_id").as("d2"), col("toks").as("t2"))), "d2")
      .select(col("d1").as("doc_id_1"), col("d2").as("doc_id_2"),
        (inter * lit(1.0) / (col("na") + col("nb") - inter)).as("j"))
      .filter(col("j") >= t)
      .select(col("doc_id_1"), col("doc_id_2"), round(col("j"), 6).as("jaccard"))
      .orderBy("doc_id_1", "doc_id_2")
  }
}
