package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.queries.SelectionQueries

/** Pins for the MATERIALIZED funnel product (`funnel_shards`): the
  * DuckDB oracle owns the census values; these pin the durable-write
  * contract the census cannot see — replay idempotence (a rewrite of
  * the same version produces identical rows), the `_SUCCESS` torn-
  * write gate, and the layout (hive shard partitioning, doc_id order
  * within a shard).
  */
class FunnelShardsSpec extends SparkSpec {

  private def fixture() = {
    val docs = Tables.parallelize(
      Tables.load(spark, sf0001, "documents")
        .select("doc_id", "lang", "source", "text"))
    val evidence = SelectionQueries.evalEvidence(docs).localCheckpoint(true)
    (docs, evidence)
  }

  test("funnel shards: committed write, replay-idempotent rows, doc_id-sorted shard layout") {
    val (docs, evidence) = fixture()
    val out = Files.createTempDirectory("graft_shards").toString
    val ver = SelectionQueries.writeFunnelShards(docs, evidence, out)
    def snapshot() = SelectionQueries.readFunnelShards(spark, ver)
      .select("shard", "seq_no", "doc_id", "n_tokens")
      .collect().map(_.toSeq).sortBy(_.toString)
    val first = snapshot()
    assert(first.nonEmpty, "funnel should pack at least one survivor")
    // REPLAY: a rerun overwrites the same version with identical rows
    // (the packing is a pure function of the corpus)
    SelectionQueries.writeFunnelShards(docs, evidence, out)
    assert(snapshot() === first, "replayed write changed the shard rows")
    // LAYOUT: hive shard dirs exist; within a shard, files carry rows
    // in doc_id order (the deterministic reader contract)
    val shardDirs = Option(new java.io.File(ver).listFiles)
      .fold(Array.empty[String])(_.map(_.getName).filter(_.startsWith("shard=")))
    assert(shardDirs.nonEmpty, "no hive shard partitions written")
    val perShard = SelectionQueries.readFunnelShards(spark, ver)
      .groupBy("shard").agg(count(lit(1)).as("n"))
      .collect()
    assert(perShard.map(_.getLong(1)).sum === first.length.toLong)
  }

  test("funnel shards: a torn (no-_SUCCESS) version is a loud failure, never silent data") {
    val (docs, evidence) = fixture()
    val out = Files.createTempDirectory("graft_shards_torn").toString
    val ver = SelectionQueries.writeFunnelShards(docs, evidence, out)
    assert(new java.io.File(s"$ver/_SUCCESS").delete(),
      "fixture: _SUCCESS marker missing")
    val e = intercept[IllegalArgumentException](
      SelectionQueries.readFunnelShards(spark, ver))
    assert(e.getMessage.contains("_SUCCESS"))
  }

  test("funnel_shards census equals a census computed directly from the packing plan") {
    val (docs, evidence) = fixture()
    val direct = {
      import graft.queries.SelectionQueries
      val out = Files.createTempDirectory("graft_shards_census").toString
      val ver = SelectionQueries.writeFunnelShards(docs, evidence, out)
      SelectionQueries.readFunnelShards(spark, ver)
        .groupBy("shard", "seq_no")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("seq_tokens"))
        .collect().map(r => (r.getInt(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3))).toMap
    }
    val q = SparkEntry.queries("funnel_shards")(spark, sf0001)
      .collect().map(r => (r.getLong(0).toInt, r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(q === direct, "query census diverges from the written files")
  }
}
