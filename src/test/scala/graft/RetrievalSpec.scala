package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** Semantic pins for the wave-6 queries (sparse retrieval, NDCG,
  * k-core peel, SPRT, Holt-Winters). The oracle gate owns value-level
  * parity; these pin known-answer constructions: identical docs are
  * perfect sparse neighbors, perfect retrieval scores NDCG 1, pendant
  * pairs peel out of the 2-core, a zero-conversion stream accepts H0,
  * and an exactly-periodic series is fitted with zero error forever.
  */
class RetrievalSpec extends SparkSpec {

  private def run(name: String, dir: String) =
    SparkEntry.queries(name)(spark, dir)

  test("tfidf_cosine_knn: identical docs are cos=1 top neighbors; disjoint docs have none") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_tfidf").toString
    Seq(
      (1L, "apple banana cherry", "en", "s", 19L),
      (2L, "apple banana cherry", "en", "s", 19L),
      (3L, "dog elephant fox", "en", "s", 16L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val rows = run("tfidf_cosine_knn", dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSet === Set((1L, 1, 2L, 1.0), (2L, 1, 1L, 1.0)),
      s"identical docs must be mutual cos=1 rank-1 neighbors, disjoint d3 absent: ${rows.toSeq}")
  }

  test("ndcg_eval: perfect same-label retrieval scores 1.0; lone labels are NULL") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ndcg").toString
    val e1 = Array.tabulate(64)(i => if (i == 0) 1.0f else 0.0f)
    val e2 = Array.tabulate(64)(i => if (i == 1) 1.0f else 0.0f)
    val e3 = Array.tabulate(64)(i => if (i == 2) 1.0f else 0.0f)
    val rows = (0 until 12).map(i => (i.toLong, e1, 0)) ++
      (12 until 17).map(i => (i.toLong, e2, 1)) ++
      Seq((17L, e3, 2)) // the only label-2 vector: no ideal ranking
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val out = run("ndcg_eval", dir).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(out.size === 18)
    (0L until 17L).foreach { q =>
      assert(out(q) === Some(1.0), s"perfect retrieval for q=$q: ${out(q)}")
    }
    assert(out(17L) === None, "a label with no other members has no ideal DCG")
  }

  test("kcore_peel: the dense family survives, the pendant pair peels away") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_kcore").toString
    val core = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val pend = "zulu yankee xray whiskey victor uniform tango sierra"
    val docs = (1 to 4).map(i => (i.toLong, core, "en", "s", core.length.toLong)) ++
      (5 to 6).map(i => (i.toLong, pend, "en", "s", pend.length.toLong))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val rows = run("kcore_peel", dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L),
      s"K4 core keeps degree 3; the degree-1 pendant pair must peel out: $rows")
  }

  test("sprt_boundary: a zero-conversion stream accepts H0; decisions are sticky") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sprt").toString
    val d1 = Timestamp.valueOf("2024-01-01 10:00:00")
    val d2 = Timestamp.valueOf("2024-01-02 10:00:00")
    // 25 non-converting users each day: LLR(25,0) = 25*ln(6/7) < ln(1/19)
    val rows = (1 to 25).map(u => (u.toLong, d1, u.toLong, "view", 1.0,
        null.asInstanceOf[String])) ++
      (1 to 25).map(u => (100L + u, d2, u.toLong, "view", 1.0,
        null.asInstanceOf[String]))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = run("sprt_boundary", dir).orderBy("day").collect()
    assert(out.length === 2)
    assert(out.forall(_.getString(4) === "accept_h0"))
    assert(out.forall(_.getBoolean(5)))
    // exact LLR recompute from the cumulative integers
    val lb = math.log(0.6 / 0.7)
    out.zip(Seq(25L, 50L)).foreach { case (r, n) =>
      assert(r.getLong(1) === n && r.getLong(2) === 0L)
      assert(r.getDouble(3) ===
        BigDecimal(n * lb).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // on the real corpus: decided is monotone and state matches llr
    val real = run("sprt_boundary", sf0001).orderBy("day").collect()
    val decided = real.map(_.getBoolean(5))
    assert(decided.zip(decided.tail).forall { case (a, b) => !a || b },
      "a reached decision must stay decided")
  }

  test("holt_winters: an exactly 24-periodic series is fitted with zero error") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_hw").toString
    val base = Timestamp.valueOf("2024-01-01 00:15:00").getTime
    // value pattern repeats every 24h: hour-of-day h gets (10 + h) units
    val rows = (0 until 96).map { h =>
      (h.toLong, new Timestamp(base + h * 3600000L), 1L, "view",
        10.0 + (h % 24), null.asInstanceOf[String])
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = run("holt_winters", dir).orderBy("t").collect()
    assert(out.length === 96 - 24)
    out.foreach { r =>
      val y = r.getLong(2).toDouble
      assert(r.getDouble(6) === y,
        s"periodic series: one-step forecast must equal y at t=${r.getLong(0)}")
      assert(r.getDouble(4) === 0.0, "trend stays zero")
      assert(r.getDouble(3) === 2150.0, "level stays the 24h mean (cents)")
    }
    // real corpus: smoke the shape — contiguous t, 6dp-rounded outputs
    val real = run("holt_winters", sf0001).orderBy("t").collect()
    assert(real.nonEmpty)
    val ts = real.map(_.getLong(0))
    assert(ts.zip(ts.tail).forall { case (a, b) => b == a + 1 })
  }
}
