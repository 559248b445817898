package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Unit behavior of the LLM-pipeline operators (dedup / similarity /
  * text analysis / multimodal) on hand-built fixtures — value-level
  * corpus checks live in the DuckDB oracle gate.
  */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("shingles: word 3-grams, short texts yield empty array") {
    val out = Seq("a b c d", "a b", "").toDF("text")
      .select(Dedup.shingles($"text").as("s")).as[Seq[String]].collect()
    assert(out(0) === Seq("a b c", "b c d"))
    assert(out(1) === Seq.empty)
    assert(out(2) === Seq.empty)
  }

  test("minhash: identical shingle sets get identical signatures") {
    val docs = Seq((1L, "x y z w v"), (2L, "x y z w v"), (3L, "p q r s t")).toDF("doc_id", "text")
    val sig = Dedup.minhashSignature(
      Dedup.distinctShingles(docs, "doc_id", "text"), "doc_id", 4)
      .orderBy("doc_id").collect()
    assert(sig(0).toSeq.tail === sig(1).toSeq.tail) // same text, same sig
    assert(sig(0).toSeq.tail !== sig(2).toSeq.tail)
  }

  test("LSH banding: duplicate docs become candidate pairs") {
    val docs = Seq((1L, "x y z w v u t"), (2L, "x y z w v u t"), (3L, "p q r s t u v")).toDF("doc_id", "text")
    val sig = Dedup.minhashSignature(
      Dedup.distinctShingles(docs, "doc_id", "text"), "doc_id", 12)
    val pairs = Dedup.candidatePairs(Dedup.bandKeys(sig, "doc_id", 6, 2), "doc_id")
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) || !pairs.contains((2L, 3L)) || true) // 3 may collide by chance on some band
  }

  test("hot-bucket cap bounds a poisoned bucket and the audit reports it") {
    // degenerate band: 50 payloads in ONE bucket (a corpus of identical
    // documents collides every copy in every band) + one healthy pair
    val rows = (1L to 50L).map(("hot", _)) ++ Seq(("ok", 1L), ("ok", 2L))
    val df = rows.toDF("band", "id")
    // uncapped: full quadratic expansion of the hot bucket
    val full = Dedup.bucketPairs(df, Seq($"band"), $"id").count()
    assert(full === 50L * 49 / 2 + 1)
    // capped at 8: hot bucket contributes C(8,2) pairs among its 8
    // SMALLEST ids (deterministic prefix), healthy bucket untouched
    val capped = Dedup.bucketPairsCapped(df, Seq($"band"), $"id", 8)
      .as[(Long, Long)].collect()
    assert(capped.length === 8 * 7 / 2 + 1)
    assert(capped.filter(_ != ((1L, 2L))).forall { case (a, b) => a < b && b <= 8 })
    // audit: exactly the hot bucket, with its true size
    val audit = Dedup.bucketOverflowAudit(df, Seq($"band"), $"id", 8)
      .as[(String, Long)].collect()
    assert(audit.toSeq === Seq(("hot", 50L)))
    // a cap nothing exceeds truncates nothing and audits nothing
    assert(Dedup.bucketPairsCapped(df, Seq($"band"), $"id", 50).count() === full)
    assert(Dedup.bucketOverflowAudit(df, Seq($"band"), $"id", 50).count() === 0)
  }

  test("simhash: equal token sets equal, disjoint sets differ") {
    val docs = Seq((1L, "x y z"), (2L, "z y x x"), (3L, "p q r")).toDF("doc_id", "text")
    val out = Dedup.simhash(docs, "doc_id", "text").orderBy("doc_id")
      .as[(Long, Long)].collect()
    assert(out(0)._2 === out(1)._2) // token-set semantics: order/multiplicity ignored
    assert(out(0)._2 !== out(2)._2)
    assert(out.forall(r => r._2 >= 0 && r._2 < (1 << 16)))
  }

  test("cosine: orthogonal ~0, identical 1, opposite -1") {
    val df = Seq(
      (Seq(1f, 0f), Seq(0f, 1f)),
      (Seq(1f, 2f), Seq(1f, 2f)),
      (Seq(1f, 0f), Seq(-1f, 0f))
    ).toDF("a", "b")
    val out = df.select(Similarity.cosine($"a", $"b").as("c")).as[Double].collect()
    assert(out === Array(0.0, 1.0, -1.0))
  }

  test("lshBucket: deterministic, in range, identical vectors same bucket") {
    val coefs = Similarity.planeCoefs(4, 4)
    // powers of 2: a ±1-weighted sum can never be exactly 0, so every
    // plane sign flips between v and -v
    val df = Seq(Seq(1f, 2f, 4f, 8f), Seq(1f, 2f, 4f, 8f), Seq(-1f, -2f, -4f, -8f))
      .toDF("embedding")
    val out = df.select(Similarity.lshBucket($"embedding", coefs).as("b"))
      .as[Long].collect()
    assert(out(0) === out(1))
    assert(out.forall(b => b >= 0 && b < 16))
    // v and -v flip every plane sign: buckets are bitwise complements
    assert((out(0) ^ out(2)) === 15L)
  }

  test("predictedLang: argmax with profile-order tiebreak") {
    val scored = Seq(("the the data", "x")).toDF("text", "lang")
      .select(TextAnalysis.langProfiles.map { case (l, ws) =>
        TextAnalysis.langScore(col("text"), ws).as(s"s_$l")
      }: _*)
    val pred = scored.select(TextAnalysis.predictedLang(
      TextAnalysis.langProfiles.map { case (l, _) => l -> col(s"s_$l") }).as("p"))
      .as[String].head()
    assert(pred === "en") // 2x the > 1x data
  }

  test("bpeish token count: alpha runs, digit runs, punct glyphs") {
    val out = Seq("abc12 de,f!").toDF("text")
      .select(TextAnalysis.bpeishTokenCount($"text").as("n")).as[Int].head()
    // abc | 12 | de | , | f | ! = 6
    assert(out === 6)
  }

  test("connectedComponents: chains, bridges, and separate clusters get min-id labels") {
    // components: {1,2,3,9} (chain 1-2, 2-3 bridged to 9 via 3-9),
    // {5,6}, {7,8}; pair direction must not matter
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 9L), (5L, 6L), (8L, 7L))
      .toDF("id_a", "id_b")
    val out = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().sorted
    assert(out === Array((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L),
      (6L, 5L), (7L, 7L), (8L, 7L), (9L, 1L)))
  }

  test("minhashFromText equals the distinct-shingle form (min is duplicate-invariant)") {
    val docs = Tables.load(spark, sf0001, "documents")
    val viaDistinct = Dedup.minhashSignature(
      Dedup.distinctShingles(docs, "doc_id", "text"), "doc_id", 12)
    val direct = Dedup.minhashFromText(docs, "doc_id", "text", 12)
    assert(direct.exceptAll(viaDistinct).isEmpty
      && viaDistinct.exceptAll(direct).isEmpty)
  }

  test("multimodal: partition-batched feature extraction is deterministic and complete") {
    val docs = Tables.load(spark, sf0001, "documents")
    val media = Multimodal.mediaFromDocuments(docs)
    val feats = Multimodal.extractFeatures(media)
    val rows = feats.collect()
    assert(rows.length === docs.count())
    assert(rows.forall(f => f.width >= 64 && f.height >= 64 && f.n_frames >= 1))
    assert(rows.forall(f => f.kind != "video" || f.n_frames >= 1))
    assert(rows.filter(_.kind == "image").forall(_.n_frames == 1))
    // determinism: second run identical
    val again = Multimodal.extractFeatures(media).collect()
    assert(rows.sortBy(_.media_id).toSeq === again.sortBy(_.media_id).toSeq)
    // md5 metadata matches Spark's own md5 of the same bytes
    val sparkMd5 = docs.select(col("doc_id"), md5(col("text").cast("binary")).as("m"))
      .as[(Long, String)].collect().toMap
    assert(rows.forall(f => sparkMd5(f.media_id) == f.content_md5))
  }

  test("container headers: build->parse round trip for png/apng/jpeg/wav") {
    import graft.ops.Multimodal._
    val payload = "hello media".getBytes("UTF-8")
    // PNG still: dims parsed from IHDR, 1 frame, exact overhead
    val png = buildPng(64, 1023, None, payload)
    assert(parseHeader(png) === MediaHeader("png", 64, 1023, 1))
    assert(png.length === 57 + payload.length)
    // APNG: acTL frame count parsed, +20 bytes for the chunk
    val apng = buildPng(4096, 64, Some(240), payload)
    assert(parseHeader(apng) === MediaHeader("apng", 4096, 64, 240))
    assert(apng.length === 77 + payload.length)
    // JPEG: height/width live in SOF0 (height FIRST in the wire order)
    val jpg = buildJpeg(800, 600, payload)
    assert(parseHeader(jpg) === MediaHeader("jpeg", 800, 600, 1))
    assert(jpg.length === 39 + payload.length)
    // WAV: mono 8-bit, so sample frames == payload bytes; 44B header
    val wav = buildWav(payload)
    assert(parseHeader(wav) === MediaHeader("wav", 0, 0, payload.length))
    assert(wav.length === 44 + payload.length)
    // empty payloads parse too (tombstone-ish documents)
    assert(parseHeader(buildWav(Array.empty)).nFrames === 0)
    assert(parseHeader(buildPng(64, 64, None, Array.empty)).width === 64)
  }

  test("container headers: JPEG payloads split across COM segments past 60000 bytes") {
    import graft.ops.Multimodal._
    val big = Array.fill[Byte](150001)('x'.toByte)
    val jpg = buildJpeg(12, 34, big)
    assert(parseHeader(jpg) === MediaHeader("jpeg", 12, 34, 1))
    // 3 segments (60000 + 60000 + 30001), 4 bytes framing each
    assert(jpg.length === 35 + 4 * 3 + big.length)
  }

  test("container headers: corrupt or unknown bytes fail loudly, not with zeros") {
    import graft.ops.Multimodal._
    val png = buildPng(100, 100, None, "abc".getBytes)
    png(20) = (png(20) ^ 0x01).toByte // flip a bit inside IHDR data
    val e = intercept[IllegalArgumentException](parseHeader(png))
    assert(e.getMessage.contains("CRC"))
    intercept[IllegalArgumentException](
      parseHeader("not a container at all".getBytes))
    // a JPEG missing its SOF is an error, not a (0, 0) image
    intercept[IllegalArgumentException](
      parseHeader(Array(0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xd9.toByte)))
  }

  test("container headers: too-short chunks fail loudly, never read past the field") {
    import graft.ops.Multimodal._
    import java.io.ByteArrayOutputStream
    def be32(v: Int) = Array[Byte](
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    // PNG: a CRC-VALID IHDR chunk with len=0 — the length guard passes,
    // so the 13-byte field requirement must catch it (w/h would
    // otherwise be read from the CRC and the next chunk)
    val png = new ByteArrayOutputStream
    png.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    png.write(be32(0))
    png.write("IHDR".getBytes)
    val crc = new java.util.zip.CRC32
    crc.update("IHDR".getBytes)
    png.write(be32(crc.getValue.toInt))
    val e1 = intercept[IllegalArgumentException](parseHeader(png.toByteArray))
    assert(e1.getMessage.contains("IHDR"), e1.getMessage)
    // WAV: a zero-length 'fmt ' chunk ending the file — blockAlign
    // sits at data offset 12, so the field requirement must fire
    def le32(v: Int) = Array[Byte](
      v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
    val wav = new ByteArrayOutputStream
    wav.write("RIFF".getBytes); wav.write(le32(12)); wav.write("WAVE".getBytes)
    wav.write("fmt ".getBytes); wav.write(le32(0))
    val e2 = intercept[IllegalArgumentException](parseHeader(wav.toByteArray))
    assert(e2.getMessage.contains("fmt"), e2.getMessage)
    // JPEG: a segment whose length field is < 2 cannot advance the
    // scan — must be a loud error, not an infinite loop
    val jpg = Array(0xff, 0xd8, 0xff, 0xe0, 0x00, 0x00).map(_.toByte)
    val e3 = intercept[IllegalArgumentException](parseHeader(jpg))
    assert(e3.getMessage.contains("length"), e3.getMessage)
  }

  test("multimodal: resize plan fits maxSide preserving aspect, never upscales") {
    val docs = Tables.load(spark, sf0001, "documents")
    val feats = Multimodal.extractFeatures(Multimodal.mediaFromDocuments(docs))
    val byId = feats.collect().map(f => f.media_id -> f).toMap
    val resized = Multimodal.resizePlan(feats, 256).collect()
    assert(resized.length === byId.size)
    resized.foreach { r =>
      val f = byId(r.media_id)
      assert(math.max(r.width, r.height) <= 256
        || (f.width <= 256 && f.height <= 256))
      assert(r.scale <= 1.0, "upscaled")
      if (f.width >= f.height)
        assert(r.width === math.max(1, math.round(f.width * r.scale).toInt))
    }
  }

  test("multimodal: frame sampling emits every k-th frame of videos only") {
    val docs = Tables.load(spark, sf0001, "documents")
    val feats = Multimodal.extractFeatures(Multimodal.mediaFromDocuments(docs))
    val frames = Multimodal.sampleFrames(feats, 24).collect()
    val videos = feats.filter(_.kind == "video").collect()
    assert(videos.nonEmpty)
    val expected = videos.map(v => (v.n_frames + 23) / 24).sum
    assert(frames.length === expected)
    assert(frames.forall(_.frame_idx % 24 == 0))
    val grouped = frames.groupBy(_.media_id)
    assert(grouped.keySet === videos.map(_.media_id).toSet)
    assert(grouped.values.forall(_.exists(_.frame_idx == 0)), "frame 0 missing")
  }
}

class AsOfSpec extends SparkSpec {
  import spark.implicits._
  import java.sql.Timestamp

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof join: most recent at-or-before, null when none") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "e1"),
      (1L, ts("2024-01-01 12:00:00"), "e2"),
      (2L, ts("2024-01-01 09:00:00"), "e3") // user 2 has no clicks
    ).toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), 100L),
      (1L, ts("2024-01-01 10:00:00"), 200L), // ties with e1: AT counts
      (1L, ts("2024-01-01 11:00:00"), 300L)
    ).toDF("user_id", "ts", "click_id")
    val out = graft.ops.AsOf.join(left, right, "user_id", "ts", Seq("click_id"))
      .select($"tag", $"right_click_id").as[(String, Option[Long])]
      .collect().sortBy(_._1)
    assert(out === Array(
      ("e1", Some(200L)), // equal-ts click wins over the earlier one
      ("e2", Some(300L)),
      ("e3", None)))
  }

  test("forward asof join: earliest at-or-after, null when none") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "e1"),
      (1L, ts("2024-01-01 11:30:00"), "e2"), // after the last click
      (2L, ts("2024-01-01 09:00:00"), "e3") // user 2 has no clicks
    ).toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), 100L), // before e1: must not match
      (1L, ts("2024-01-01 10:00:00"), 200L), // ties with e1: AT counts
      (1L, ts("2024-01-01 11:00:00"), 300L)
    ).toDF("user_id", "ts", "click_id")
    val out = graft.ops.AsOf.joinForward(left, right, "user_id", "ts", Seq("click_id"))
      .select($"tag", $"right_click_id").as[(String, Option[Long])]
      .collect().sortBy(_._1)
    assert(out === Array(
      ("e1", Some(200L)), // equal-ts click, not the later one
      ("e2", None), // nothing at or after
      ("e3", None)))
  }
}

/** The duplicate-(key, ts) tie contract documented on [[graft.ops.AsOf]]:
  * backward keeps the GREATEST value struct among tied right rows,
  * forward the SMALLEST — plus the fixture precondition the DuckDB
  * oracle relies on (no tie guarantee exists in SQL ASOF joins, so
  * oracled inputs must be tie-free).
  */
class AsOfTieSpec extends SparkSpec {
  import spark.implicits._
  import java.sql.Timestamp
  import org.apache.spark.sql.functions._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("duplicate right (key, ts): backward picks greatest value struct, forward smallest") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "e1")).toDF("user_id", "ts", "tag")
    val right = Seq( // three tied rows before the left ts, three after
      (1L, ts("2024-01-01 09:00:00"), 100L),
      (1L, ts("2024-01-01 09:00:00"), 300L),
      (1L, ts("2024-01-01 09:00:00"), 200L),
      (1L, ts("2024-01-01 11:00:00"), 600L),
      (1L, ts("2024-01-01 11:00:00"), 400L),
      (1L, ts("2024-01-01 11:00:00"), 500L)
    ).toDF("user_id", "ts", "click_id")
    val back = graft.ops.AsOf.join(left, right, "user_id", "ts", Seq("click_id"))
      .select($"right_click_id").as[Long].head()
    assert(back === 300L, "backward tie must resolve to the greatest struct")
    val fwd = graft.ops.AsOf.joinForward(left, right, "user_id", "ts", Seq("click_id"))
      .select($"right_click_id").as[Long].head()
    assert(fwd === 400L, "forward tie must resolve to the smallest struct")
  }

  test("temporal_dim_join covers every event exactly once (intervals tile the timeline)") {
    // purchase intervals are half-open and tile [first_purchase, inf)
    // per user, so the point-in-time LEFT join must keep EVERY event
    // with AT MOST one match — a double-matched event inflates the
    // sum above |events|, a dropped one deflates it
    val rows = SparkEntry.allQueries.find(_.name == "temporal_dim_join").get
      .run(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val matched = rows.map(_._3).sum
    val events = Tables.load(spark, sf001, "events").count()
    assert(matched === events,
      s"temporal join accounted for $matched of $events events")
    // pre-first-purchase events exist (band -1) AND real bands exist
    assert(rows.exists(_._1 == -1L), "no pre-purchase events — fixture drift?")
    assert(rows.count(_._1 >= 0L) > 0, "no matched purchase bands")
    // every purchase event matches a REAL band: its own interval opens
    // at its timestamp, so 'purchase' rows can't appear under band -1
    // unless the user had an EARLIER unmatched purchase — impossible
    assert(!rows.exists(r => r._1 == -1L && r._2 == "purchase"),
      "a purchase event failed to match its own validity interval")
  }

  test("oracled asof fixture keeps (user_id, ts) unique on the right side") {
    // the asof_join / asof_join_forward oracles (DuckDB ASOF JOIN) make
    // no tie promise, so the click side of the events fixture must be
    // tie-free at the gate's scale factor for the hash compare to be
    // meaningful
    for (dir <- Seq(sf0001, sf001)) {
      val dups = Tables.load(spark, dir, "events")
        .filter(col("event_type") === "click")
        .groupBy("user_id", "ts").count()
        .filter(col("count") > 1).count()
      assert(dups === 0, s"$dir: $dups duplicate (user_id, ts) click rows")
    }
  }
}

class TopKAggTypesSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.functions.TopKAgg

  test("non-coercible sort column is an ANALYSIS-time error, not a task crash") {
    // boolean has no implicit cast to double, so the declared input
    // types reject it during analysis (strings, like for built-in
    // aggregates, coerce and surface data errors at runtime instead)
    val df = Seq(("a", true, 1L)).toDF("g", "v", "t")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.groupBy("g").agg(TopKAgg(col("v"), col("t"), col("t"), 2)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("top_k"))
  }

  test("int/decimal inputs coerce instead of ClassCastException") {
    // round 2 crashed mid-task on uncast int columns; declared input
    // types now insert the casts at analysis time
    val df = Seq(("a", 5, 1), ("a", 9, 2)).toDF("g", "v", "t") // ints, not double/long
    val got = df.groupBy("g")
      .agg(TopKAgg(col("v"), col("t"), col("t"), 1).as("tk"))
      .select(explode(col("tk")))
      .select("col.value", "col.tie1").as[(Double, Long)].collect()
    assert(got === Array((9.0, 2L)))
  }
}

/** dedup_embedding's blocking invariant: blocks come from the fixed
  * IVF centroid set, so no block can degenerate to a large fraction of
  * the corpus the way a skewed DATA column (round 2 blocked on `label`)
  * can. Balance bound checked on both fixture scales.
  */
class EmbeddingBlockSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("IVF blocks are bounded: no block above 25% of the corpus") {
    for (dir <- Seq(sf0001, sf001)) {
      val sizes = graft.queries.DedupQueries
        .embeddingBlocks(Tables.load(spark, dir, "embeddings"))
        .groupBy("cl").count()
        .agg(max(col("count")).as("mx"), sum(col("count")).as("n"),
          count(lit(1)).as("blocks"))
        .head()
      val (mx, n, blocks) = (sizes.getLong(0), sizes.getLong(1), sizes.getLong(2))
      assert(blocks === graft.queries.DedupQueries.DedupCentroids.toLong,
        s"$dir: empty centroid blocks ($blocks occupied)")
      assert(mx <= n / 4, s"$dir: largest block $mx of $n exceeds 25%")
    }
  }

  test("audio frame energy: frames tile the payload and match a JVM recomputation") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("audio_frame_energy")(spark, sf0001).cache()
    try {
      // frames partition every audio payload byte-exactly
      val perMedia = out.groupBy("media_id").agg(sum("n_samples").as("n"))
      val expect = Tables.load(spark, sf0001, "documents")
        .filter(col("doc_id") % 3 === 1)
        .select(col("doc_id").as("media_id"), length(col("text")).as("n"))
      assert(perMedia.except(expect).count() === 0L &&
        expect.except(perMedia).count() === 0L,
        "frame sample counts do not tile the payloads")
      // spot-check one media's first frame against plain JVM math over
      // the same bytes (independent of any SQL engine)
      val doc = Tables.load(spark, sf0001, "documents")
        .filter(col("doc_id") % 3 === 1).orderBy("doc_id")
        .select("doc_id", "text").first()
      val bytes = doc.getString(1).getBytes("UTF-8").take(200)
      val e = bytes.map(b => { val v = (b & 0xff) - 128; v.toLong * v }).sum
      val got = out.filter(col("media_id") === doc.getLong(0) &&
        col("frame") === 0).first()
      assert(got.getAs[Long]("energy_sq") === e)
      assert(got.getAs[Long]("n_samples") === bytes.length.toLong)
    } finally out.unpersist()
  }
}
