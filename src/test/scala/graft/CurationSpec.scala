package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the curation-pass queries added in round 7:
  * Gopher rule filter, PII redaction, packing-efficiency audit, and
  * the trigram stupid-backoff scorer. Value-level corpus checks live
  * in the DuckDB oracle gate; these pin the properties the oracle's
  * hash compare can't express (discriminativeness, negative cases,
  * cross-query consistency, backoff actually firing).
  */
class CurationSpec extends SparkSpec {

  private def run(name: String, dir: String = sf0001) =
    SparkEntry.queries(name)(spark, dir)

  test("gopher_rules: every rule is discriminative and keep is the conjunction") {
    val rows = run("gopher_rules", sf001)
      .select("r_len", "r_word_len", "r_stop", "r_rep", "keep").collect()
    // each rule must reject at least one doc and accept at least one —
    // a rule that never fires (or always fires) is a dead threshold
    Seq(0, 1, 2, 3).foreach { i =>
      assert(rows.exists(r => !r.getBoolean(i)), s"rule #$i never rejects")
      assert(rows.exists(r => r.getBoolean(i)), s"rule #$i never accepts")
    }
    assert(rows.forall(r =>
      r.getBoolean(4) === (r.getBoolean(0) && r.getBoolean(1) &&
        r.getBoolean(2) && r.getBoolean(3))))
    // the filter keeps a meaningful middle: neither empty nor everything
    val kept = rows.count(_.getBoolean(4))
    assert(kept > 0 && kept < rows.length)
  }

  test("pii_redact: injected docs detect exactly one of each class, clean docs none") {
    val rows = run("pii_redact").collect()
    rows.foreach { r =>
      val (id, em, ph, ip, has) = (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getInt(3), r.getBoolean(4))
      if (id % 3 == 0) {
        assert(em == 0 && ph == 0 && ip == 0 && !has, s"clean doc $id flagged")
      } else {
        assert(em == 1 && ph == 1 && ip == 1 && has, s"doc $id: $em/$ph/$ip")
      }
    }
    assert(rows.exists(_.getLong(0) % 3 == 0) && rows.exists(_.getLong(0) % 3 != 0))
  }

  test("pii_redact: redaction masks every match and nothing else") {
    // re-derive the redacted TEXT (the query ships only its md5) on a
    // hand fixture through the same expression chain the query uses
    import spark.implicits._
    val email = "[a-z0-9._]+@[a-z.]+"
    val phone = "555-[0-9]{4}"
    val ip = "10\\.[0-9]{1,3}\\.0\\.[0-9]{1,3}"
    val out = Seq(
      "mail me at bob.smith@corp.example now",
      "call 555-0199 or 555-1234",
      "host 10.7.0.201 is fine, 11.7.0.201 is not pii",
      "no pii here").toDF("t")
      .select(regexp_replace(regexp_replace(regexp_replace(col("t"),
        email, "<EMAIL>"), phone, "<PHONE>"), ip, "<IP>").as("red"))
      .as[String].collect()
    assert(out(0) === "mail me at <EMAIL> now")
    assert(out(1) === "call <PHONE> or <PHONE>")
    assert(out(2) === "host <IP> is fine, 11.7.0.201 is not pii")
    assert(out(3) === "no pii here")
  }

  test("pack_efficiency agrees with pack_sequences: same bins, same doc census") {
    val eff = run("pack_efficiency", sf001)
    val packs = run("pack_sequences", sf001)
    val effTot = eff.agg(sum("n_seqs"), sum("n_docs")).head()
    val packTot = packs.agg(
      countDistinct(col("shard"), col("seq_id")), count(lit(1))).head()
    assert(effTot.getLong(0) === packTot.getLong(0), "bin counts disagree")
    assert(effTot.getLong(1) === packTot.getLong(1), "doc counts disagree")
    // fill sanity: averages live in (0, max/budget]; overflow only
    // counts bins a straddling doc pushed past the budget
    eff.collect().foreach { r =>
      val avg = r.getDouble(5)
      assert(avg > 0.0 && avg <= r.getLong(4).toDouble / 2048.0 + 1e-9)
    }
  }

  test("trigram_backoff: train docs never back off, some held-out docs do") {
    val rows = run("trigram_backoff", sf001)
      .select("doc_id", "n_trigrams", "n_backoff", "logprob").collect()
    rows.foreach { r =>
      val (id, n, bo, lp) = (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))
      assert(n > 0 && bo >= 0 && bo <= n)
      // every trigram of an even (train) doc is in the train counts by
      // construction — the trigram path must always hit
      if (id % 2 == 0) assert(bo == 0, s"train doc $id backed off")
      assert(lp < 0.0, s"doc $id: log-prob must be negative, got $lp")
    }
    // the held-out half must actually exercise the backoff path,
    // otherwise the CASE's lower orders are dead code
    assert(rows.exists(r => r.getLong(0) % 2 == 1 && r.getLong(2) > 0),
      "no held-out doc ever backed off — backoff path untested")
  }

  test("trigram slices clamp to zero length on sub-3-token docs (no negative slice)") {
    import spark.implicits._
    // the exact slice shape trigram_backoff uses: a bare n-2 length
    // would throw 'length must be >= 0' on 1- and 2-token documents
    val a = split(col("text"), " ")
    val n = size(a)
    val tlen = greatest(n - 2, lit(0))
    val out = Seq("one", "two words", "three word doc")
      .toDF("text")
      .select(arrays_zip(slice(a, lit(1), tlen), slice(a, lit(2), tlen),
        slice(a, lit(3), tlen)).as("z"))
      .select(size(col("z"))).as[Int].collect()
    assert(out.toSeq === Seq(0, 0, 1))
  }

  test("NormalizeText: NFC composes, identity on already-normal, no-copy fast path") {
    import graft.functions.NormalizeText
    import org.apache.spark.unsafe.types.UTF8String
    import spark.implicits._
    val out = Seq("cafe\u0301", "caf\u00e9", "plain ascii", "nai\u0308ve")
      .toDF("t").select(NormalizeText.nfc(col("t")).as("n"))
      .as[String].collect()
    assert(out(0) === "caf\u00e9")          // decomposed -> composed
    assert(out(1) === "caf\u00e9")          // already composed: unchanged
    assert(out(2) === "plain ascii")
    assert(out(3) === "na\u00efve")
    // the fast path returns the INPUT OBJECT for already-normal text
    val s = UTF8String.fromString("already normal")
    assert(NormalizeText.normalize(s, java.text.Normalizer.Form.NFC) eq s)
    // null propagates (nullIntolerant)
    val nulls = Seq[Option[String]](None).toDF("t")
      .select(NormalizeText.nfc(col("t"))).collect()
    assert(nulls(0).isNullAt(0))
    // equal inputs after normalization dedup to one hash key
    val dedup = Seq("cafe\u0301", "caf\u00e9").toDF("t")
      .select(md5(NormalizeText.nfc(col("t"))).as("h"))
      .distinct().count()
    assert(dedup === 1)
  }

  test("unicode_normalize query: decomposed docs change, precomposed are identity") {
    val rows = run("unicode_normalize").collect()
    rows.foreach { r =>
      val (id, raw, nfc, changed) =
        (r.getLong(0), r.getInt(1), r.getInt(2), r.getBoolean(3))
      if (id % 2 == 0) {
        // two combining marks collapse: exactly 2 codepoints shorter
        assert(changed && raw - nfc == 2, s"doc $id: $raw -> $nfc")
      } else assert(!changed && raw == nfc, s"doc $id changed unexpectedly")
    }
  }

  test("token_entropy: bounds hold and repetition lowers entropy") {
    import spark.implicits._
    val rows = run("token_entropy", sf001).collect()
    rows.foreach { r =>
      val (n, k) = (r.getLong(1), r.getLong(2))
      val (h, nh) = (r.getDouble(3), r.getDouble(4))
      assert(h >= 0.0 && h <= math.log(k.toDouble) + 1e-6,
        s"entropy $h outside [0, ln($k)]")
      assert(nh >= 0.0 && nh <= 1.0 + 1e-9)
      assert(n >= k)
    }
    // a uniform doc maxes normalized entropy; a skewed doc scores lower
    // (pin on a hand fixture via the same formula path end to end)
    val docs = Seq((2L, "a b c d e f g h"), (4L, "a a a a a a b c"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("curation_entropy_fixture")
    // recompute with the op-level shape: counts -> H = ln n - sum(c ln c)/n
    val uc = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("doc_id", "tok").count()
      .groupBy("doc_id")
      .agg(sum("count").as("n"),
        sum(col("count") * log(col("count").cast("double"))).as("clnc"))
      .select(col("doc_id"),
        (log(col("n").cast("double")) - col("clnc") / col("n")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(uc(2L) - math.log(8.0)) < 1e-9) // uniform: H = ln 8
    assert(uc(4L) < uc(2L))                          // skew lowers H
  }

  test("CDC chunks re-synchronize after a prefix insertion") {
    import graft.ops.TextAnalysis
    import spark.implicits._
    // find real boundary tokens (h32 % 8 == 0) from a candidate pool so
    // the fixture tracks the actual hash, not an assumed one
    val pool = (1 to 200).map(i => s"tok$i")
    val flags = pool.toDF("tok")
      .select(col("tok"),
        (graft.functions.PortableHash.h32(col("tok")) % 8 === 0).as("b"))
      .as[(String, Boolean)].collect()
    val bdry = flags.filter(_._2).map(_._1)
    val plain = flags.filterNot(_._2).map(_._1)
    assert(bdry.length >= 2 && plain.length >= 8, "fixture pool too small")
    val body = Seq(plain(0), plain(1), bdry(0), plain(2), plain(3), bdry(1),
      plain(4), plain(5))
    val shifted = Seq(plain(6), plain(7)) ++ body // two tokens inserted at front
    val docs = Seq((1L, body.mkString(" ")), (2L, shifted.mkString(" ")))
      .toDF("doc_id", "text")
    val chunks = TextAnalysis.cdcChunks(docs)
      .select("doc_id", "chunk_idx", "chunk_md5")
      .as[(Long, Long, String)].collect()
    val d1 = chunks.filter(_._1 == 1L).sortBy(_._2).map(_._3)
    val d2 = chunks.filter(_._1 == 2L).sortBy(_._2).map(_._3)
    // doc 1 chunks: [p0 p1 B0] [p2 p3 B1] [p4 p5]; doc 2's first chunk
    // absorbs the insertion, every later chunk hash re-syncs exactly
    assert(d1.length === 3 && d2.length === 3)
    assert(d1(0) !== d2(0), "insertion must change the first chunk")
    assert(d1(1) === d2(1) && d1(2) === d2(2),
      "chunks after the first boundary must re-synchronize")
    // cross-check: positional chunking (fixed width 3) would NOT re-sync
    val fixedWidth1 = body.grouped(3).map(_.mkString(" ")).toSeq
    val fixedWidth2 = shifted.grouped(3).map(_.mkString(" ")).toSeq
    assert(fixedWidth1.tail !== fixedWidth2.tail.take(fixedWidth1.length - 1))
  }

  test("containment finds a short doc inside a much longer one (no length blocking)") {
    import graft.ops.Dedup
    import spark.implicits._
    // doc 1 (8 tokens) is verbatim inside doc 2 (48 tokens): lengths
    // land ~5 of the old 50-char buckets apart, so any equal-length
    // blocking would have missed the pair this op exists to find
    val short = "alpha beta gamma delta epsilon zeta eta theta"
    val long = ("prefix one two three four five six seven eight nine ten " +
      short +
      " suffix eleven twelve thirteen fourteen fifteen sixteen " +
      "seventeen eighteen nineteen twenty twentyone twentytwo " +
      "twentythree twentyfour twentyfive twentysix twentyseven")
    val docs = Seq(
      (1L, "en", short), (2L, "en", long),
      (3L, "de", short),        // same text, different lang: blocked out
      (4L, "en", "unrelated words entirely distinct tokens here now ok"))
      .toDF("doc_id", "lang", "text")
    val rows = Dedup.containmentPairs(docs, maxDf = 50)
      .as[(Long, Long, Double, Double)].collect()
    val pair = rows.find(r => r._1 == 1L && r._2 == 2L)
    assert(pair.isDefined, s"short-in-long pair missed; got ${rows.toSeq}")
    assert(pair.get._3 === 1.0, "every shingle of the short doc is in the long doc")
    assert(pair.get._4 < 0.6, "the long doc is NOT contained in the short one")
    assert(!rows.exists(r => Set(r._1, r._2) == Set(1L, 3L)),
      "cross-lang pair must be blocked")
    assert(!rows.exists(r => Set(r._1, r._2) == Set(1L, 4L)))
    // a df cap of 1 kills every shared shingle (each appears in 2 docs)
    assert(Dedup.containmentPairs(docs, maxDf = 1).count() === 0)
  }

  test("span_corruption: independent rebuild matches and masking is reconstructable") {
    import spark.implicits._
    val docs = Tables.load(spark, sf0001, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
    // portable h32 per (doc, block) pulled through the SAME expression
    // the query uses (the hash is the only non-trivial shared piece)
    val keys = docs.flatMap { case (id, t) =>
      (0 until (t.split(" ").length + 19) / 20).map(b => (id, b))
    }
    val hs = keys.toSeq.toDF("doc_id", "b")
      .select(col("doc_id"), col("b"),
        graft.functions.PortableHash.h32(
          concat(col("doc_id").cast("string"), lit("#"),
            col("b").cast("long").cast("string"))).as("h"))
      .as[(Long, Int, Long)].collect()
      .map { case (id, b, h) => (id, b) -> (h % 18).toInt }.toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val expected = docs.map { case (id, t) =>
      val toks = t.split(" ")
      val rel = toks.indices.map(i0 => (i0 % 20) - hs((id, i0 / 20)))
      val input = toks.indices.flatMap { i =>
        if (rel(i) == 0) Some(s"<extra_${i / 20}>")
        else if (rel(i) > 0 && rel(i) <= 2) None
        else Some(toks(i))
      }.mkString(" ")
      val target = toks.indices.flatMap { i =>
        if (rel(i) == 0) Some(s"<extra_${i / 20}> ${toks(i)}")
        else if (rel(i) > 0 && rel(i) <= 2) Some(toks(i))
        else None
      }.mkString(" ")
      // RECONSTRUCTION: splicing each sentinel's target span back into
      // the input recovers the original document exactly
      val spans = toks.indices.collect { case i if rel(i) == 0 =>
        s"<extra_${i / 20}>" ->
          toks.slice(i, (i + 3).min(((i / 20) + 1) * 20).min(toks.length))
            .mkString(" ")
      }.toMap
      val rebuilt = input.split(" ").flatMap { w =>
        if (w.startsWith("<extra_")) spans(w).split(" ") else Array(w)
      }.mkString(" ")
      assert(rebuilt === t, s"doc $id does not reconstruct")
      (id, md5hex(input), md5hex(target))
    }.sortBy(_._1)
    val got = run("span_corruption")
      .select("doc_id", "input_md5", "target_md5")
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(got.toSeq === expected.toSeq, "corruption differs from the rebuild")
    // density sanity: ~15% masked corpus-wide
    val stats = run("span_corruption").agg(sum("n_masked"), sum("n_tokens")).head()
    val frac = stats.getLong(0).toDouble / stats.getLong(1)
    assert(frac > 0.08 && frac < 0.22, s"mask density $frac out of range")
  }

  test("bm25_score matches an independent reimplementation at sf0.001") {
    import graft.queries.TextQueries
    import spark.implicits._
    val docs = Tables.load(spark, sf0001, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => id -> t.split(" ").toSeq }
    val q = TextQueries.Bm25Query
    val n = docs.length.toDouble
    val avgdl = docs.map(_._2.length).sum.toDouble / n
    val df = q.map(t => t -> docs.count(_._2.contains(t)).toDouble).toMap
    val expected = docs.map { case (id, toks) =>
      val dl = toks.length
      val score = q.map { t =>
        val tf = toks.count(_ == t).toDouble
        val idf = math.log((n - df(t) + 0.5) / (df(t) + 0.5) + 1.0)
        idf * (tf * (TextQueries.Bm25K1 + 1.0)) /
          (tf + TextQueries.Bm25K1 *
            ((1.0 - TextQueries.Bm25B) + TextQueries.Bm25B * dl / avgdl))
      }.sum
      id -> BigDecimal(score).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    val got = run("bm25_score").select("doc_id", "bm25")
      .as[(Long, Double)].collect()
    assert(got.length === docs.length)
    got.foreach { case (id, s) =>
      assert(s === expected(id), s"doc $id: $s vs ${expected(id)}")
    }
    // ranking sanity: some doc with a query term outranks the zero floor
    assert(got.exists(_._2 > 0.0))
  }

  test("CDC chunks partition every document: reassembly and boundary structure") {
    import graft.ops.TextAnalysis
    import spark.implicits._
    // 200 random docs over a 60-word vocabulary (seeded — the corpus
    // is reproducible), one Spark pass for the whole property
    val rnd = new scala.util.Random(42)
    val vocab = (1 to 60).map(i => s"w$i")
    val docs = (1L to 200L).map { id =>
      val n = 1 + rnd.nextInt(60)
      id -> Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val df = docs.toDF("doc_id", "text")
    val boundary = vocab.toDF("tok")
      .select(col("tok"),
        (graft.functions.PortableHash.h32(col("tok")) % 8 === 0).as("b"))
      .as[(String, Boolean)].collect().toMap
    // need chunk TEXT, not just md5 — re-derive strings per (doc, idx)
    // through the same grouping the op uses, then md5-match the op
    val chunks = TextAnalysis.cdcChunks(df)
      .select("doc_id", "chunk_idx", "n_tokens", "chunk_md5")
      .as[(Long, Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    def md5hex(s: String) =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    docs.foreach { case (id, text) =>
      val toks = text.split(" ")
      // independent chunker: split AFTER each boundary token
      val expected = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer.empty[String])
      toks.foreach { t =>
        expected.last += t
        if (boundary(t)) expected += scala.collection.mutable.ArrayBuffer.empty[String]
      }
      if (expected.last.isEmpty && expected.length > 1) expected.remove(expected.length - 1)
      val got = chunks(id)
      // partition: chunk token counts sum to the doc, indexes are 0..k-1
      assert(got.map(_._3).sum === toks.length.toLong, s"doc $id token sum")
      assert(got.map(_._2).toSeq === got.indices.map(_.toLong), s"doc $id indexes")
      // content: md5 of each independent chunk matches the op's
      assert(got.length === expected.length, s"doc $id chunk count")
      got.zip(expected).foreach { case ((_, _, n, h), exp) =>
        assert(n === exp.length.toLong && h === md5hex(exp.mkString(" ")),
          s"doc $id chunk content")
      }
      // structure: every chunk but the last ends AT a boundary token,
      // and no boundary token sits mid-chunk
      expected.dropRight(1).foreach { c =>
        assert(boundary(c.last), s"doc $id non-terminal chunk without boundary end")
        assert(c.dropRight(1).forall(!boundary(_)), s"doc $id boundary mid-chunk")
      }
    }
  }

  test("mmr_rerank matches an independent greedy reimplementation and diversifies") {
    import spark.implicits._
    // independent driver-side greedy MMR from the raw embeddings,
    // replicating the query's exact arithmetic (sequential double dot,
    // HALF_UP 6-dp round, 1e-6 integer units, 7*rel - 3*maxsim)
    val emb = Tables.load(spark, sf0001, "embeddings")
      .select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect().toMap.view.mapValues(_.toArray).toMap
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def u(x: Double): Long = {
      val r = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      math.floor(r * 1e6 + 0.5).toLong
    }
    def cosU(a: Long, b: Long): Long =
      u(dot(emb(a), emb(b)) / (math.sqrt(dot(emb(a), emb(a))) * math.sqrt(dot(emb(b), emb(b)))))
    val qs = emb.keys.filter(_ < 5).toSeq.sorted
    val cs = emb.keys.filter(_ >= 5).toSeq.sorted
    val expected = qs.flatMap { q =>
      val rel = cs.map(c => c -> cosU(q, c)).toMap
      val cand = cs.sortBy(c => (-rel(c), c)).take(8)
      var sel = List(cand.minBy(c => (-rel(c), c)))
      (1 to 2).foreach { _ =>
        val rem = cand.filterNot(sel.contains)
        sel = sel :+ rem.minBy(c => (-(7 * rel(c) - 3 * sel.map(s => cosU(c, s)).max), c))
      }
      sel.zipWithIndex.map { case (c, i) => (q, i + 1, c) }
    }.toSet
    val got = run("mmr_rerank").select("q_id", "mmr_rank", "vec_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(got === expected, "query disagrees with the reference greedy")
    // the point of MMR: the selection must DIVERGE from pure relevance
    // for at least one query (it does for all five on this fixture)
    val pureRel = qs.flatMap { q =>
      val rel = cs.map(c => c -> cosU(q, c)).toMap
      cs.sortBy(c => (-rel(c), c)).take(3).zipWithIndex
        .map { case (c, i) => (q, i + 1, c) }
    }.toSet
    assert(got !== pureRel, "MMR never diverged from relevance ranking")
  }
}
