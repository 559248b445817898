package graft

import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Structural guarantees of the round-4 pipeline operators — the
  * properties the oracle's value-compare can't articulate:
  * simhash banding's pigeonhole COMPLETENESS, chunking's lossless
  * reassembly, and packing's budget invariant.
  */
class PipelineShapesSpec extends SparkSpec {
  import spark.implicits._

  private def byName(n: String) =
    SparkEntry.allQueries.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"query $n not registered"))

  test("simhash byte-band candidates are COMPLETE for hamming <= 3 (pigeonhole)") {
    // brute force the ground truth over the fingerprints themselves
    val sh = Dedup.simhashOf(
      Dedup.distinctShingles(
        Tables.load(spark, sf0001, "documents").select("doc_id", "text"),
        "doc_id", "text"),
      "doc_id", "shingle", 32)
      .as[(Long, Long)].collect()
    val truth = (for {
      (d1, h1) <- sh; (d2, h2) <- sh
      if d1 < d2 && java.lang.Long.bitCount(h1 ^ h2) <= 3
    } yield (d1, d2)).toSet
    val got = byName("dedup_simhash_pairs").run(spark, sf0001)
      .select("doc_id_1", "doc_id_2").as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty, "fixture should contain hamming<=3 pairs")
    assert(got === truth,
      s"banding lost ${truth -- got} / invented ${got -- truth}")
  }

  test("chunking reassembles losslessly and chunk sizes telescope") {
    val docs = Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), col("text"),
        size(split(col("text"), " ")).as("n")).as[(Long, String, Int)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    val chunks = byName("chunk_documents").run(spark, sf0001)
      .select("doc_id", "chunk_idx", "chunk_tokens", "chunk_text")
      .as[(Long, Int, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    assert(chunks.keySet === docs.keySet)
    chunks.foreach { case (id, cs) =>
      assert(cs.map(_._2).toSeq === cs.indices.toSeq, s"doc $id chunk idx gap")
      // every chunk but the last is exactly the 64-token budget
      assert(cs.init.forall(_._3 == 64L), s"doc $id has a short mid chunk")
      assert(cs.map(_._3).sum === docs(id)._2.toLong, s"doc $id token count")
      assert(cs.map(_._4).mkString(" ") === docs(id)._1, s"doc $id reassembly")
    }
  }

  test("overlapping chunks cover every token; adjacent windows overlap by W-S") {
    val (w, s) = (64, 32)
    val docs = Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .as[(Long, Int)].collect().toMap
    val chunks = byName("chunk_overlap").run(spark, sf0001)
      .select("doc_id", "chunk_idx", "start_tok", "chunk_tokens")
      .as[(Long, Int, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    assert(chunks.keySet === docs.keySet)
    chunks.foreach { case (id, cs) =>
      val n = docs(id).toLong
      // strides are exact, coverage reaches the last token, and every
      // boundary-crossing span of <= W-S tokens is inside some chunk
      cs.foreach { case (_, idx, start, len) =>
        assert(start === idx.toLong * s)
        assert(len === math.min(w.toLong, n - start))
      }
      val (_, _, lastStart, lastLen) = cs.last
      assert(lastStart + lastLen === n, s"doc $id tail uncovered")
      assert(cs.init.forall(_._4 == w.toLong), s"doc $id short mid window")
    }
  }

  test("packing never starts a doc past the sequence budget; seq ids dense per shard") {
    val rows = byName("pack_sequences").run(spark, sf0001)
      .select("doc_id", "shard", "n_tokens", "seq_id")
      .as[(Long, Long, Long, Long)].collect()
    rows.groupBy(_._2).foreach { case (shard, rs) =>
      val seqs = rs.map(_._4).distinct.sorted
      assert(seqs.head === 0L && seqs === (0L until seqs.length).toArray.toSeq,
        s"shard $shard seq ids not dense: ${seqs.take(5).mkString(",")}")
      // invariant of tokens-before packing: every doc STARTS inside its
      // sequence's budget window
      rs.sortBy(_._1).foldLeft(0L) { case (cum, (_, _, n, seq)) =>
        assert(cum - seq * 2048 < 2048, s"shard $shard doc starts past budget")
        assert(cum / 2048 === seq, s"shard $shard seq assignment mismatch")
        cum + n
      }
    }
  }

  test("bigram pairs derive map-side: n_bigrams = tokens - 1, no window in plan") {
    val q = byName("bigram_logprob").run(spark, sf0001)
    // every doc's bigram count must equal its token count minus one
    // (pairs come from the row's own array, nothing dropped or joined in)
    val got = q.select("doc_id", "n_bigrams").as[(Long, Long)].collect().toMap
    val want = Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), (size(split(col("text"), " ")) - 1).cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(got === want.filter(_._2 >= 1))
    // the pair derivation must not smuggle in a per-position window or
    // self-join — one generator, aggregates only
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"bigram derivation used a window:\n$plan")
  }

  test("source_cap selection is deterministic under repartitioning and binds") {
    val out = byName("source_cap").run(spark, sf001)
      .select("source", "doc_id").as[(String, Long)].collect().sorted
    // every source capped exactly (fixture has 25 docs/source > cap 10)
    val perSource = out.groupBy(_._1).view.mapValues(_.length)
    assert(perSource.values.forall(_ === graft.queries.TextQueries.CapPerSource))
    // the hash rank is a property of the ROW, not of partitioning:
    // recompute over a shuffled layout, selection must be identical
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val reshuffled = Tables.load(spark, sf001, "documents")
      .repartition(13, col("doc_id"))
      .select("source", "doc_id")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= graft.queries.TextQueries.CapPerSource)
      .select("source", "doc_id").as[(String, Long)].collect().sorted
    assert(reshuffled === out, "cap selection changed under repartitioning")
  }

  test("winnowing guarantee: every full window contributes a fingerprint") {
    val w = graft.queries.TextQueries.WinnowW
    val selected = byName("winnow_fingerprints").run(spark, sf0001)
      .select("doc_id", "pos").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nGrams = Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), (size(split(col("text"), " ")) - 2).cast("long"))
      .as[(Long, Long)].collect()
    assert(nGrams.nonEmpty)
    for ((doc, n) <- nGrams if n >= w) {
      val sel = selected.getOrElse(doc, Set.empty)
      for (t <- 1L to (n - w + 1))
        assert((t until t + w).exists(sel), s"doc $doc window at $t uncovered")
      // density stays in the winnowing band: never more than one
      // fingerprint per window-step on average, never less than the
      // guarantee's floor
      assert(sel.size <= n - w + 1 || n < 2 * w,
        s"doc $doc over-selected (${sel.size} of ${n - w + 1} windows)")
    }
  }

  test("dup_spans spans are real: aligned grams match in the raw texts") {
    val q = byName("dup_spans").run(spark, sf0001)
    // collect from q ITSELF (not a derived select) so the reuse
    // assertion below reads the query execution that actually ran
    val spans = q.collect().map(r => (
      r.getAs[Long]("d1"), r.getAs[Long]("d2"), r.getAs[Long]("off"),
      r.getAs[Long]("n_shared"), r.getAs[Long]("start1"),
      r.getAs[Long]("span_tokens")))
    // the fingerprint pipeline must be computed ONCE and shared: the
    // frequency branch and both self-join sides reuse the distinct()'s
    // exchange rather than re-running the shingle+window chain (the
    // reason the query skips a localCheckpoint — see the query
    // comment). Static planning duplicates the subtree; AQE dedupes it
    // at runtime, so assert on the FINAL adaptive plan post-execution.
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage"),
      s"fingerprint pipeline not shared across branches:\n$plan")
    assert(spans.nonEmpty, "fixture lost its shared passages")
    val toks = Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .as[(Long, Seq[String])].collect().toMap
    // every reported span must be backed by at least n_shared ALIGNED
    // equal 3-grams inside its extent (fingerprint hash matches stand
    // for gram matches; a 32-bit collision would fail here)
    for ((d1, d2, off, nShared, start1, spanTokens) <- spans) {
      def gram(ts: Seq[String], p: Long): Option[String] =
        if (p >= 1 && p + 1 < ts.length) Some(ts.slice(p.toInt - 1, p.toInt + 2).mkString(" "))
        else None
      val matches = (start1 to start1 + spanTokens - 3).count(p =>
        gram(toks(d1), p).isDefined && gram(toks(d1), p) == gram(toks(d2), p - off))
      assert(matches >= nShared,
        s"span ($d1, $d2, off=$off): only $matches aligned grams for $nShared fingerprints")
    }
  }

  test("int8 quantization: codes bounded, mse under the half-step bound") {
    val rows = byName("embed_quantize").run(spark, sf0001)
      .select("vec_id", "scale", "max_code", "mse")
      .as[(Long, Double, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, scale, maxCode, mse) =>
      assert(maxCode <= 127, s"vec $id code overflows int8: $maxCode")
      // |x - code*scale| <= scale/2 per element, so mse <= scale^2/4
      // (rounding slack: scale is 6 dp, mse 9 dp)
      assert(mse <= scale * scale / 4 + 1e-9, s"vec $id mse $mse vs scale $scale")
    }
  }

  test("source_overlap conserves the candidate-pair count and is triangular") {
    val q = byName("source_overlap").run(spark, sf0001)
    val m = q
      .select("source_a", "source_b", "n_pairs")
      .as[(String, String, Long)].collect()
    assert(m.forall { case (a, b, _) => a <= b }, "matrix not normalized")
    val totalPairs = byName("dedup_minhash").run(spark, sf0001).count()
    assert(m.map(_._3).sum === totalPairs,
      "overlap matrix dropped or double-counted candidate pairs")
    // both decoration joins must broadcast the pair-derived side — the
    // corpus streams; a sort-merge here means the corpus shuffled
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"pair decoration shuffled the corpus:\n$plan")
  }

  test("quantized ANN holds recall@10 >= 0.9 against the float32 exact baseline") {
    def topk(name: String) =
      byName(name).run(spark, sf001)
        .select("q_id", "n_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = topk("ann_bruteforce")
    val quant = topk("ann_quantized")
    assert(exact.keySet === quant.keySet)
    // int8 over 64 dims loses almost nothing; anything below 0.9 means
    // the codes or the cosine went wrong, not that quantization "hurts"
    val recalls = exact.map { case (q, ex) =>
      quant(q).intersect(ex).size.toDouble / ex.size
    }
    assert(recalls.sum / recalls.size >= 0.9,
      s"mean recall ${recalls.sum / recalls.size} below floor (per-q: $recalls)")
  }

  test("PQ ANN recall@5 holds the pinned floor against the exact cosine baseline") {
    import org.apache.spark.sql.expressions.Window
    val pq = byName("ann_pq").run(spark, sf001)
      .select("q_id", "n_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // exact cosine top-5 for the same 20 queries, same tie rule
    val e = Tables.load(spark, sf001, "embeddings")
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
    val n = e.select(col("vec_id").as("n_id"), col("embedding").as("ne"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("n_id"))
    val exact = n.join(broadcast(q), col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"),
        graft.ops.Similarity.cosine(col("qe"), col("ne")).as("cos_sim"))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 5)
      .select("q_id", "n_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(exact.keySet === pq.keySet)
    val recalls = exact.map { case (qid, ex) =>
      pq(qid).intersect(ex).size.toDouble / ex.size
    }
    val mean = recalls.sum / recalls.size
    info(f"ann_pq mean recall@5 = $mean%.3f")
    // deterministic pipeline over a fixed fixture => recall is exactly
    // 0.87 every run; 0.8 leaves margin only for intentional parameter
    // retuning. The ADC scan alone scores 0.09 on these near-random
    // vectors — the exact re-rank stage is what this floor pins.
    assert(mean >= 0.8, s"mean recall $mean below floor (per-q: $recalls)")
  }

  test("cluster_purity accounting: sizes cover the corpus, purity in (0,1]") {
    val rows = byName("cluster_purity").run(spark, sf001).collect()
    assert(rows.nonEmpty)
    val total = Tables.load(spark, sf001, "embeddings").count()
    assert(rows.map(_.getLong(1)).sum === total, "cluster sizes must cover every vector")
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(1), "majority count exceeds cluster size")
      val p = r.getDouble(4)
      assert(p > 0 && p <= 1.0 && p === r.getLong(3).toDouble / r.getLong(1))
    }
  }

  test("dedup_keep_list: every doc verdicted, exactly one keep per cluster, longest wins") {
    val rows = byName("dedup_keep_list").run(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val nDocs = Tables.load(spark, sf001, "documents").count()
    assert(rows.length.toLong === nDocs, "keep-list must cover every document")
    val byCluster = rows.groupBy(_._2)
    byCluster.foreach { case (c, ms) =>
      assert(ms.count(_._3) === 1, s"cluster $c must keep exactly one doc")
    }
    // the kept doc is the longest (ties lowest id) of its cluster
    val chars = Tables.load(spark, sf001, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    byCluster.foreach { case (c, ms) =>
      val kept = ms.find(_._3).get._1
      val want = ms.map(_._1).minBy(id => (-chars(id), id))
      assert(kept === want, s"cluster $c kept $kept, expected $want")
    }
    // clustered docs agree with dedup_clusters' labels
    val lbls = byName("dedup_clusters").run(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (d, c, _) =>
      assert(lbls.getOrElse(d, d) === c, s"doc $d cluster mismatch")
    }
  }

  test("winnowing tolerates documents shorter than one 3-gram") {
    // sequence(1, 0) is DESCENDING [1, 0] in Spark, not empty — without
    // the size filter these docs throw INVALID_ARRAY_INDEX under ANSI
    // mode (and diverge from the oracle's empty generate_series)
    val docs = Seq((1L, "hello world"), (2L, "one"), (3L, ""),
      (4L, "a b c d e f g h")).toDF("doc_id", "text")
    val fp = graft.queries.TextQueries.winnowFingerprintsOf(docs)
      .select("doc_id").distinct().as[Long].collect().sorted
    assert(fp === Array(4L), "short docs must yield zero fingerprints, long ones survive")
  }

  test("IVF+PQ ANN: every neighbor shares a probed coarse list; recall@5 holds the floor") {
    import org.apache.spark.sql.expressions.Window
    import graft.ops.Similarity
    val got = byName("ann_ivf_pq").run(spark, sf001)
      .select("q_id", "n_id").as[(Long, Long)].collect()
    // composition invariant: a returned neighbor must live in one of
    // its query's Nprobe most-similar coarse lists — anything else
    // means the ADC scan leaked past the IVF pruning
    val coefs = Similarity.centroidCoefs(
      graft.queries.SimilarityQueries.Centroids, graft.queries.SimilarityQueries.Dim)
    val e = Tables.load(spark, sf001, "embeddings")
      .select(col("vec_id"),
        graft.functions.CentroidAssign(col("embedding"), coefs).as("cl"))
      .as[(Long, Int)].collect().toMap
    val sims = coefs.toIndexedSeq.map(cen =>
      round(Similarity.dotLit(col("embedding"), cen), 6))
    val probed = Tables.load(spark, sf001, "embeddings")
      .filter(col("vec_id") < 20)
      .select(col("vec_id"), array(sims: _*).as("ss"))
      .as[(Long, Seq[Double])].collect()
      .map { case (q, ss) =>
        q -> ss.zipWithIndex.sortBy { case (s, c) => (-s, c) }
          .take(graft.queries.SimilarityQueries.Nprobe).map(_._2).toSet
      }.toMap
    got.foreach { case (q, n) =>
      assert(probed(q).contains(e(n)),
        s"neighbor $n of query $q is outside the probed lists ${probed(q)}")
    }
    // recall@5 vs the exact cosine baseline: 0.65 — lower than
    // ann_pq's 0.87 by construction (IVF prunes ~half the candidates
    // before the ADC scan — recall trades for the 2x scan cut, the
    // knob being nprobe), deterministic on the fixed fixture; 0.6
    // leaves margin only for intentional parameter retuning
    val pq = got.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val emb = Tables.load(spark, sf001, "embeddings")
    val q = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
    val n = emb.select(col("vec_id").as("n_id"), col("embedding").as("ne"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("n_id"))
    val exact = n.join(broadcast(q), col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"),
        Similarity.cosine(col("qe"), col("ne")).as("cos_sim"))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 5)
      .select("q_id", "n_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (qid, ex) =>
      pq(qid).intersect(ex).size.toDouble / ex.size
    }
    val mean = recalls.sum / recalls.size
    info(f"ann_ivf_pq mean recall@5 = $mean%.3f")
    assert(mean >= 0.6, s"mean recall $mean below floor (per-q: $recalls)")
  }

  test("dedup_band_stats accounting matches the banding it audits") {
    val rows = byName("dedup_band_stats").run(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.map(_._1).toSeq === (0 until graft.queries.DedupQueries.B).map(_.toLong))
    // every doc with >= 1 shingle contributes exactly one key per band
    val docsWithShingles = graft.ops.Dedup.minhashFromText(
      Tables.load(spark, sf001, "documents"), "doc_id", "text",
      graft.queries.DedupQueries.K).count()
    rows.foreach { case (b, buckets, docs, colliding, pairs, maxB) =>
      assert(docs === docsWithShingles, s"band $b dropped docs")
      assert(colliding <= buckets && maxB >= 1 && buckets <= docs)
      assert(pairs >= colliding, s"band $b: a colliding bucket yields >= 1 pair")
    }
    // summed pair mass bounds the DISTINCT candidate set from above
    // (a pair colliding in two bands is counted twice here, once there)
    val distinctPairs = byName("dedup_minhash").run(spark, sf001).count()
    assert(rows.map(_._5).sum >= distinctPairs,
      "band pair mass cannot undercount the distinct candidate pairs")
  }

  test("jaccard_knn_graph: degree-capped, candidate-closed, calibration-consistent") {
    val rows = byName("jaccard_knn_graph").run(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    // per-doc: at most 3 partners, ranks dense from 1, jaccard non-increasing
    rows.groupBy(_._1).foreach { case (d, es) =>
      val sorted = es.sortBy(_._2)
      assert(sorted.length <= 3 && sorted.map(_._2).toSeq === (1 to sorted.length))
      assert(sorted.sliding(2).forall(p => p.length < 2 || p(0)._4 >= p(1)._4),
        s"doc $d: jaccard not non-increasing in rank")
    }
    // closure: every edge is a banding candidate pair, and its weight
    // equals minhash_calibration's exact jaccard for that pair
    val calib = byName("minhash_calibration").run(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    rows.foreach { case (d, _, p, j) =>
      val key = if (d < p) (d, p) else (p, d)
      assert(calib.contains(key), s"edge $key is not a banding candidate")
      assert(calib(key) === j, s"edge $key weight $j != calibration ${calib(key)}")
    }
  }

  test("ngram_novelty: first doc fully novel, novel mass = distinct shingle universe") {
    val rows = byName("ngram_novelty").run(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // the minimum doc_id owns every one of its shingles
    val first = rows.minBy(_._1)
    assert(first._2 === first._3 && first._4 === 1.0,
      s"lowest doc ${first._1} must be fully novel")
    rows.foreach { case (d, n, novel, frac) =>
      assert(novel <= n, s"doc $d: novel exceeds shingle count")
      assert(math.abs(frac - novel.toDouble / n) < 1e-6)
    }
    // each distinct shingle hash is novel in exactly one document, so
    // the novel counts partition the shingle universe
    val universe = graft.ops.Dedup.distinctShingles(
        Tables.load(spark, sf001, "documents").select("doc_id", "text"),
        "doc_id", "text")
      .select(graft.functions.PortableHash.h32(col("shingle")))
      .distinct().count()
    assert(rows.map(_._3).sum === universe,
      "novel-shingle mass must equal the distinct shingle-hash universe")
  }
}
