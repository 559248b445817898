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

  test("bpeMergeFold implements greedy left-to-right BPE, chains included") {
    import spark.implicits._
    // (symbols, pair to merge, expected) — chain cases (a==b) resolve
    // by the odd-occurrence rule, overlaps never double-consume
    val cases = Seq(
      (Seq("a", "b", "c"), ("a", "b"), Seq("ab", "c")),
      (Seq("a", "a", "a"), ("a", "a"), Seq("aa", "a")),
      (Seq("a", "a", "a", "a"), ("a", "a"), Seq("aa", "aa")),
      (Seq("a", "a", "a", "a", "a"), ("a", "a"), Seq("aa", "aa", "a")),
      (Seq("x", "a", "b", "a", "b"), ("a", "b"), Seq("x", "ab", "ab")),
      (Seq("a", "a", "b"), ("a", "b"), Seq("a", "ab")),
      (Seq("ab", "ab", "ab"), ("ab", "ab"), Seq("abab", "ab")),
      (Seq("b", "a"), ("a", "b"), Seq("b", "a")),
      (Seq("a"), ("a", "a"), Seq("a")))
    cases.foreach { case (syms, (a, b), expect) =>
      val got = Seq(syms).toDF("syms")
        .select(graft.queries.VocabQueries.bpeMergeFold(col("syms"), a, b))
        .as[Seq[String]].head()
      assert(got === expect, s"merge ($a,$b) over $syms")
    }
  }

  test("bpe_encode bounds: words <= bpe tokens <= chars, compression >= 1") {
    val rows = run("bpe_encode", sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (words, chars, bpe, ratio) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(words <= bpe, s"doc ${r.getLong(0)}: fewer tokens than words")
      assert(bpe <= chars, s"doc ${r.getLong(0)}: merging grew the token count")
      assert(ratio >= 1.0 && ratio == chars.toDouble / bpe)
    }
    // corpus-wide: the final audit row of bpe_merges must agree with
    // the summed per-doc encode (same segmentation, two paths)
    val audit = run("bpe_merges", sf0001).collect().last.getLong(6)
    assert(rows.map(_.getLong(3)).sum === audit,
      "per-doc BPE token total != bpe_merges final corpus_symbols")
  }

  test("batched BPE: fewer driver argmax rounds and fewer jobs than one-merge-per-round") {
    import graft.queries.VocabQueries
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val rounds = VocabQueries.bpeTrainRounds(spark, sf0001, VocabQueries.BpeRounds)
      Thread.sleep(2000) // listener bus is async; let job-start events drain
      assert(rounds.length === VocabQueries.BpeRounds, "merge count changed")
      // sequential greedy needs BpeRounds argmax round-trips; batching
      // must need strictly fewer (each one serves multiple merges)
      val argmax = VocabQueries.bpeArgmaxRounds.get()
      assert(argmax < VocabQueries.BpeRounds, s"no batching happened: $argmax rounds")
      // job budget: the old shape ran ~2 jobs per merge (argmax +
      // checkpoint) + init; batched keeps per-merge checkpoints but
      // shares argmax jobs, so the total must undercut 2*rounds + 1
      assert(jobs.get() < 2 * VocabQueries.BpeRounds + 1,
        s"job count ${jobs.get()} not reduced")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("bpeSelectBatch: disjoint prefix, count fence, merged-symbol collisions") {
    import graft.queries.VocabQueries.bpeSelectBatch
    // plain disjoint prefix, fenced by the (want+1)-th count
    assert(bpeSelectBatch(Seq(("a", "b", 9L), ("c", "d", 7L), ("e", "f", 7L)),
      want = 2, hasMore = true) === Seq(("a", "b", 9L)))
    // strict fence: second pair ties the fence count -> dropped
    assert(bpeSelectBatch(Seq(("a", "b", 9L), ("c", "d", 7L), ("e", "a", 7L)),
      want = 3, hasMore = false) === Seq(("a", "b", 9L)))
    // conflict stops the prefix (no skipping past it)
    assert(bpeSelectBatch(Seq(("a", "b", 9L), ("b", "c", 8L), ("d", "e", 7L)),
      want = 3, hasMore = false) === Seq(("a", "b", 9L)))
    // merged symbol may collide with an existing symbol
    assert(bpeSelectBatch(Seq(("a", "b", 9L), ("ab", "c", 5L)),
      want = 3, hasMore = false) === Seq(("a", "b", 9L)))
    // fully disjoint complete list: everything accepted, no fence
    assert(bpeSelectBatch(Seq(("a", "b", 9L), ("c", "d", 7L), ("e", "f", 3L)),
      want = 3, hasMore = false)
      === Seq(("a", "b", 9L), ("c", "d", 7L), ("e", "f", 3L)))
    // top-1 fallback when the fence empties the batch
    assert(bpeSelectBatch(Seq(("a", "b", 7L), ("c", "d", 7L), ("e", "f", 7L)),
      want = 2, hasMore = true) === Seq(("a", "b", 7L)))
  }

  test("bpeMergeFold equals an independent reference merger on randomized inputs") {
    import spark.implicits._
    // classic two-pointer greedy with explicit skip-after-merge — an
    // implementation with a DIFFERENT shape from the fold, so a
    // semantic bug in either surfaces as a mismatch
    def ref(syms: Seq[String], a: String, b: String): Seq[String] = {
      val out = scala.collection.mutable.ListBuffer[String]()
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toSeq
    }
    // adversarial alphabet: symbols that PREFIX each other and equal
    // merged outputs, arrays up to length 8 including empty
    val alphabet = Vector("a", "b", "ab", "ba", "aa", "c")
    val rnd = new scala.util.Random(7)
    val pairs = Seq(("a", "b"), ("a", "a"), ("ab", "ab"), ("b", "a"),
      ("aa", "a"), ("a", "ab"))
    pairs.foreach { case (a, b) =>
      val cases = Vector.fill(200)(
        Vector.fill(rnd.nextInt(9))(alphabet(rnd.nextInt(alphabet.size))))
      val got = cases.toDF("syms")
        .select(graft.queries.VocabQueries.bpeMergeFold(col("syms"), a, b))
        .as[Seq[String]].collect()
      cases.zip(got).foreach { case (in, out) =>
        assert(out === ref(in, a, b), s"merge ($a,$b) over $in")
      }
    }
  }

  test("bpe_merges is deterministic and the audit telescopes") {
    val a = run("bpe_merges", sf0001).collect()
    val b = run("bpe_merges", sf0001).collect()
    assert(a.sameElements(b), "merge order must be run-to-run deterministic")
    // each round merges pair_count occurrences: corpus symbol count
    // drops by exactly pair_count per round
    val rows = a.map(r => (r.getInt(0), r.getLong(4), r.getLong(5), r.getLong(6)))
    rows.sliding(2).foreach { case Array((_, _, _, prevSyms), (k, n, _, syms)) =>
      assert(prevSyms - n === syms,
        s"round $k: symbols $prevSyms - merged $n != $syms")
    }
    // vocab never grows by more than 1 type per round
    rows.sliding(2).foreach { case Array((_, _, v1, _), (k, _, v2, _)) =>
      assert(v2 <= v1 + 1, s"round $k vocab jumped $v1 -> $v2")
    }
  }

  test("pmi_collocations matches an independent driver-side recount at sf0.001") {
    import spark.implicits._
    val docs = Tables.load(spark, sf0001, "documents")
      .select("text").as[String].collect().map(_.split(" ").toSeq)
    val uni = docs.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = uni.values.sum
    val big = docs.flatMap(a => a.zip(a.tail))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nb = big.values.sum
    def pmi(w1: String, w2: String, c12: Long): Double = {
      val x = (c12 * n * n).toDouble / (nb * uni(w1) * uni(w2)).toDouble
      BigDecimal(math.log(x)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = big.toSeq.collect {
      case ((w1, w2), c12) if c12 >= graft.queries.VocabQueries.MinColl =>
        (w1, w2, c12, pmi(w1, w2, c12))
    }.sortBy { case (w1, w2, _, p) => (-p, w1, w2) }
      .take(graft.queries.VocabQueries.CollTopK)
    val got = run("pmi_collocations", sf0001)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got === expected, "top-k PMI list disagrees with the recount")
    // sanity: PMI is the association signal — the list must contain
    // positive associations (pairs over-represented vs independence)
    assert(got.exists(_._4 > 0.0))
  }

  test("textrank_keywords matches an independent power-iteration recount at sf0.001") {
    import spark.implicits._
    import graft.queries.VocabQueries.{MinCooc, TextRankTopK}
    val docs = Tables.load(spark, sf0001, "documents")
      .select("text").as[String].collect().map(_.split(" ").toSeq)
    val und = docs.flatMap(a => a.zip(a.tail))
      .filter { case (x, y) => x != y }
      .map { case (x, y) => if (x < y) (x, y) else (y, x) }
      .groupBy(identity).view.mapValues(_.size)
      // keys out as a Seq BEFORE filtering: a Map.collect returning
      // pairs would rebuild a Map and collapse edges sharing a source
      .toSeq.collect { case (e, c) if c >= MinCooc => e }
    val edges = und ++ und.map(_.swap)
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    var r: Map[String, BigDecimal] = deg.keys.map(_ -> BigDecimal(1.0)).toMap
    (1 to 3).foreach { _ =>
      val contrib = r.map { case (t, v) => t -> r9(v.toDouble / deg(t)) }
      r = edges.groupBy(_._2).view.mapValues { es =>
        r9(0.15 + 0.85 * es.map(e => contrib(e._1)).sum.toDouble)
      }.toMap
    }
    val expected = r.toSeq.map { case (t, v) => (t, v.toDouble, deg(t)) }
      .sortBy { case (t, v, _) => (-v, t) }.take(TextRankTopK)
    val got = run("textrank_keywords", sf0001)
      .as[(String, Double, Long)].collect().toSeq
    assert(got === expected, "textrank disagrees with the recount")
    // centrality sanity: ranks differ (the graph is not degree-regular)
    assert(got.map(_._2).distinct.length > 1)
  }

  test("lang_id_nb matches an independent NB reimplementation at sf0.001") {
    import spark.implicits._
    val docs = Tables.load(spark, sf0001, "documents")
      .select("doc_id", "lang", "text")
      .as[(Long, String, String)].collect()
    val train = docs.filter(_._1 % 2 == 0)
    // model: per-class token counts, totals, vocab, priors
    val tr = train.flatMap { case (_, l, t) => t.split(" ").map(l -> _) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tot = tr.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val v = tr.keys.map(_._2).toSet.size.toLong
    val pri = train.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val ndocs = train.length.toLong
    def r6(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val classes = tot.keys.toSeq.sorted
    val expected = docs.map { case (id, trueLang, text) =>
      val counts = text.split(" ").groupBy(identity).view.mapValues(_.size).toMap
      val scored = classes.map { cl =>
        val lsum = counts.map { case (tok, cNum) =>
          r6(math.log((tr.getOrElse((cl, tok), 0L) + 1.0) / (tot(cl) + v))) * cNum
        }.sum
        cl -> (r6(math.log(pri(cl).toDouble / ndocs)) + lsum)
      }
      val (pred, lp) = scored.maxBy { case (cl, s) => (s, ScoredRev(cl)) }
      (id, trueLang, pred, lp.toDouble, pred == trueLang)
    }.sortBy(_._1).toSeq
    val got = run("lang_id_nb", sf0001)
      .as[(Long, String, String, Double, Boolean)].collect().toSeq
    assert(got === expected, "NB predictions disagree with the reimplementation")
    // held-out docs exist on both sides of the split and get scored
    assert(got.exists(_._1 % 2 == 1) && got.exists(_._1 % 2 == 0))
  }

  /** Reverse-ordering wrapper so maxBy's (score asc, name desc) tuple
    * ordering implements "max score, ties to the SMALLEST class name"
    * — the query's (logpost DESC, cand ASC) row_number rule.
    */
  private case class ScoredRev(s: String)
  private implicit val scoredRevOrd: Ordering[ScoredRev] =
    Ordering.by[ScoredRev, String](_.s).reverse
}
