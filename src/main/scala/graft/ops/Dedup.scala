package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PortableHash.h32

/** Deduplication operators for large-scale text corpora (north-star
  * extension set): exact, MinHash+LSH, SimHash, n-gram Jaccard.
  *
  * Scale design (100 TB): every operator here is shuffle-bounded —
  *  - exact dedup groups on md5(text) (16-byte shuffle key, never the
  *    document body);
  *  - MinHash reduces each document to a K-integer signature before
  *    anything wide happens; candidate generation joins on band keys
  *    (b small buckets per doc), never all-pairs;
  *  - SimHash reduces to one 16-bit integer per doc;
  *  - n-gram Jaccard is blocked by (lang, length-bucket) so the pair
  *    space is quadratic only within small blocks, and intersections
  *    come from a shingle equi-join (shuffle on shingle hash), not a
  *    cross join.
  * All hashes are [[graft.functions.PortableHash]] (md5-derived) so
  * results are reproducible across engines and runs — no JVM
  * `hashCode`, no partition-order dependence.
  */
object Dedup {

  /** Word tokens (single-space-separated corpus). */
  def tokens(text: Column): Column = split(text, " ")

  /** Word w-shingles (default 3-grams) as an array column; empty array
    * for texts shorter than w tokens (DuckDB `generate_series` parity —
    * Spark's `sequence(1, n)` with n < 1 counts DOWN, so guard it).
    */
  def shingles(text: Column, w: Int = 3): Column = {
    // EVALUATE-ONCE BINDING (the TextAnalysis.histogram discipline):
    // interpreted HOF lambdas re-evaluate outer subtrees once per
    // element, so referencing `tokens(text)` directly inside the
    // position lambda would re-split the text w times per position —
    // O(w·k²) characters per row. `transform(array(x), v -> body)`
    // binds the token array as a VALUE, splitting once per row.
    element_at(transform(array(tokens(text)), arr =>
      when(size(arr) >= w,
        transform(sequence(lit(1), size(arr) - (w - 1)), i =>
          concat_ws(" ", (0 until w).map(k => element_at(arr, i + k)): _*)))
        .otherwise(array().cast("array<string>"))), 1)
  }

  /** Exploded distinct (id, shingle) pairs — the unit of MinHash and
    * Jaccard set arithmetic. The input is spread BEFORE the explode:
    * shingling inflates rows ~30x, so when the source has fewer splits
    * than cores (single-row-group parquet locally; always possible
    * after heavy pruning at cluster scale) the inflation and hashing
    * would otherwise run on one thread. The spread is GUARDED
    * ([[graft.Tables.parallelizeByRange]]): at 100 TB the input
    * arrives as many splits and an unconditional repartition would
    * shuffle the full corpus text before a pipeline whose later
    * exchanges carry only a handful of integers per document. Range
    * (not hash) partitioning on the id so the downstream per-id
    * aggregate AND a trailing global ORDER BY id both reuse the one
    * exchange.
    *
    * The distinct is PER-ROW (`array_distinct` before the explode),
    * not a global `.distinct()`: the id is unique per input row, so
    * deduplicating (id, shingle) globally equals deduplicating each
    * document's own shingle array locally — same multiset, but the
    * corpus-wide exchange that used to hash-partition every (id,
    * 3-gram STRING) pair is gone, and downstream per-id aggregates
    * partial-aggregate against the range spread directly (guide §2.4:
    * remove shuffles outright; measured r14, see OPTIMIZATION_r14.md).
    */
  def distinctShingles(df: DataFrame, idCol: String, textCol: String): DataFrame =
    graft.Tables.parallelizeByRange(df, col(idCol))
      .select(col(idCol), explode(array_distinct(shingles(col(textCol)))).as("shingle"))

  /** MinHash signature: K min-hashes over the shingle set via ONE md5
    * per shingle + K affine permutations mod 2^31-1 (12x fewer md5
    * calls than K seeded hashes — the benchmark hot spot).
    * Input: distinct (id, shingle); output: id, m0..m{k-1}.
    */
  def minhashSignature(shingled: DataFrame, idCol: String, k: Int): DataFrame = {
    import graft.functions.PortableHash
    val perms = PortableHash.minhashPerms(k)
    val hashed = shingled.select(col(idCol),
      (h32(col("shingle")) % PortableHash.MersennePrime31).as("hm"))
    val aggs = perms.zipWithIndex.map { case ((a, b), i) =>
      min(PortableHash.permute(col("hm"), a, b)).as(s"m$i")
    }
    hashed.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash signatures straight from text, skipping the global shingle
    * DISTINCT: `min` is duplicate-invariant, so deduplicating first
    * only adds the pipeline's heaviest shuffle (the shingle STRINGS).
    * Here the only wide strings live inside one map stage; the sole
    * post-repartition exchange carries K integers per document. Use
    * [[distinctShingles]] + [[minhashSignature]] only when the distinct
    * set itself is needed (e.g. Jaccard intersection counts).
    */
  def minhashFromText(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    minhashSignature(
      graft.Tables.parallelizeByRange(df, col(idCol))
        .select(col(idCol), explode(shingles(col(textCol))).as("shingle")),
      idCol, k)

  /** LSH band keys from a signature: b bands of r rows each
    * (k = b*r). One output row per (id, band). Collision probability of
    * a pair per band ≈ jaccard^r.
    */
  def bandKeys(sig: DataFrame, idCol: String, b: Int, r: Int): DataFrame =
    sig.select(col(idCol),
      explode(array((0 until b).map { band =>
        concat_ws(",",
          lit(band.toString) +: (0 until r).map(j => col(s"m${band * r + j}")): _*)
      }: _*)).as("band"))

  /** In-bucket pair expansion — THE candidate-generation idiom shared
    * by every blocked/banded dedup here (MinHash bands, prefix-shingle
    * buckets, simhash byte bands): group by the bucket key(s), collect
    * the sorted distinct payloads, and explode each bucket's unordered
    * pairs (a < b in sort order, which for struct payloads is
    * first-field order). Never a self-join — a self-join would
    * recompute the upstream pipeline for both sides and shuffle it
    * twice; bucket sizes are bounded by blocking design, so the
    * quadratic expansion stays local. Output: struct columns `a`, `b`.
    */
  def bucketPairs(df: DataFrame, bucketCols: Seq[Column], payload: Column): DataFrame =
    bucketPairsCapped(df, bucketCols, payload, Int.MaxValue)

  /** [[bucketPairs]] with a hot-bucket cap: a bucket larger than
    * `maxBucket` contributes pairs only among its `maxBucket` smallest
    * payloads (sort order, so the kept prefix is deterministic) instead
    * of its full quadratic expansion. Blocking DESIGN bounds bucket
    * sizes in every shipped pipeline, but a degenerate band — e.g. a
    * corpus of identical documents — would otherwise concentrate
    * O(n²) structs in ONE task; the cap turns that into a bounded task
    * at the cost of possibly missing pairs WITHIN the overflowing
    * bucket (near-dup sets that large are caught by their other bands,
    * and truncation is observable via [[bucketOverflowAudit]]).
    * Default cap = unbounded, so existing callers are byte-identical.
    */
  def bucketPairsCapped(df: DataFrame, bucketCols: Seq[Column], payload: Column,
                        maxBucket: Int): DataFrame = {
    val grouped = df.groupBy(bucketCols: _*)
      .agg(sort_array(collect_set(payload)).as("xs0"))
      .filter(size(col("xs0")) > 1)
    val capped =
      if (maxBucket == Int.MaxValue) grouped.withColumn("xs", col("xs0"))
      else grouped.withColumn("xs", slice(col("xs0"), 1, maxBucket))
    capped
      .select(explode(flatten(transform(col("xs"), (x, i) =>
        transform(slice(col("xs"), i + 2, size(col("xs"))),
          y => struct(x.as("a"), y.as("b")))))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
  }

  /** Overflow audit for [[bucketPairsCapped]]: the buckets whose
    * distinct-payload count exceeds `maxBucket`, with their sizes —
    * run alongside a capped pipeline so truncation is REPORTED, never
    * silent. Aggregate-only (no pair expansion), so it is safe to run
    * even on the degenerate input that motivated the cap.
    */
  def bucketOverflowAudit(df: DataFrame, bucketCols: Seq[Column], payload: Column,
                          maxBucket: Int): DataFrame =
    df.groupBy(bucketCols: _*)
      .agg(countDistinct(payload).as("bucket_size"))
      .filter(col("bucket_size") > maxBucket)

  /** Candidate duplicate pairs: ids sharing at least one band key. */
  def candidatePairs(bands: DataFrame, idCol: String): DataFrame =
    bucketPairs(bands, Seq(col("band")), col(idCol))
      .select(col("a").as("id_a"), col("b").as("id_b")).distinct()

  /** Connected components over candidate duplicate pairs: every doc in
    * a pair gets `cluster_id` = the minimum doc id reachable through
    * shared-band edges (so "keep one per cluster" = keep doc_id ==
    * cluster_id). Min-label propagation: each iteration joins labels
    * across edges and keeps the minimum; converges in <= component
    * diameter rounds — near-dup clusters are shallow, so a handful.
    *
    * Scale notes: this is the standard iterative-DataFrame shape —
    * per-iteration `localCheckpoint` truncates the lineage (without it
    * the plan doubles every round and the optimizer chokes long before
    * data does), and the driver-side convergence `count` is one tiny
    * job per round, not a per-row collect. Label state is 2 longs per
    * node in the pair graph (not per corpus document).
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct().localCheckpoint(true)
    // each round checkpoints a fresh label set; the superseded one is
    // unpersisted as soon as its successor is materialized (eager
    // checkpoint), else a long-lived session accumulates one full
    // label-set of cached blocks PER ITERATION
    var checkpointed = edges.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id")).localCheckpoint(true)
    var labels = checkpointed
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val nbrMin = edges.join(labels, edges("dst") === labels("id"))
        .groupBy(edges("src").as("nid")).agg(min(col("lbl")).as("nlbl"))
      val updated = labels.join(nbrMin, labels("id") === nbrMin("nid"), "left")
        .select(col("id"), col("lbl"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl2"))
        .localCheckpoint(true)
      converged = updated.filter(col("lbl2") < col("lbl")).count() == 0
      checkpointed.unpersist()
      checkpointed = updated
      labels = updated.select(col("id"), col("lbl2").as("lbl"))
      i += 1
    }
    // a silent non-converged exit would return plausible-but-wrong
    // intermediate labels — fail loudly instead
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter iterations " +
        "(a component's min-node eccentricity exceeds maxIter); raise maxIter")
    // the returned frame reads only the final checkpoint, never edges
    edges.unpersist()
    labels.select(col("id"), col("lbl").as("cluster_id"))
  }

  /** 16-bit SimHash over the distinct token set: for each bit j, sum
    * votes (2*bit_j(h32(token)) - 1); bit set iff the sum is > 0.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String, bits: Int = 16): DataFrame = {
    // per-row array_distinct == global distinct (id unique per row);
    // saves the (id, token-string) exchange, same multiset — the
    // distinctShingles rationale
    val tok = graft.Tables.parallelizeByRange(df, col(idCol))
      .select(col(idCol), explode(array_distinct(tokens(col(textCol)))).as("tok"))
    simhashOf(tok, idCol, "tok", bits)
  }

  /** SimHash over an arbitrary pre-exploded distinct (id, feature)
    * frame — the production form runs on SHINGLE features: token-set
    * simhash saturates on small vocabularies (every long doc contains
    * every frequent token, so fingerprints tie), while shingle sets
    * stay discriminative. One partial-aggregable pass: per id,
    * `bits` vote sums, then the sign bits pack into one long.
    */
  def simhashOf(features: DataFrame, idCol: String, featCol: String,
                bits: Int): DataFrame = {
    val h = h32(0, col(featCol))
    val weights = (0 until bits).map(j =>
      sum(shiftright(h, j).bitwiseAND(lit(1L)) * 2 - 1).as(s"w$j"))
    features.groupBy(col(idCol))
      .agg(weights.head, weights.tail: _*)
      .select(col(idCol),
        (0 until bits).map(j =>
          when(col(s"w$j") > 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** Asymmetric shingle containment (the quote/boilerplate/subset
    * detector symmetric Jaccard misses): for every same-lang pair
    * sharing informative shingles, both directed containments
    * inter/|smaller side|, kept when either clears `threshold`.
    *
    * Deliberately NOT length-bucket blocked — equal-length blocking
    * would exclude exactly the short-in-long pairs this measures. The
    * scale guard is the shingle document-frequency cap (`maxDf`, the
    * dup_spans pattern): ubiquitous boilerplate shingles are not
    * containment evidence and would be the hot-key quadratic. The
    * measure is defined over the CAPPED shingle space — numerator and
    * denominator count the same shingles.
    *
    * Input needs (doc_id, lang, text); output (doc_id_1, doc_id_2,
    * cont_1_in_2, cont_2_in_1) with doc_id_1 < doc_id_2.
    */
  def containmentPairs(
      docs: DataFrame, maxDf: Int, threshold: Double = 0.6): DataFrame = {
    val dshRaw = distinctShingles(docs, "doc_id", "text")
    val df = dshRaw.groupBy("shingle").agg(count(lit(1)).as("f"))
      .filter(col("f") <= maxDf)
    val kept = dshRaw.join(df.select("shingle"), "shingle")
    val sz = kept.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val meta = docs.select(col("doc_id"), col("lang"))
    kept.join(broadcast(meta), "doc_id").join(sz, "doc_id")
      .groupBy("shingle", "lang")
      .agg(sort_array(collect_set(struct(col("doc_id"), col("n")))).as("xs"))
      .filter(size(col("xs")) > 1)
      .select(explode(flatten(transform(col("xs"), (x, i) =>
        transform(slice(col("xs"), i + 2, size(col("xs"))),
          y => struct(x.as("a"), y.as("b")))))).as("p"))
      // sort_array orders structs by doc_id, so p.a.doc_id < p.b.doc_id
      .groupBy(
        col("p.a.doc_id").as("d1"), col("p.b.doc_id").as("d2"),
        col("p.a.n").as("na"), col("p.b.n").as("nb"))
      .agg(count(lit(1)).as("inter"))
      // threshold on the RAW ratio (matching the SQL oracle's WHERE);
      // rounding is cosmetic output formatting, and filtering on the
      // rounded value would admit ratios in [threshold - 5e-7,
      // threshold) that the oracle rejects
      .filter(col("inter") * lit(1.0) / col("na") >= threshold ||
        col("inter") * lit(1.0) / col("nb") >= threshold)
      .select(col("d1").as("doc_id_1"), col("d2").as("doc_id_2"),
        round(col("inter") * lit(1.0) / col("na"), 6).as("cont_1_in_2"),
        round(col("inter") * lit(1.0) / col("nb"), 6).as("cont_2_in_1"))
  }
}
