package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Multimodal}

/** Semantic pins for ahash-banded image near-dup dedup
  * (`dedup_image_ahash`) on CONSTRUCTED images — the DuckDB oracle
  * owns census-level correctness; these pin the operator's claims on
  * a case built by hand: a one-intensity-step re-encode of a real PNG
  * must band-collide and verify at a small Hamming distance, an
  * unrelated image must do neither, and the planted-pair construction
  * used by the query must pair originals with their re-encodes.
  */
class ImageDedupSpec extends SparkSpec {

  private def hamming(a: String, b: String): Int =
    a.zip(b).count { case (x, y) => x != y }

  test("constructed near-identical PNGs band-collide and verify; unrelated images do neither") {
    import spark.implicits._
    // A and A' are the same raster one intensity step apart (the
    // re-encode/brightness-nudge near-dup class, real container bytes
    // through the real decode); B is an unrelated image
    val media = Seq(
      Multimodal.MediaFile(1L, "image",
        Multimodal.buildPngPixels(40, 30, None, 100), "s"),
      Multimodal.MediaFile(2L, "image",
        Multimodal.buildPngPixels(40, 30, None, 101), "s"),
      Multimodal.MediaFile(3L, "image",
        Multimodal.buildPngPixels(64, 48, None, 7), "s")).toDS()
    val ah = Multimodal.decodeAHash(media).toDF()
      .select("media_id", "ahash").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(hamming(ah(1L), ah(2L)) <= 10,
      s"re-encode should be a small Hamming step, got ${hamming(ah(1L), ah(2L))}")
    assert(hamming(ah(1L), ah(3L)) > 10, "unrelated images too close")
    // the banding machinery (the query's exact shape) finds exactly
    // the near-dup pair: Hamming <= 3 GUARANTEES a shared 16-bit band
    // (pigeonhole over 4 bands), and the unrelated image shares none
    val bands = Multimodal.decodeAHash(media).toDF()
      .select(col("media_id"), explode(array((0 until 4).map(b =>
        concat_ws(":", lit(b.toString),
          substring(col("ahash"), b * 16 + 1, 16))): _*)).as("band"))
    val pairs = Dedup.candidatePairs(bands, "media_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)),
      s"banding should pair exactly the re-encode, got $pairs")
  }

  test("nearDupImageContainers plants a re-encode per doc_id % 12 == 0 that pairs with its original") {
    val docs = Tables.load(spark, sf0001, "documents")
      .filter(col("doc_id") % 6 === 0 || col("doc_id") % 3 === 2)
    val media = Multimodal.nearDupImageContainers(docs)
    val n = docs.count()
    val planted = docs.filter(col("doc_id") % 12 === 0).count()
    assert(media.count() === n + planted, "one re-encode per %12 doc")
    // every planted re-encode appears in the query's verified census
    // paired with its own original (offset identity), at Hamming the
    // query's own threshold accepts or legitimately above it — but
    // the pair (id, id + offset) must be a CANDIDATE whenever any
    // band survives the intensity shift; check the full query output
    // contains only well-formed pairs and at least one planted pair
    val out = SparkEntry.queries("dedup_image_ahash")(spark, sf0001).collect()
    assert(out.forall(r => r.getLong(0) < r.getLong(1)))
    assert(out.forall(r => r.getLong(2) <= 10))
    assert(out.exists(r =>
      r.getLong(1) === r.getLong(0) + Multimodal.NearDupOffset),
      "no planted (original, re-encode) pair in the verified census")
  }
}
