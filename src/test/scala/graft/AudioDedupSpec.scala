package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Multimodal}

/** Semantic pins for energy-fingerprint-banded audio near-dup dedup
  * (`dedup_audio_fp`) on CONSTRUCTED WAVs — the DuckDB oracle owns
  * census-level correctness; these pin the operator's claims on cases
  * built by hand: a +1-sample DC-nudge re-encode of a real WAV must
  * band-collide and verify at a small Hamming distance, an unrelated
  * clip must do neither, the fingerprint must be reached through the
  * REAL RIFF walk (torn containers fail loudly), and the
  * planted-pair construction must pair originals with re-encodes.
  */
class AudioDedupSpec extends SparkSpec {

  private def hamming(a: String, b: String): Int =
    a.zip(b).count { case (x, y) => x != y }

  /** A deterministic “speech-like” PCM clip: piecewise segments of
    * alternating loudness so the energy envelope carries structure
    * (an all-flat clip would fingerprint as all-zeros and collide
    * with everything flat).
    */
  private def clip(seed: Int, n: Int): Array[Byte] =
    Array.tabulate(n) { i =>
      val burst = (i / 50 + seed) % 3 // 3-level loudness cycle
      val amp = burst * 40
      (128 + (if (i % 2 == 0) amp else -amp)).toByte
    }

  test("constructed near-identical WAVs band-collide and verify; unrelated clips do neither") {
    import spark.implicits._
    val base = clip(0, 800)
    val nudged = base.map(b => (((b & 0xff) + 1) % 256).toByte)
    val media = Seq(
      Multimodal.MediaFile(1L, "audio", Multimodal.buildWav(base), "s"),
      Multimodal.MediaFile(2L, "audio", Multimodal.buildWav(nudged), "s"),
      Multimodal.MediaFile(3L, "audio",
        Multimodal.buildWav(clip(1, 1000)), "s")).toDS()
    val fp = Multimodal.decodeAudioFp(media).toDF()
      .select("media_id", "fp").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp.values.forall(_.length == 64))
    assert(hamming(fp(1L), fp(2L)) <= 10,
      s"DC nudge should be a small Hamming step, got ${hamming(fp(1L), fp(2L))}")
    assert(hamming(fp(1L), fp(3L)) > 10, "unrelated clips too close")
    val bands = Multimodal.decodeAudioFp(media).toDF()
      .select(col("media_id"), explode(array((0 until 4).map(b =>
        concat_ws(":", lit(b.toString),
          substring(col("fp"), b * 16 + 1, 16))): _*)).as("band"))
    val pairs = Dedup.candidatePairs(bands, "media_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)),
      s"banding should pair exactly the re-encode, got $pairs")
  }

  test("pcmOf walks the real RIFF container and fails loudly on torn bytes") {
    val pcm = clip(2, 300)
    val wav = Multimodal.buildWav(pcm)
    assert(Multimodal.pcmOf(wav).sameElements(pcm),
      "data chunk should round-trip bit-identically")
    // truncated mid-data: the chunk length claims bytes past the end
    val torn = wav.take(wav.length - 10)
    assertThrows[IllegalArgumentException](Multimodal.pcmOf(torn))
    assertThrows[IllegalArgumentException](
      Multimodal.pcmOf("nota wav at all".getBytes))
  }

  test("nearDupWavContainers plants a re-encode per doc_id % 12 == 7 that pairs with its original") {
    val docs = Tables.load(spark, sf0001, "documents")
      .filter(col("doc_id") % 3 === 1 && length(col("text")) >= 256)
    val media = Multimodal.nearDupWavContainers(docs)
    val n = docs.count()
    val planted = docs.filter(col("doc_id") % 12 === 7).count()
    assert(planted > 0, "fixture should contain planted docs")
    assert(media.count() === n + planted, "one re-encode per %12==7 doc")
    val out = SparkEntry.queries("dedup_audio_fp")(spark, sf0001).collect()
    assert(out.forall(r => r.getLong(0) < r.getLong(1)))
    assert(out.forall(r => r.getLong(2) <= 10))
    assert(out.exists(r =>
      r.getLong(1) === r.getLong(0) + Multimodal.NearDupOffset),
      "no planted (original, re-encode) pair in the verified census")
  }
}
