package graft.ops

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing (north-star
  * extension set): opaque `binary` content + typed metadata, with
  * decode/feature-extraction as partition-batched functions.
  *
  * The actual media codecs are NOT in this environment, so the decode
  * step is a clearly-marked deterministic STUB (dimensions derived from
  * an md5 of the bytes). Everything around it is real Spark plumbing:
  * the schema, the `Dataset[MediaFile] => Dataset[MediaFeatures]`
  * partition-batched operator (the Scala analog of `mapInPandas` — one
  * decoder init per partition, streamed batches, no per-row setup), and
  * the partitioning story (feature extraction is narrow/map-side; at
  * 100 TB the media table would be stored with content in its own
  * parquet column chunk so metadata-only queries never read bytes).
  */
object Multimodal {

  /** A media object: opaque bytes + typed envelope. */
  case class MediaFile(
      media_id: Long,
      kind: String, // image | audio | video
      content: Array[Byte],
      source: String)

  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      content_md5: String,
      width: Int, // STUB-decoded
      height: Int, // STUB-decoded
      n_frames: Int) // STUB-decoded (1 for stills)

  /** ==== STUB ==== deterministic fake decoder: real implementations
    * would wrap an image/audio library here; per-partition init in
    * [[extractFeatures]] is where its native context would live.
    * Dimensions are md5-derived so outputs are stable and testable.
    */
  def decodeStub(kind: String, content: Array[Byte]): (Int, Int, Int) = {
    val d = MessageDigest.getInstance("MD5").digest(content)
    def u(i: Int): Int = d(i) & 0xff
    val w = 64 + (u(0) << 4 | u(1) >> 4) // 64..4159
    val h = 64 + (u(2) << 4 | u(3) >> 4)
    val frames = if (kind == "video") 1 + (u(4) << 8 | u(5)) % 240 else 1
    (w, h, frames)
  }

  private def hex(bytes: Array[Byte]): String =
    bytes.map(b => f"$b%02x").mkString

  /** Partition-batched feature extraction: decoder initialized once per
    * partition (mirroring mapInPandas batch shape), rows streamed.
    * Narrow operation — preserves the input partitioning.
    */
  def extractFeatures(media: Dataset[MediaFile]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition decoder/codec init would go here (STUB: none)
      val md = MessageDigest.getInstance("MD5")
      it.map { m =>
        val (w, h, f) = decodeStub(m.kind, m.content)
        md.reset()
        MediaFeatures(m.media_id, m.kind, m.content.length.toLong,
          hex(md.digest(m.content)), w, h, f)
      }
    }
  }

  case class ResizedMedia(
      media_id: Long, kind: String,
      width: Int, height: Int, // post-resize
      scale: Double)

  /** Resize plan: fit the STUB-decoded dimensions inside
    * `maxSide` x `maxSide` preserving aspect ratio (never upscale).
    * Pure per-row math — narrow; the real resampling kernel would run
    * inside [[extractFeatures]]'s partition loop next to the decoder.
    */
  def resizePlan(features: Dataset[MediaFeatures], maxSide: Int): Dataset[ResizedMedia] = {
    import features.sparkSession.implicits._
    features.map { f =>
      val s = math.min(1.0, maxSide.toDouble / math.max(f.width, f.height))
      ResizedMedia(f.media_id, f.kind,
        math.max(1, math.round(f.width * s).toInt),
        math.max(1, math.round(f.height * s).toInt), s)
    }
  }

  case class FrameSample(media_id: Long, frame_idx: Int)

  /** Frame sampling for video rows: every `everyK`-th frame index,
    * always including frame 0 — the generator (UDTF-shaped) side of the
    * media pipeline. Row-inflating: at scale, repartition before this
    * like every explode (SCALE.md), then decode sampled frames only.
    */
  def sampleFrames(features: Dataset[MediaFeatures], everyK: Int): Dataset[FrameSample] = {
    import features.sparkSession.implicits._
    features.filter(_.kind == "video")
      .flatMap(f => (0 until f.n_frames by everyK).map(FrameSample(f.media_id, _)))
  }

  /** Materialize a media table from `documents` (content := utf-8 text
    * bytes — stands in for real image/audio payloads).
    */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaFile] = {
    import docs.sparkSession.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        col("text").cast("binary").as("content"),
        col("source"))
      .as[MediaFile]
  }
}
