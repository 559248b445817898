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

  // ---- real container headers (first step off the decode stub) ----
  //
  // Instead of md5-derived fake dimensions, these build REAL format
  // containers — PNG (+APNG acTL for video), baseline JPEG, PCM WAV —
  // around the synthetic payload, and the decoder genuinely PARSES the
  // binary headers back (chunk walk + CRC for PNG, marker scan for
  // JPEG SOF, RIFF chunk walk for WAV). Only the pixel/sample payload
  // is synthetic; every header byte is to spec (PNG 1.2 / APNG, JFIF,
  // RIFF/WAVE), so `file`-style sniffers and header-level readers see
  // valid media. A real codec would slot in where the payload chunk is
  // decoded, with no change to the parsing or the Spark plumbing.

  /** JVM twin of [[graft.functions.PortableHash.h32]]: first 8 md5 hex
    * chars as an unsigned 32-bit value — identical to the Spark column
    * and the DuckDB oracle fragment, so header fields derived here are
    * SQL-recomputable.
    */
  private[graft] def h32jvm(s: String): Long = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be32(v: Int): Array[Byte] =
    Array((v >>> 24).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, (v >>> 24).toByte)
  private def rdBe32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def rdBe16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  private def rdLe32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def rdLe16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private val PngSig: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** One PNG chunk: length + type + data + CRC32(type||data) — the
    * real PNG CRC, so a spec-conforming chunk walker verifies clean.
    */
  private def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes(StandardCharsets.US_ASCII)
    val crc = new java.util.zip.CRC32
    crc.update(t); crc.update(data)
    be32(data.length) ++ t ++ data ++ be32(crc.getValue.toInt)
  }

  /** PNG 1.2 container; `frames` Some(n) adds an APNG acTL chunk
    * (8-byte data: num_frames, num_plays=0) making it an animated PNG.
    * Layout: sig, IHDR(13), [acTL(8)], IDAT(payload), IEND —
    * overhead 57 bytes, +20 with acTL.
    */
  def buildPng(w: Int, h: Int, frames: Option[Int], payload: Array[Byte]): Array[Byte] = {
    val ihdr = be32(w) ++ be32(h) ++
      Array[Byte](8, 0, 0, 0, 0) // bit depth 8, grayscale, default codecs
    PngSig ++ pngChunk("IHDR", ihdr) ++
      frames.map(n => pngChunk("acTL", be32(n) ++ be32(0)))
        .getOrElse(Array.empty[Byte]) ++
      pngChunk("IDAT", payload) ++ pngChunk("IEND", Array.empty)
  }

  /** Max bytes per JPEG COM segment (16-bit length includes itself). */
  private val JpegComMax = 60000

  /** Baseline JFIF JPEG: SOI, APP0(JFIF), SOF0 (1 component, which is
    * where height/width live), payload as COM segment(s), EOI.
    * Overhead: 35 + 4 per COM segment.
    */
  def buildJpeg(w: Int, h: Int, payload: Array[Byte]): Array[Byte] = {
    val app0 = Array[Byte](0xff.toByte, 0xe0.toByte) ++ be16(16) ++
      "JFIF\u0000".getBytes(StandardCharsets.US_ASCII) ++
      Array[Byte](1, 1, 0) ++ be16(1) ++ be16(1) ++ Array[Byte](0, 0)
    val sof0 = Array[Byte](0xff.toByte, 0xc0.toByte) ++ be16(11) ++
      Array[Byte](8) ++ be16(h) ++ be16(w) ++
      Array[Byte](1, 1, 0x11, 0) // 1 grayscale component, 1x1 sampling
    val coms = payload.grouped(JpegComMax).flatMap(seg =>
      Array[Byte](0xff.toByte, 0xfe.toByte) ++ be16(seg.length + 2) ++ seg).toArray
    Array[Byte](0xff.toByte, 0xd8.toByte) ++ app0 ++ sof0 ++
      coms ++ Array[Byte](0xff.toByte, 0xd9.toByte)
  }

  /** Canonical 44-byte-header PCM WAV: mono, 8-bit, 8 kHz — so
    * blockAlign=1 and the data chunk's byte length IS the sample-frame
    * count.
    */
  def buildWav(payload: Array[Byte]): Array[Byte] = {
    val fmt = "fmt ".getBytes(StandardCharsets.US_ASCII) ++ le32(16) ++
      le16(1) ++ le16(1) ++ le32(8000) ++ le32(8000) ++ le16(1) ++ le16(8)
    "RIFF".getBytes(StandardCharsets.US_ASCII) ++ le32(36 + payload.length) ++
      "WAVE".getBytes(StandardCharsets.US_ASCII) ++ fmt ++
      "data".getBytes(StandardCharsets.US_ASCII) ++ le32(payload.length) ++
      payload
  }

  // ---- real pixel payload (second step: the IDAT is no longer
  // synthetic bytes but a genuine zlib stream of filtered scanlines) --

  /** Deterministic pixel field p(i) = (seed + 31·i) mod 256 at raster
    * index i = y·w + x. 31 is coprime to 256, so every 256-pixel run
    * is a permutation of 0..255 — full dynamic range, and the DuckDB
    * oracle recomputes the exact same value per pixel from (seed, i).
    */
  def pixelAt(seed: Int, i: Long): Int = (((seed + 31L * i) % 256).toInt)

  /** Spec-valid zlib stream around `raw` using STORED deflate blocks:
    * 2-byte header (0x78 0x01 — (CMF·256+FLG) % 31 == 0), one 5-byte
    * stored-block header per ≤65535-byte block, then a REAL Adler-32.
    * Every inflater accepts it, and — unlike a compressed stream — its
    * length is closed-form (2 + 5·ceil(m/65535) + m + 4), so the
    * oracle can recompute container byte counts from first principles.
    */
  def zlibStored(raw: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(raw.length + 16)
    out.write(0x78); out.write(0x01)
    var off = 0
    do {
      val len = math.min(65535, raw.length - off)
      out.write(if (off + len >= raw.length) 1 else 0)
      out.write(len & 0xff); out.write((len >> 8) & 0xff)
      out.write(~len & 0xff); out.write((~len >> 8) & 0xff)
      out.write(raw, off, len)
      off += len
    } while (off < raw.length)
    val ad = new java.util.zip.Adler32
    ad.update(raw, 0, raw.length)
    out.write(be32(ad.getValue.toInt), 0, 4)
    out.toByteArray
  }

  /** Filtered scanline stream for the pixel field: row y carries PNG
    * filter y%3 (0 None, 1 Sub, 2 Up) — so a decoder only reproduces
    * the field by genuinely inverting all three filters in order, with
    * the spec's zero left/prior conventions at the edges.
    */
  def scanlines(w: Int, h: Int, seed: Int): Array[Byte] = {
    val raw = new Array[Byte](h * (w + 1))
    var o = 0
    var y = 0
    while (y < h) {
      val f = y % 3
      raw(o) = f.toByte; o += 1
      var x = 0
      while (x < w) {
        val i = y.toLong * w + x
        val p = pixelAt(seed, i)
        val enc = f match {
          case 0 => p
          case 1 => (p - (if (x == 0) 0 else pixelAt(seed, i - 1))) & 0xff
          case _ => (p - (if (y == 0) 0 else pixelAt(seed, i - w))) & 0xff
        }
        raw(o) = enc.toByte; o += 1; x += 1
      }
      y += 1
    }
    raw
  }

  /** PNG/APNG whose IDAT is the REAL zlib-wrapped filtered scanline
    * stream of the deterministic pixel field — a fully decodable
    * grayscale image, not a labeled stub.
    */
  def buildPngPixels(w: Int, h: Int, frames: Option[Int], seed: Int): Array[Byte] =
    buildPng(w, h, frames, zlibStored(scanlines(w, h, seed)))

  /** Concatenated IDAT chunk data (the spec allows splitting the zlib
    * stream across chunks; decode must join before inflating).
    */
  def idatOf(bytes: Array[Byte]): Array[Byte] = {
    if (bytes.length < 8 || !bytes.take(8).sameElements(PngSig))
      throw new IllegalArgumentException("not a PNG")
    val out = new java.io.ByteArrayOutputStream()
    var off = 8
    while (off + 12 <= bytes.length) {
      val len = rdBe32(bytes, off).toInt
      if (len < 0 || off + 12L + len > bytes.length)
        throw new IllegalArgumentException(
          s"PNG chunk at $off claims $len data bytes past end of file")
      if (new String(bytes, off + 4, 4, StandardCharsets.US_ASCII) == "IDAT")
        out.write(bytes, off + 8, len)
      off += 12 + len
    }
    out.toByteArray
  }

  /** REAL inflate via java.util.zip.Inflater — the exact decoder any
    * PNG reader runs; truncated or overlong streams fail loudly.
    */
  def inflate(z: Array[Byte], expected: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    // end() in finally: the error paths are the NORMAL mode for a
    // corpus containing corrupt media, and each leaked Inflater holds
    // native zlib buffers until GC — a long-lived executor decoding
    // bad files must not accumulate off-heap memory between GCs
    try {
      inf.setInput(z)
      val out = new Array[Byte](expected)
      val probe = new Array[Byte](1)
      var n = 0
      while (!inf.finished()) {
        // once `expected` bytes are out, keep driving with a 1-byte
        // probe so the inflater consumes the final block header and
        // Adler trailer (an empty image never enters the first branch
        // at all) — a probe byte actually ARRIVING means the stream is
        // overlong, not finished
        val k =
          if (n < expected) inf.inflate(out, n, expected - n)
          else inf.inflate(probe)
        if (n >= expected && k > 0)
          throw new IllegalArgumentException(
            s"zlib stream decodes past the expected $expected bytes")
        if (k == 0 && !inf.finished()) {
          if (inf.needsInput())
            throw new IllegalArgumentException(
              s"zlib stream truncated: got $n of $expected bytes")
          if (inf.needsDictionary())
            throw new IllegalArgumentException("zlib stream wants a preset dictionary")
        }
        n += k
      }
      if (n != expected)
        throw new IllegalArgumentException(
          s"zlib stream decodes to $n bytes, expected $expected")
      out
    } finally inf.end()
  }

  /** Decoded-pixel statistics: the positional checksum px_wsum =
    * Σ(i+1)·p(i) pins every pixel's VALUE AND POSITION — any filter
    * inversion or raster-order mistake shifts it.
    */
  case class PixelStats(
      media_id: Long, container: String, width: Int, height: Int,
      n_pixels: Long, px_sum: Long, px_wsum: Long,
      px_min: Int, px_max: Int)

  /** Invert the scanline filters (None/Sub/Up per the PNG spec, zero
    * conventions at the left/top edges) and fold pixel statistics in
    * one pass. `raw` is the inflated filter-byte + pixel stream.
    */
  def defilterStats(raw: Array[Byte], w: Int, h: Int): (Long, Long, Int, Int) = {
    require(raw.length == h * (w + 1),
      s"scanline stream is ${raw.length} bytes, expected ${h * (w + 1)}")
    val prev = new Array[Int](w)
    var sum = 0L; var wsum = 0L; var mn = 255; var mx = 0
    var o = 0
    var y = 0
    while (y < h) {
      val f = raw(o) & 0xff; o += 1
      var left = 0
      var x = 0
      while (x < w) {
        val b = raw(o) & 0xff; o += 1
        val p = f match {
          case 0 => b
          case 1 => (b + left) & 0xff
          case 2 => (b + prev(x)) & 0xff
          case _ => throw new IllegalArgumentException(s"unsupported PNG filter $f")
        }
        left = p; prev(x) = p
        sum += p
        wsum += (y.toLong * w + x + 1) * p
        if (p < mn) mn = p
        if (p > mx) mx = p
        x += 1
      }
      y += 1
    }
    (sum, wsum, mn, mx)
  }

  case class AHash(media_id: Long, width: Int, height: Int,
                   ahash: String, bits_on: Long)

  /** Average-hash perceptual fingerprint over the DECODED raster —
    * the classic image-dedup primitive: the image folds onto an 8×8
    * grid of cell means (cell of pixel (x,y) is (⌊8y/h⌋, ⌊8x/w⌋)),
    * each cell turns into one bit by comparing against the global
    * mean, and near-duplicate images land at small Hamming distance.
    * EXACT everywhere: the mean comparison cs/cn > S/N is evaluated
    * as the integer cross product cs·N > S·cn (no doubles, no
    * rounding edge), and the fingerprint ships as a 64-char '0'/'1'
    * string in (v,u) order — trivially SQL-recomputable and
    * readability-friendly. Narrow map-side decode like every media
    * stage; at 100 TB the fingerprints then feed the same banded /
    * bucketed dedup machinery the text path uses.
    */
  def ahashOf(px: Array[Int], w: Int, h: Int): (String, Long) = {
    val cs = new Array[Long](64)
    val cn = new Array[Long](64)
    var y = 0
    while (y < h) {
      val v = y * 8 / h
      var x = 0
      while (x < w) {
        val cell = v * 8 + x * 8 / w
        cs(cell) += px(y * w + x)
        cn(cell) += 1
        x += 1
      }
      y += 1
    }
    var s = 0L
    var i = 0
    while (i < 64) { s += cs(i); i += 1 }
    val n = w.toLong * h
    val sb = new java.lang.StringBuilder(64)
    var on = 0L
    i = 0
    while (i < 64) {
      // cell mean > global mean, exactly: cs/cn > S/N <=> cs·N > S·cn
      val bit = cs(i) * n > s * cn(i)
      sb.append(if (bit) '1' else '0')
      if (bit) on += 1
      i += 1
    }
    (sb.toString, on)
  }

  /** Fingerprint PNG/APNG media through the full real decode. */
  def decodeAHash(media: Dataset[MediaFile]): Dataset[AHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val hd = parseHeader(m.content)
        val px = defilterPixels(
          inflate(idatOf(m.content), hd.height * (hd.width + 1)),
          hd.width, hd.height)
        val (hash, on) = ahashOf(px, hd.width, hd.height)
        AHash(m.media_id, hd.width, hd.height, hash, on)
      }
    }
  }

  /** Invert the scanline filters into an actual pixel buffer (raster
    * order) — the decode-to-memory path the resampling kernel needs,
    * sharing the filter semantics of [[defilterStats]].
    */
  def defilterPixels(raw: Array[Byte], w: Int, h: Int): Array[Int] = {
    require(raw.length == h * (w + 1),
      s"scanline stream is ${raw.length} bytes, expected ${h * (w + 1)}")
    val px = new Array[Int](w * h)
    var o = 0
    var y = 0
    while (y < h) {
      val f = raw(o) & 0xff; o += 1
      var x = 0
      while (x < w) {
        val b = raw(o) & 0xff; o += 1
        val p = f match {
          case 0 => b
          case 1 => (b + (if (x == 0) 0 else px(y * w + x - 1))) & 0xff
          case 2 => (b + (if (y == 0) 0 else px((y - 1) * w + x))) & 0xff
          case _ => throw new IllegalArgumentException(s"unsupported PNG filter $f")
        }
        px(y * w + x) = p
        x += 1
      }
      y += 1
    }
    px
  }

  case class PooledStats(
      media_id: Long, width: Int, height: Int, out_w: Int, out_h: Int,
      pooled_sum: Long, pooled_wsum: Long)

  /** REAL resampling kernel over REAL decoded pixels: 2×2 box-filter
    * (mean-pool, floor division) downsample — the simplest genuine
    * image resize, run where the bytes live (mapPartitions, narrow).
    * The positional checksum pooled_wsum = Σ(j+1)·q(j) over the OUTPUT
    * raster pins the pooled value and position of every output pixel,
    * so a tap offset or raster-order mistake in the kernel diverges
    * the oracle hash. Odd trailing rows/columns drop (floor output
    * dims), matching the oracle's closed-form tap indices.
    */
  def downsample2x2Stats(media: Dataset[MediaFile]): Dataset[PooledStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val hd = parseHeader(m.content)
        val px = defilterPixels(
          inflate(idatOf(m.content), hd.height * (hd.width + 1)),
          hd.width, hd.height)
        val w = hd.width
        val ow = w / 2; val oh = hd.height / 2
        var sum = 0L; var wsum = 0L
        var v = 0
        while (v < oh) {
          var u = 0
          while (u < ow) {
            val q = (px(2 * v * w + 2 * u) + px(2 * v * w + 2 * u + 1)
              + px((2 * v + 1) * w + 2 * u) + px((2 * v + 1) * w + 2 * u + 1)) / 4
            sum += q
            wsum += (v.toLong * ow + u + 1) * q
            u += 1
          }
          v += 1
        }
        PooledStats(m.media_id, hd.width, hd.height, ow, oh, sum, wsum)
      }
    }
  }

  /** Full pixel decode over PNG/APNG media: header parse (CRC walk),
    * IDAT join, REAL zlib inflate, filter inversion, statistics — the
    * partition-batched decode stage a real image pipeline runs, minus
    * nothing.
    */
  def decodePixelStats(media: Dataset[MediaFile]): Dataset[PixelStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val hd = parseHeader(m.content)
        if (hd.container != "png" && hd.container != "apng")
          throw new IllegalArgumentException(
            s"pixel decode over non-PNG container ${hd.container}")
        val raw = inflate(idatOf(m.content), hd.height * (hd.width + 1))
        val (sum, wsum, mn, mx) = defilterStats(raw, hd.width, hd.height)
        PixelStats(m.media_id, hd.container, hd.width, hd.height,
          hd.width.toLong * hd.height, sum, wsum, mn, mx)
      }
    }
  }

  /** Spec-valid MULTI-FRAME APNG: acTL num_frames matches the actual
    * frame count, frame 0 rides in IDAT after its fcTL (sequence 0),
    * every later frame is fcTL (seq 2f−1) + one fdAT (seq 2f) whose
    * data after the sequence number is that frame's complete zlib
    * scanline stream — per the APNG spec frames compress
    * independently. All control fields (offsets 0, delay 1/10,
    * dispose/blend NONE) are written to spec, so an APNG-aware
    * renderer would genuinely animate these bytes. Frame f's pixel
    * field uses seed_f = (seed + 7f) mod 256.
    */
  def buildApngFrames(w: Int, h: Int, seed: Int, frames: Int): Array[Byte] = {
    require(frames >= 1)
    val ihdr = be32(w) ++ be32(h) ++ Array[Byte](8, 0, 0, 0, 0)
    def fctl(seq: Int): Array[Byte] =
      pngChunk("fcTL", be32(seq) ++ be32(w) ++ be32(h) ++ be32(0) ++ be32(0) ++
        be16(1) ++ be16(10) ++ Array[Byte](0, 0))
    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSig, 0, PngSig.length)
    def put(b: Array[Byte]): Unit = out.write(b, 0, b.length)
    put(pngChunk("IHDR", ihdr))
    put(pngChunk("acTL", be32(frames) ++ be32(0)))
    put(fctl(0))
    put(pngChunk("IDAT", zlibStored(scanlines(w, h, seed))))
    var f = 1
    while (f < frames) {
      put(fctl(2 * f - 1))
      put(pngChunk("fdAT", be32(2 * f) ++
        zlibStored(scanlines(w, h, (seed + 7 * f) % 256))))
      f += 1
    }
    put(pngChunk("IEND", Array.empty))
    out.toByteArray
  }

  /** Video media with REAL frame payloads: 2..8 frames per doc,
    * dims ≤ 127 a side so the whole clip stays small. The h32
    * dim/seed rules are the ones the frame oracle recomputes.
    */
  def videoFrameMedia(docs: DataFrame): Dataset[MediaFile] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text"), col("source"))
      .as[(Long, String, String)]
      .map { case (id, text, source) =>
        val w = (16 + h32jvm(text) % 112).toInt
        val h = (16 + h32jvm("1|" + text) % 112).toInt
        val seed = (h32jvm(text) % 256).toInt
        val frames = (2 + h32jvm("2|" + text) % 7).toInt
        MediaFile(id, "video", buildApngFrames(w, h, seed, frames), source)
      }
  }

  case class FrameStats(
      media_id: Long, frame: Int, n_pixels: Long,
      px_sum: Long, diff_prev: Option[Long])

  /** REAL per-frame video decode: walk the APNG chunks (CRC-checked
    * via [[parseHeader]] first), collect IDAT (frame 0) and each
    * fdAT's zlib stream, VALIDATE the fcTL/fdAT sequence numbering
    * (strictly increasing, fdAT = fcTL+1 per frame — a real decoder
    * must, and a reordered chunk fails loudly), inflate + defilter
    * every frame, and fold per-frame sums plus the inter-frame
    * absolute-delta energy — the scene-cut / motion primitive a
    * video curation pass runs first.
    */
  /** The per-frame zlib streams of a multi-frame APNG, in frame
    * order: the (possibly chunk-split, spec-legal) IDAT concatenation
    * is frame 0, each later frame is its fdAT chunks' post-sequence-
    * number data concatenated. VALIDATES, before any inflate: chunk
    * lengths stay in-bounds, sequence numbers strictly increase, and
    * the spec's fcTL/fdAT PAIRING — a frame's first fdAT must carry
    * exactly its fcTL's sequence + 1, and later fdATs of the same
    * frame continue consecutively. A reordered chunk, a gap in the
    * numbering, or a frame-count lie fails loudly.
    */
  def frameStreamsOf(bytes: Array[Byte], declaredFrames: Int): Seq[Array[Byte]] = {
    val streams = scala.collection.mutable.ArrayBuffer
      .empty[java.io.ByteArrayOutputStream]
    val idat = new java.io.ByteArrayOutputStream()
    var sawIdat = false
    var lastSeq = -1
    var off = 8
    while (off + 12 <= bytes.length) {
      val len = rdBe32(bytes, off).toInt
      if (len < 0 || off + 12L + len > bytes.length)
        throw new IllegalArgumentException(
          s"PNG chunk at $off claims $len data bytes past end of file")
      val typ = new String(bytes, off + 4, 4, StandardCharsets.US_ASCII)
      typ match {
        case "IDAT" =>
          idat.write(bytes, off + 8, len)
          sawIdat = true
        case "fcTL" =>
          if (len < 4) throw new IllegalArgumentException(
            s"APNG fcTL needs a sequence number, chunk has $len bytes")
          val seq = rdBe32(bytes, off + 8).toInt
          if (seq <= lastSeq) throw new IllegalArgumentException(
            s"APNG sequence number $seq out of order after $lastSeq")
          lastSeq = seq
          if (sawIdat) streams += new java.io.ByteArrayOutputStream()
        case "fdAT" =>
          if (len < 4) throw new IllegalArgumentException(
            s"APNG fdAT needs a sequence number, chunk has $len bytes")
          val seq = rdBe32(bytes, off + 8).toInt
          // pairing per the APNG spec: a frame's first fdAT is its
          // fcTL's sequence + 1; continuation fdATs stay consecutive
          if (seq != lastSeq + 1) throw new IllegalArgumentException(
            s"APNG fdAT sequence $seq does not follow $lastSeq " +
              s"(fcTL/fdAT pairing broken)")
          if (streams.isEmpty)
            throw new IllegalArgumentException("APNG fdAT before any fcTL")
          lastSeq = seq
          streams.last.write(bytes, off + 12, len - 4)
        case _ => ()
      }
      off += 12 + len
    }
    if (!sawIdat) throw new IllegalArgumentException("APNG without IDAT")
    val all = idat.toByteArray +: streams.map(_.toByteArray).toSeq
    if (all.length != declaredFrames) throw new IllegalArgumentException(
      s"acTL declares $declaredFrames frames, found ${all.length}")
    all
  }

  def decodeVideoFrames(media: Dataset[MediaFile]): Dataset[FrameStats] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val hd = parseHeader(m.content) // CRC walk + dims + acTL count
      val all = frameStreamsOf(m.content, hd.nFrames)
      val n = hd.width.toLong * hd.height
      var prev: Array[Int] = null
      all.zipWithIndex.map { case (z, f) =>
        val px = defilterPixels(
          inflate(z, hd.height * (hd.width + 1)), hd.width, hd.height)
        var sum = 0L; var diff = 0L
        var i = 0
        while (i < px.length) {
          sum += px(i)
          if (prev != null) diff += math.abs(px(i) - prev(i))
          i += 1
        }
        val out = FrameStats(m.media_id, f, n, sum,
          if (prev == null) None else Some(diff))
        prev = px
        out
      }
    }
  }

  /** JPEG media with REAL entropy-coded pixels ([[JpegCodec]]): one
    * even value per 8×8 block from the deterministic rule
    * v(b) = 2·((seed + 31·b) mod 128), b = by·bw + bx — flat blocks
    * are the content class the baseline DCT path represents
    * losslessly, so the full encode (Huffman + DC prediction + byte
    * stuffing) → decode (Huffman + dequant + IDCT) round trip is
    * exact and a SQL oracle predicts every decoded pixel. Dims are
    * multiples of 8 (16..248 per side).
    */
  def jpegPixelMedia(docs: DataFrame): Dataset[MediaFile] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text"), col("source"))
      .as[(Long, String, String)]
      .map { case (id, text, source) =>
        val w = (8 * (2 + h32jvm(text) % 30)).toInt
        val h = (8 * (2 + h32jvm("1|" + text) % 30)).toInt
        val seed = (h32jvm(text) % 128).toInt
        val bw = w / 8
        val blocks = Array.tabulate(h / 8, bw) { (by, bx) =>
          2 * ((seed + 31 * (by * bw + bx)) % 128)
        }
        MediaFile(id, "image", JpegCodec.encodeFlatBlocks(w, h, blocks), source)
      }
  }

  /** JPEG media whose scans carry NONZERO AC COEFFICIENTS — the
    * content class that exercises the decoder's full AC alphabet
    * (run/size symbols with nonzero runs, ZRL, AC EXTEND for negative
    * levels) under an exact pixel oracle. Each 8×8 block gets three
    * quantized coefficients chosen so dequant+IDCT is EXACT integer
    * arithmetic:
    *
    *  - DC level (v−128)/2 with v = 2·((seed+31·b) mod 128) — the
    *    flat-block rule; contributes v to every pixel.
    *  - zigzag 14 = natural (v=0,u=4), quantizer 24, level l1 with
    *    |l1| ∈ 1..4: basis cos((2x+1)π/4) = (√2/2)·sx with the sign
    *    wave sx = +1 for x mod 4 ∈ {0,3}, −1 otherwise, and
    *    cu·cv = √2/2, so the pixel term is 24·l1·(1/2)·sx/4 = 3·l1·sx
    *    — exact for any integer l1.
    *  - zigzag 39 = natural (4,4), quantizer 68, level 2·m with
    *    |m| ∈ 1..3: both basis factors are (√2/2)·s, cu=cv=1, so the
    *    term is 68·2m·(1/2)·sx·sy/4 = 17·m·sx·sy — exact because the
    *    level is even.
    *
    * Decoded pixel = clamp(v + 3·l1·sx + 17·m·sx·sy): a closed form a
    * SQL oracle evaluates per pixel (jpeg_ac_stats), while the engine
    * only gets there through the genuine Huffman scan — runs of 13
    * and 8 zeros, one ZRL per block, EXTEND on every negative level.
    * Level rules (all mods of non-negative operands, so both engines
    * agree): l1 = (1+(seed+7b) mod 4)·sgn₁, sgn₁ = +1 iff (seed+3b)
    * even; m = (1+(seed+5b) mod 3)·sgn₂, sgn₂ = +1 iff (seed+11b)
    * even. Dims are multiples of 8 (16..120 per side) to keep the
    * oracle's per-pixel explode bounded.
    */
  def jpegAcMedia(docs: DataFrame): Dataset[MediaFile] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text"), col("source"))
      .as[(Long, String, String)]
      .map { case (id, text, source) =>
        val w = (8 * (2 + h32jvm(text) % 14)).toInt
        val h = (8 * (2 + h32jvm("1|" + text) % 14)).toInt
        val seed = (h32jvm(text) % 128).toInt
        val bw = w / 8
        val dcq = Array.tabulate(h / 8, bw) { (by, bx) =>
          ((seed + 31 * (by * bw + bx)) % 128) - 64
        }
        val ac = Array.tabulate(h / 8, bw) { (by, bx) =>
          val b = by * bw + bx
          val l1 = (1 + (seed + 7 * b) % 4) *
            (if ((seed + 3 * b) % 2 == 0) 1 else -1)
          val m = (1 + (seed + 5 * b) % 3) *
            (if ((seed + 11 * b) % 2 == 0) 1 else -1)
          Seq((14, l1), (39, 2 * m))
        }
        MediaFile(id, "image", JpegCodec.encodeBlocks(w, h, dcq, ac), source)
      }
  }

  /** Pixel statistics from a REAL JPEG decode — generic over the
    * decoded raster (the decoder does not know the content is flat);
    * the positional checksum pins every pixel like the PNG path.
    */
  def decodeJpegStats(media: Dataset[MediaFile]): Dataset[PixelStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val d = JpegCodec.decode(m.content)
        var sum = 0L; var wsum = 0L; var mn = 255; var mx = 0
        var i = 0
        while (i < d.pixels.length) {
          val p = d.pixels(i)
          sum += p; wsum += (i + 1L) * p
          if (p < mn) mn = p
          if (p > mx) mx = p
          i += 1
        }
        PixelStats(m.media_id, "jpeg", d.w, d.h,
          d.w.toLong * d.h, sum, wsum, mn, mx)
      }
    }
  }

  /** Parsed header fields. `container` is what the BYTES say (png/
    * apng/jpeg/wav), independent of the envelope `kind` column.
    */
  case class MediaHeader(container: String, width: Int, height: Int, nFrames: Int)

  /** Parse real container headers: PNG chunk walk (CRC-checked, acTL
    * aware), JPEG marker scan to SOF, RIFF/WAVE chunk walk. Throws on
    * unrecognized or corrupt bytes — a decode stage must fail loudly,
    * not emit plausible zeros.
    */
  def parseHeader(bytes: Array[Byte]): MediaHeader = {
    if (bytes.length >= 8 && bytes.take(8).sameElements(PngSig)) {
      var off = 8
      var w = -1; var h = -1; var frames = 1; var animated = false
      while (off + 12 <= bytes.length) {
        val len = rdBe32(bytes, off).toInt
        // a corrupted length field must be a loud truncation error,
        // not an out-of-bounds read from inside the CRC check
        if (len < 0 || off + 12L + len > bytes.length)
          throw new IllegalArgumentException(
            s"PNG chunk at $off claims $len data bytes past end of file")
        val typ = new String(bytes, off + 4, 4, StandardCharsets.US_ASCII)
        val crc = new java.util.zip.CRC32
        crc.update(bytes, off + 4, 4 + len)
        if (crc.getValue != rdBe32(bytes, off + 8 + len))
          throw new IllegalArgumentException(s"PNG chunk $typ fails CRC")
        // field reads are offsets INTO the chunk data: a too-short
        // (even CRC-valid) chunk must fail loudly, not read the CRC
        // or the next chunk as a dimension
        typ match {
          case "IHDR" =>
            if (len < 13) throw new IllegalArgumentException(
              s"PNG IHDR needs 13 data bytes, chunk has $len")
            w = rdBe32(bytes, off + 8).toInt
            h = rdBe32(bytes, off + 12).toInt
          case "acTL" =>
            if (len < 8) throw new IllegalArgumentException(
              s"PNG acTL needs 8 data bytes, chunk has $len")
            animated = true
            frames = rdBe32(bytes, off + 8).toInt
          case _ => ()
        }
        off += 12 + len
      }
      if (w < 0) throw new IllegalArgumentException("PNG without IHDR")
      MediaHeader(if (animated) "apng" else "png", w, h, frames)
    } else if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xff
        && (bytes(1) & 0xff) == 0xd8) {
      var off = 2
      while (off + 4 <= bytes.length) {
        if ((bytes(off) & 0xff) != 0xff)
          throw new IllegalArgumentException(
            f"JPEG marker expected at $off, got 0x${bytes(off) & 0xff}%02x")
        val marker = bytes(off + 1) & 0xff
        // SOF0..SOF15 carry the frame header; C4/C8/CC are not SOFs
        if (marker >= 0xc0 && marker <= 0xcf
            && marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          if (off + 9 > bytes.length)
            throw new IllegalArgumentException("JPEG SOF segment truncated")
          return MediaHeader("jpeg",
            rdBe16(bytes, off + 7), rdBe16(bytes, off + 5), 1)
        }
        val segLen = rdBe16(bytes, off + 2)
        // a segment length below 2 (the length field includes itself)
        // cannot advance the scan — corrupt, not an infinite loop
        if (segLen < 2) throw new IllegalArgumentException(
          f"JPEG segment at $off has impossible length $segLen")
        off += 2 + segLen
      }
      throw new IllegalArgumentException("JPEG without SOF marker")
    } else if (bytes.length >= 12
        && new String(bytes, 0, 4, StandardCharsets.US_ASCII) == "RIFF"
        && new String(bytes, 8, 4, StandardCharsets.US_ASCII) == "WAVE") {
      var off = 12
      var blockAlign = -1; var dataLen = -1L
      while (off + 8 <= bytes.length) {
        val id = new String(bytes, off, 4, StandardCharsets.US_ASCII)
        val len = rdLe32(bytes, off + 4)
        if (len < 0 || off + 8 + len > bytes.length)
          throw new IllegalArgumentException(
            s"RIFF chunk '$id' at $off claims $len bytes past end of file")
        if (id == "fmt ") {
          // blockAlign sits at data offset 12..13 — a shorter fmt
          // chunk passed the length guard but lacks the field
          if (len < 14) throw new IllegalArgumentException(
            s"WAVE fmt chunk needs 14 data bytes, has $len")
          blockAlign = rdLe16(bytes, off + 20)
        }
        if (id == "data") dataLen = len
        off += 8 + len.toInt + (len.toInt & 1) // RIFF chunks pad to even
      }
      if (blockAlign <= 0 || dataLen < 0)
        throw new IllegalArgumentException("WAVE without fmt/data chunks")
      MediaHeader("wav", 0, 0, (dataLen / blockAlign).toInt)
    } else throw new IllegalArgumentException(
      s"unrecognized container (${bytes.take(4).map(b => f"$b%02x").mkString(" ")} ...)")
  }

  /** Media table with REAL containers: images alternate PNG/JPEG by
    * doc parity, audio is PCM WAV, video is APNG. Dimensions/frames
    * are the h32 rules the metadata queries already use — embedded
    * into the binary headers here, parsed back out by
    * [[decodeContainers]], recomputed from first principles by the
    * DuckDB oracle: a single mis-encoded or mis-parsed byte diverges
    * the hash check.
    *
    * PNG/APNG rows carry a REAL zlib scanline stream of the
    * deterministic pixel field ([[buildPngPixels]]) — fully decodable
    * images, with the seed = h32(text) mod 256 rule the pixel oracle
    * recomputes. Dimensions are 16 + h32 % 240 (≤255 per side) so the
    * per-image pixel mass stays ≤64 KB: one stored zlib block, and a
    * corpus of raster data the sf0.01 oracle can explode per-pixel.
    * JPEG rows here INTENTIONALLY keep the text payload in COM
    * segments — this table's contract is header-parse + closed-form
    * n_bytes (a Huffman bitstream's length is not SQL-predictable);
    * the real entropy-coded JPEG variant lives in [[jpegPixelMedia]]
    * (via [[JpegCodec]]) and is what jpeg_pixel_stats decodes. WAV
    * payloads are the real PCM bytes the audio queries decode.
    *
    * Video rows are HEADER-LEVEL APNG only: the acTL declares the
    * h32-derived frame count (up to 240) but the file carries a
    * single IDAT raster and no fcTL/fdAT chunks — decodable by
    * [[decodePixelStats]] (which reads the default image) and by
    * [[decodeContainers]] (which reads acTL), but deliberately NOT by
    * [[frameStreamsOf]], whose frame-count cross-check would reject
    * them. This table's contract is header-parse + closed-form
    * n_bytes (emitting 240 real frames would make n_bytes
    * frame-mass-dependent and blow the per-row byte budget); the
    * spec-complete multi-frame APNGs that [[decodeVideoFrames]]
    * consumes live in [[videoFrameMedia]].
    */
  /** media_id offset of a planted near-duplicate re-encode. */
  val NearDupOffset = 10000000L

  /** The IMAGE-DEDUP corpus: the image_ahash subset's PNG containers
    * (same dim/seed rules as [[mediaContainers]]) PLUS, for docs with
    * doc_id % 12 == 0, a planted NEAR-DUPLICATE re-encode — the same
    * raster shifted one intensity step (seed+1: every pixel +1 mod
    * 256, the brightness-nudge / re-encode class of image near-dup),
    * at media_id = doc_id + [[NearDupOffset]]. The pair (original,
    * re-encode) is what perceptual-hash dedup exists to catch: bytes
    * differ, ahash lands a small Hamming distance away. Same
    * deterministic (text-derived) construction in the DuckDB oracle.
    */
  def nearDupImageContainers(docs: DataFrame): Dataset[MediaFile] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text"), col("source"))
      .as[(Long, String, String)]
      .flatMap { case (id, text, source) =>
        val w = (16 + h32jvm(text) % 240).toInt
        val h = (16 + h32jvm("1|" + text) % 240).toInt
        val seed = (h32jvm(text) % 256).toInt
        val frames =
          if (id % 3 == 2) Some((1 + h32jvm("2|" + text) % 240).toInt)
          else None
        val base = MediaFile(id, "image", buildPngPixels(w, h, frames, seed),
          source)
        if (id % 12 == 0)
          Seq(base, MediaFile(id + NearDupOffset, "image",
            buildPngPixels(w, h, None, (seed + 1) % 256), source))
        else Seq(base)
      }
  }

  /** PCM sample series of a document's text: codepoint mod 256 per
    * character — the cross-engine-stable byte rule (DuckDB `ord()` and
    * JVM codepoints agree for ANY text; raw utf-8 bytes would diverge
    * from the oracle's character indexing on non-ASCII). Identical to
    * the utf-8 byte stream on the ASCII fixture.
    */
  def codepointSamples(text: String): Array[Byte] = {
    val cps = text.codePoints().toArray
    cps.map(cp => (((cp % 256) + 256) % 256).toByte)
  }

  /** The AUDIO-DEDUP corpus: the audio subset's WAV containers (real
    * RIFF/WAVE, PCM = the codepoint sample rule) PLUS, for docs with
    * doc_id % 12 == 7, a planted NEAR-DUPLICATE re-encode — every
    * sample +1 mod 256 (the DC-offset / gain-nudge class of audio
    * near-dup, the WAV analog of the image corpus's seed+1 raster) at
    * media_id = doc_id + [[NearDupOffset]]. Docs shorter than 256
    * chars are excluded by the CALLER's filter (the 64-segment
    * fingerprint needs ≥4 samples per segment). Same deterministic
    * construction in the DuckDB oracle.
    */
  def nearDupWavContainers(docs: DataFrame): Dataset[MediaFile] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text"), col("source"))
      .as[(Long, String, String)]
      .flatMap { case (id, text, source) =>
        val pcm = codepointSamples(text)
        val base = MediaFile(id, "audio", buildWav(pcm), source)
        if (id % 12 == 7) {
          val nudged = pcm.map(b => (((b & 0xff) + 1) % 256).toByte)
          Seq(base, MediaFile(id + NearDupOffset, "audio",
            buildWav(nudged), source))
        } else Seq(base)
      }
  }

  /** The PCM payload of a WAV container: full RIFF/WAVE chunk walk
    * (the [[parseHeader]] discipline — loud failure on truncation or
    * missing chunks, never plausible zeros), returning the data
    * chunk's bytes.
    */
  def pcmOf(bytes: Array[Byte]): Array[Byte] = {
    if (bytes.length < 12
        || new String(bytes, 0, 4, StandardCharsets.US_ASCII) != "RIFF"
        || new String(bytes, 8, 4, StandardCharsets.US_ASCII) != "WAVE")
      throw new IllegalArgumentException("not a RIFF/WAVE container")
    var off = 12
    while (off + 8 <= bytes.length) {
      val id = new String(bytes, off, 4, StandardCharsets.US_ASCII)
      val len = rdLe32(bytes, off + 4)
      if (len < 0 || off + 8 + len > bytes.length)
        throw new IllegalArgumentException(
          s"RIFF chunk '$id' at $off claims $len bytes past end of file")
      if (id == "data")
        return java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + len.toInt)
      off += 8 + len.toInt + (len.toInt & 1) // RIFF chunks pad to even
    }
    throw new IllegalArgumentException("WAVE without data chunk")
  }

  case class AudioFp(media_id: Long, n_samples: Long, fp: String)

  /** 64-bit energy-envelope fingerprint of a PCM sample stream — the
    * audio analog of [[ahashOf]]: the stream folds onto 64 equal time
    * segments (segment of sample i is ⌊64·i/L⌋), each segment turns
    * into one bit by comparing its mean-square amplitude around the
    * unsigned-PCM midpoint against the whole clip's, and near-dup
    * encodes (gain/DC nudges, re-encodes) land at small Hamming
    * distance. EXACT everywhere: the comparison es/ns > E/L is the
    * integer cross product es·L > E·ns (no doubles), and the
    * fingerprint ships as a 64-char '0'/'1' string in segment order —
    * SQL-recomputable from the synthesis rule. At 100 TB the
    * fingerprints feed the same banded dedup machinery as text
    * MinHash and image ahash.
    */
  def audioFpOf(pcm: Array[Byte]): (Long, String) = {
    val L = pcm.length.toLong
    require(L >= 64, s"fingerprint needs >= 64 samples, got $L")
    val es = new Array[Long](64)
    var i = 0
    while (i < pcm.length) {
      val v = (pcm(i) & 0xff) - 128
      es((i * 64 / L).toInt) += v.toLong * v
      i += 1
    }
    var e = 0L
    var s = 0
    while (s < 64) { e += es(s); s += 1 }
    val sb = new java.lang.StringBuilder(64)
    s = 0
    while (s < 64) {
      // segment count ns = #samples with ⌊64 i / L⌋ = s — the preimage
      // is [⌈sL/64⌉, ⌈(s+1)L/64⌉), so the closed form uses CEILINGS
      val ns = ((s + 1) * L + 63) / 64 - (s * L + 63) / 64
      sb.append(if (es(s) * L > e * ns) '1' else '0')
      s += 1
    }
    (L, sb.toString)
  }

  /** Fingerprint WAV media through the full real container decode
    * (RIFF walk → data chunk → sample fold).
    */
  def decodeAudioFp(media: Dataset[MediaFile]): Dataset[AudioFp] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val (n, fp) = audioFpOf(pcmOf(m.content))
        AudioFp(m.media_id, n, fp)
      }
    }
  }

  def mediaContainers(docs: DataFrame): Dataset[MediaFile] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text"), col("source"))
      .as[(Long, String, String)]
      .map { case (id, text, source) =>
        val payload = text.getBytes(StandardCharsets.UTF_8)
        val w = (16 + h32jvm(text) % 240).toInt
        val h = (16 + h32jvm("1|" + text) % 240).toInt
        val seed = (h32jvm(text) % 256).toInt
        (id % 3) match {
          case 0 =>
            val bytes = if (id % 2 == 0) buildPngPixels(w, h, None, seed)
                        else buildJpeg(w, h, payload)
            MediaFile(id, "image", bytes, source)
          case 1 => MediaFile(id, "audio", buildWav(payload), source)
          case _ =>
            val frames = (1 + h32jvm("2|" + text) % 240).toInt
            MediaFile(id, "video", buildPngPixels(w, h, Some(frames), seed), source)
        }
      }
  }

  case class DecodedMedia(
      media_id: Long, kind: String, container: String,
      n_bytes: Long, width: Int, height: Int, n_frames: Int)

  /** Partition-batched header decode over real containers — the same
    * mapPartitions shape as [[extractFeatures]], but every field comes
    * from PARSING the binary header, not from hashing the payload.
    */
  def decodeContainers(media: Dataset[MediaFile]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val hd = parseHeader(m.content)
        DecodedMedia(m.media_id, m.kind, hd.container,
          m.content.length.toLong, hd.width, hd.height, hd.nFrames)
      }
    }
  }
}
