package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.ops.Multimodal._

/** Property-based checks of the container builders/parser — pure-JVM,
  * no Spark jobs per sample: every (dims, frames, payload) the
  * builders can produce must parse back exactly, with the documented
  * length formulas, for all four formats.
  */
object ContainerProps extends Properties("containers") {

  // PNG/JPEG dimension fields are 4/2-byte; the engine's h32 rules
  // stay far below both, so generate past the engine's range
  private val genDim: Gen[Int] = Gen.chooseNum(1, 65535)
  private val genFrames: Gen[Int] = Gen.chooseNum(1, 1 << 24)
  private val genPayload: Gen[Array[Byte]] =
    Gen.chooseNum(0, 2000).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray))

  property("png round trip + length formula") =
    forAll(genDim, genDim, genPayload) { (w, h, p) =>
      val bytes = buildPng(w, h, None, p)
      parseHeader(bytes) == MediaHeader("png", w, h, 1) &&
        bytes.length == 57 + p.length
    }

  property("apng round trip carries the acTL frame count") =
    forAll(genDim, genDim, genFrames, genPayload) { (w, h, f, p) =>
      val bytes = buildPng(w, h, Some(f), p)
      parseHeader(bytes) == MediaHeader("apng", w, h, f) &&
        bytes.length == 77 + p.length
    }

  property("jpeg round trip + segmented length formula") =
    forAll(genDim, genDim, genPayload) { (w, h, p) =>
      val bytes = buildJpeg(w, h, p)
      val segs = (p.length + 59999) / 60000
      parseHeader(bytes) == MediaHeader("jpeg", w, h, 1) &&
        bytes.length == 35 + 4 * segs + p.length
    }

  property("wav round trip: frames == payload bytes at mono 8-bit") =
    forAll(genPayload) { p =>
      val bytes = buildWav(p)
      parseHeader(bytes) == MediaHeader("wav", 0, 0, p.length) &&
        bytes.length == 44 + p.length
    }

  // ---- real pixel payload: zlib + scanline filters ----

  private val genSeed: Gen[Int] = Gen.chooseNum(0, 255)
  private val genPxDim: Gen[Int] = Gen.chooseNum(1, 300)
  private val genBig: Gen[Array[Byte]] =
    Gen.chooseNum(0, 200000).flatMap(n => Gen.const {
      // deterministic fill is fine — the property is the codec round
      // trip, and 200k crosses the 65535 stored-block boundary twice
      Array.tabulate[Byte](n)(i => ((i * 7 + n) & 0xff).toByte)
    })

  property("zlibStored round-trips through a real Inflater, any size") =
    forAll(genBig) { raw =>
      val blocks = math.max(1, (raw.length + 65534) / 65535)
      val z = zlibStored(raw)
      z.length == 2 + 5 * blocks + raw.length + 4 &&
        inflate(z, raw.length).sameElements(raw)
    }

  property("scanline filters invert exactly: decoded stats == field stats") =
    forAll(genPxDim, genPxDim, genSeed) { (w, h, seed) =>
      val raw = inflate(zlibStored(scanlines(w, h, seed)), h * (w + 1))
      val (sum, wsum, mn, mx) = defilterStats(raw, w, h)
      var esum = 0L; var ewsum = 0L; var emn = 255; var emx = 0
      var i = 0L
      val n = w.toLong * h
      while (i < n) {
        val p = pixelAt(seed, i)
        esum += p; ewsum += (i + 1) * p
        if (p < emn) emn = p
        if (p > emx) emx = p
        i += 1
      }
      sum == esum && wsum == ewsum && mn == emn && mx == emx
    }

  property("buildPngPixels is a fully decodable PNG: header + pixels") =
    forAll(genPxDim, genPxDim, genSeed) { (w, h, seed) =>
      val bytes = buildPngPixels(w, h, None, seed)
      val hd = parseHeader(bytes) // CRC-checked walk
      val raw = inflate(idatOf(bytes), h * (w + 1))
      val (sum, _, _, _) = defilterStats(raw, w, h)
      var esum = 0L
      var i = 0L
      while (i < w.toLong * h) { esum += pixelAt(seed, i); i += 1 }
      hd == MediaHeader("png", w, h, 1) && sum == esum
    }

  property("a truncated zlib stream fails loudly, never partial stats") =
    forAll(genPxDim, genPxDim, genSeed) { (w, h, seed) =>
      val z = zlibStored(scanlines(w, h, seed))
      val cut = z.take(z.length - 5)
      try { inflate(cut, h * (w + 1)); false }
      catch { case _: IllegalArgumentException => true }
    }

  property("multi-frame APNG round trip: every frame's pixels decode to the rule") =
    forAll(Gen.chooseNum(1, 64), Gen.chooseNum(1, 64), genSeed,
        Gen.chooseNum(1, 9)) { (w, h, seed, frames) =>
      val bytes = buildApngFrames(w, h, seed, frames)
      val hd = parseHeader(bytes)
      hd == MediaHeader("apng", w, h, frames) && {
        // decode each frame independently (IDAT + per-fdAT zlib) the
        // way decodeVideoFrames does, checking frame f's field
        (0 until frames).forall { f =>
          val sf = (seed + 7 * f) % 256
          val raw = inflate(zlibStored(scanlines(w, h, sf)), h * (w + 1))
          val (sum, _, _, _) = defilterStats(raw, w, h)
          var esum = 0L
          var i = 0L
          while (i < w.toLong * h) { esum += pixelAt(sf, i); i += 1 }
          sum == esum
        }
      }
    }

  property("an APNG with a reordered sequence number fails the frame decode") =
    forAll(Gen.chooseNum(8, 32), Gen.chooseNum(8, 32), genSeed) { (w, h, seed) =>
      val bytes = buildApngFrames(w, h, seed, 3)
      // find the SECOND fcTL (seq=1) and bump its stored sequence
      // above its fdAT's (seq=2): chunk CRC must be recomputed so the
      // failure is the SEQUENCE check, not the CRC
      var off = 8
      var found = -1
      var count = 0
      while (off + 12 <= bytes.length && found < 0) {
        val len = ((bytes(off) & 0xff) << 24) | ((bytes(off + 1) & 0xff) << 16) |
          ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
        val typ = new String(bytes, off + 4, 4, "US-ASCII")
        if (typ == "fcTL") { count += 1; if (count == 2) found = off }
        if (found < 0) off += 12 + len
      }
      val mut = bytes.clone()
      mut(found + 11) = 9 // seq 1 -> 9 (> its fdAT's 2)
      val crc = new java.util.zip.CRC32
      crc.update(mut, found + 4, 4 + 26)
      val c = crc.getValue.toInt
      mut(found + 8 + 26) = (c >>> 24).toByte
      mut(found + 9 + 26) = ((c >> 16) & 0xff).toByte
      mut(found + 10 + 26) = ((c >> 8) & 0xff).toByte
      mut(found + 11 + 26) = (c & 0xff).toByte
      try {
        // parseHeader passes (the CRC was recomputed); the production
        // frame walk must refuse on the sequence check
        parseHeader(mut)
        frameStreamsOf(mut, 3)
        false
      } catch { case _: IllegalArgumentException => true }
    }

  // ---- real JPEG entropy layer ----

  private val genBlocks: Gen[(Int, Int, Array[Array[Int]])] =
    for {
      bw <- Gen.chooseNum(1, 12)
      bh <- Gen.chooseNum(1, 12)
      seedB <- Gen.chooseNum(0, 1 << 20)
    } yield (bw * 8, bh * 8,
      // any even values 0..254, varying fast enough to cross every DC
      // category including sign flips between neighbors
      Array.tabulate(bh, bw)((by, bx) =>
        2 * ((seedB + 89 * (by * bw + bx)) % 128)))

  property("jpeg flat-block encode->decode round trip is exact") =
    forAll(genBlocks) { case (w, h, blocks) =>
      val d = graft.ops.JpegCodec.decode(
        graft.ops.JpegCodec.encodeFlatBlocks(w, h, blocks))
      d.w == w && d.h == h && {
        val bw = w / 8
        (0 until h).forall(y => (0 until w).forall(x =>
          d.pixels(y * w + x) == blocks(y / 8)(x / 8)))
      }
    }

  property("jpeg DC category/EXTEND is an involution on diffs") =
    forAll(Gen.chooseNum(-2047, 2047)) { diff =>
      import graft.ops.JpegCodec.{category, extend}
      val t = category(diff)
      val mag = if (diff < 0) diff + (1 << t) - 1 else diff
      (t == 0 && diff == 0) || extend(mag, t) == diff
    }

  property("a truncated jpeg entropy segment fails loudly") =
    forAll(genBlocks) { case (w, h, blocks) =>
      val bytes = graft.ops.JpegCodec.encodeFlatBlocks(w, h, blocks)
      val cut = bytes.take(bytes.length - 3) // into the entropy data
      try { graft.ops.JpegCodec.decode(cut); false }
      catch { case _: IllegalArgumentException => true }
    }

  // ---- cross-decoder validation: javax.imageio (an INDEPENDENT,
  // JDK-bundled implementation) must read the same pixels our codecs
  // produce/decode — proving the PNG zlib/filter streams and the JPEG
  // entropy bitstreams are spec-valid to a decoder that shares no
  // code with this repo, not merely self-round-trip-consistent. ----

  /** Decode any image bytes through javax.imageio into (w, h, gray
    * samples in raster order). Fails the property loudly (null read)
    * if ImageIO rejects the stream.
    */
  private def imageIoGray(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, "ImageIO rejected the stream")
    val w = img.getWidth; val h = img.getHeight
    val px = new Array[Int](w * h)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { px(y * w + x) = raster.getSample(x, y, 0); x += 1 }
      y += 1
    }
    (w, h, px)
  }

  private val genIoDim: Gen[Int] = Gen.chooseNum(1, 128)

  property("ImageIO cross-decodes buildPngPixels to the exact pixel field") =
    forAll(genIoDim, genIoDim, genSeed) { (w, h, seed) =>
      val (dw, dh, px) = imageIoGray(buildPngPixels(w, h, None, seed))
      dw == w && dh == h && {
        var i = 0L; var ok = true
        while (ok && i < w.toLong * h) {
          ok = px(i.toInt) == pixelAt(seed, i); i += 1
        }
        ok
      }
    }

  property("ImageIO reads the header-level APNG's default image (acTL ignored)") =
    forAll(Gen.chooseNum(8, 64), Gen.chooseNum(8, 64), genSeed,
        Gen.chooseNum(2, 240)) { (w, h, seed, frames) =>
      // mediaContainers' video rows: acTL declares N frames, one IDAT
      // raster — a PNG reader ignores the unknown acTL chunk and
      // decodes the default image
      val (dw, dh, px) = imageIoGray(buildPngPixels(w, h, Some(frames), seed))
      dw == w && dh == h && px(0) == pixelAt(seed, 0) &&
        px(px.length - 1) == pixelAt(seed, w.toLong * h - 1)
    }

  property("ImageIO cross-decodes flat-block JPEG pixel-identically") =
    forAll(genBlocks) { case (w, h, blocks) =>
      val bytes = graft.ops.JpegCodec.encodeFlatBlocks(w, h, blocks)
      val ours = graft.ops.JpegCodec.decode(bytes)
      val (dw, dh, px) = imageIoGray(bytes)
      // DC-only blocks dequantize to exactly flat rasters in ANY
      // conforming IDCT (including ImageIO's fixed-point one), so the
      // cross-decoder compare is EXACT here
      dw == w && dh == h && px.sameElements(ours.pixels)
    }

  /** The jpegAcMedia coefficient rules, reproduced for a given block
    * index — kept in lockstep with Multimodal.jpegAcMedia.
    */
  private def acLevels(seed: Int, b: Int): (Int, Int, Int) = {
    val v = 2 * ((seed + 31 * b) % 128)
    val l1 = (1 + (seed + 7 * b) % 4) * (if ((seed + 3 * b) % 2 == 0) 1 else -1)
    val m = (1 + (seed + 5 * b) % 3) * (if ((seed + 11 * b) % 2 == 0) 1 else -1)
    (v, l1, m)
  }

  private def acJpeg(w: Int, h: Int, seed: Int): Array[Byte] = {
    val bw = w / 8
    val dcq = Array.tabulate(h / 8, bw)((by, bx) =>
      ((seed + 31 * (by * bw + bx)) % 128) - 64)
    val ac = Array.tabulate(h / 8, bw) { (by, bx) =>
      val (_, l1, m) = acLevels(seed, by * bw + bx)
      Seq((14, l1), (39, 2 * m))
    }
    graft.ops.JpegCodec.encodeBlocks(w, h, dcq, ac)
  }

  private val genAcDims: Gen[(Int, Int)] =
    for (bw <- Gen.chooseNum(1, 10); bh <- Gen.chooseNum(1, 10))
      yield (bw * 8, bh * 8)

  property("jpeg AC encode->decode matches the closed-form pixel rule exactly") =
    forAll(genAcDims, Gen.chooseNum(0, 127)) { case ((w, h), seed) =>
      val d = graft.ops.JpegCodec.decode(acJpeg(w, h, seed))
      def sgn(t: Int) = if (t % 4 == 0 || t % 4 == 3) 1 else -1
      d.w == w && d.h == h && (0 until h).forall { y =>
        (0 until w).forall { x =>
          val (v, l1, m) = acLevels(seed, (y / 8) * (w / 8) + x / 8)
          val p = v + 3 * l1 * sgn(x % 8) + 17 * m * sgn(x % 8) * sgn(y % 8)
          d.pixels(y * w + x) == math.max(0, math.min(255, p))
        }
      }
    }

  property("ImageIO agrees with JpegCodec.decode on AC streams within IDCT tolerance") =
    forAll(genAcDims, Gen.chooseNum(0, 127)) { case ((w, h), seed) =>
      // non-DC-only blocks engage ImageIO's fixed-point IDCT, whose
      // conformance bound allows small per-pixel deviation from the
      // ideal inverse transform — assert agreement within ±1
      val bytes = acJpeg(w, h, seed)
      val ours = graft.ops.JpegCodec.decode(bytes)
      val (dw, dh, px) = imageIoGray(bytes)
      dw == w && dh == h &&
        px.indices.forall(i => math.abs(px(i) - ours.pixels(i)) <= 1)
    }

  private val genSparseAc: Gen[Seq[(Int, Int)]] =
    for {
      k <- Gen.chooseNum(0, 4)
      zs <- Gen.listOfN(k, Gen.chooseNum(1, 63)).map(_.distinct.sorted)
      lvls <- Gen.listOfN(zs.length, Gen.oneOf(-4, -3, -2, -1, 1, 2, 3, 4))
    } yield zs.zip(lvls)

  property("ImageIO agrees on RANDOM sparse AC spectra (arbitrary runs/ZRL positions)") =
    forAll(Gen.chooseNum(1, 4), Gen.chooseNum(1, 4), Gen.chooseNum(-40, 40),
        Gen.listOfN(16, genSparseAc)) { (bw, bh, dc, acPool) =>
      // every block gets its own sparse spectrum — zero runs land at
      // arbitrary zigzag offsets, covering run/size composites and ZRL
      // placements the fixed jpegAcMedia layout never produces. The
      // decoder pair must agree within the fixed-point-IDCT tolerance.
      val w = bw * 8; val h = bh * 8
      val dcq = Array.tabulate(bh, bw)((by, bx) => dc + by - bx)
      val ac = Array.tabulate(bh, bw)((by, bx) =>
        acPool((by * bw + bx) % acPool.length))
      val bytes = graft.ops.JpegCodec.encodeBlocks(w, h, dcq, ac)
      val ours = graft.ops.JpegCodec.decode(bytes)
      val (dw, dh, px) = imageIoGray(bytes)
      dw == w && dh == h &&
        px.indices.forall(i => math.abs(px(i) - ours.pixels(i)) <= 1)
    }

  // ---- WAV cross-decoder: javax.sound.sampled (the JDK's own audio
  // reader, sharing no code with this repo) must read the containers
  // buildWav produces — closing the last self-round-trip-only codec
  // the way ImageIO closed PNG/JPEG. ----

  property("AudioSystem cross-decodes buildWav: format fields and PCM bytes exact") =
    forAll(genPayload) { p =>
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(buildWav(p)))
      try {
        val f = in.getFormat
        // the canonical header: mono, 8-bit, 8 kHz, unsigned PCM
        // (8-bit WAV is unsigned by spec), blockAlign 1 — and the
        // reader's frame count equals mediaContainers' parse
        f.getChannels == 1 && f.getSampleSizeInBits == 8 &&
          f.getSampleRate == 8000f && f.getFrameSize == 1 &&
          f.getEncoding ==
            javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED &&
          in.getFrameLength == p.length.toLong &&
          in.getFrameLength == parseHeader(buildWav(p)).nFrames.toLong && {
            // the PCM samples the JDK returns are byte-for-byte the
            // data-chunk payload our decode (and the audio_frame_energy
            // oracle) reads
            val got = in.readAllBytes()
            java.util.Arrays.equals(got, p)
          }
      } finally in.close()
    }

  property("a flipped byte anywhere in a PNG header region is detected") =
    forAll(genDim, genDim, Gen.chooseNum(8, 32)) { (w, h, idx) =>
      // positions 8..32 sit inside the IHDR chunk (length/type/data/crc)
      val bytes = buildPng(w, h, None, "payload".getBytes)
      bytes(idx) = (bytes(idx) ^ 0x40).toByte
      try {
        // a corrupted length/type field may still walk, but the CRC
        // (or the chunk walk itself) must refuse — never a silent
        // wrong-dimension success
        val hd = parseHeader(bytes)
        hd == MediaHeader("png", w, h, 1)
      } catch { case _: IllegalArgumentException => true }
    }
}
