package graft.ops

/** REAL baseline JPEG entropy layer — the piece the multimodal story
  * had left synthetic: a spec-conforming sequential-DCT grayscale
  * encoder/decoder pair using the JPEG standard's (ITU T.81 Annex K)
  * luminance quantization and Huffman tables, a genuine entropy-coded
  * bitstream (canonical Huffman codes, DC prediction with the
  * negative-value EXTEND convention, EOB/ZRL AC symbols, 0xFF byte
  * stuffing), and a full dequant + IDCT reconstruction.
  *
  * Content contract that keeps the pair EXACT end-to-end: the encoder
  * takes one EVEN value per 8×8 block (a flat block). A flat block's
  * forward DCT is DC-only with DC = 8·(v−128); the Annex K luminance
  * DC quantizer is 16, so the quantized coefficient (v−128)/2 is an
  * exact integer for even v, and the IDCT of the dequantized DC-only
  * block is exactly flat v again — no rounding loss anywhere, which is
  * what lets a SQL oracle predict every decoded pixel from the block
  * rule alone. The DECODER is general within the baseline profile
  * (any DC category, full AC run/size alphabet, multi-table DHT
  * segments, restart-free scans) — it does not know the content is
  * DC-only; flatness is a property of these streams, not a decoder
  * assumption.
  */
object JpegCodec {

  /** Annex K luminance quantization table, natural (row-major) order. */
  val QuantLum: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** Zigzag scan: zigzag index -> natural index. */
  val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex K luminance DC Huffman spec: (BITS, HUFFVAL). */
  val DcBits: Array[Int] = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  val DcVals: Array[Int] = (0 to 11).toArray

  /** Annex K luminance AC Huffman spec. */
  val AcBits: Array[Int] = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  val AcVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  /** Canonical Huffman codes from a (BITS, HUFFVAL) spec:
    * value -> (code, length). The T.81 Annex C construction.
    */
  def buildEncodeTable(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    val out = scala.collection.mutable.Map.empty[Int, (Int, Int)]
    var code = 0
    var k = 0
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len - 1)) {
        out(vals(k)) = (code, len)
        code += 1; k += 1; i += 1
      }
      code <<= 1
      len += 1
    }
    out.toMap
  }

  /** Decode table: (length -> (firstCode, firstIndex)) plus the flat
    * value list — the canonical MINCODE/MAXCODE/VALPTR walk of T.81
    * Annex F, here as arrays indexed by code length.
    */
  final class HuffDecoder(bits: Array[Int], vals: Array[Int]) {
    private val minCode = new Array[Int](17)
    private val maxCode = new Array[Int](17) // -1 = no codes at this length
    private val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var len = 1
      while (len <= 16) {
        if (bits(len - 1) == 0) { minCode(len) = 0; maxCode(len) = -1; valPtr(len) = 0 }
        else {
          valPtr(len) = k
          minCode(len) = code
          code += bits(len - 1); k += bits(len - 1)
          maxCode(len) = code - 1
        }
        code <<= 1
        len += 1
      }
    }
    /** Read one Huffman-coded value from the bit reader. */
    def decode(in: BitReader): Int = {
      var code = in.readBit()
      var len = 1
      while (len < 16 && (maxCode(len) < 0 || code > maxCode(len))) {
        code = (code << 1) | in.readBit()
        len += 1
      }
      if (maxCode(len) < 0 || code > maxCode(len))
        throw new IllegalArgumentException("invalid JPEG Huffman code")
      vals(valPtr(len) + (code - minCode(len)))
    }
  }

  /** Entropy-segment bit writer with 0xFF byte stuffing and 1-fill
    * final padding (T.81 F.1.2.3).
    */
  final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var nbits = 0
    def write(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc & 0xff)
          if ((acc & 0xff) == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def finish(): Array[Byte] = {
      if (nbits > 0) write((1 << (8 - nbits)) - 1, 8 - nbits) // 1-fill
      out.toByteArray
    }
  }

  /** Entropy-segment bit reader that un-stuffs 0xFF 0x00 and stops at
    * a marker (0xFF followed by non-zero).
    */
  final class BitReader(bytes: Array[Byte], start: Int) {
    private var pos = start
    private var acc = 0
    private var nbits = 0
    def readBit(): Int = {
      if (nbits == 0) {
        if (pos >= bytes.length)
          throw new IllegalArgumentException("JPEG entropy segment truncated")
        val b = bytes(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          if (pos >= bytes.length)
            throw new IllegalArgumentException("JPEG entropy segment truncated at 0xFF")
          if ((bytes(pos) & 0xff) == 0x00) pos += 1 // stuffed data byte
          else throw new IllegalArgumentException(
            "JPEG entropy segment hit a marker mid-block")
        }
        acc = b; nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def readBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
  }

  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def seg(marker: Int, payload: Array[Byte]): Array[Byte] =
    Array(0xff.toByte, marker.toByte) ++ be16(payload.length + 2) ++ payload

  /** DC category (number of magnitude bits) of a coefficient. */
  def category(v: Int): Int = {
    var a = math.abs(v)
    var t = 0
    while (a != 0) { a >>= 1; t += 1 }
    t
  }

  /** Encode a grayscale baseline JPEG from one even value per 8×8
    * block: `blocks(by)(bx)` ∈ {0,2,..,254}; w and h must be
    * multiples of 8. Emits DQT + SOF0 + DHT(DC0, AC0) + SOS with a
    * real entropy-coded scan (DC prediction + EOB per block).
    */
  def encodeFlatBlocks(w: Int, h: Int, blocks: Array[Array[Int]]): Array[Byte] = {
    require(w % 8 == 0 && h % 8 == 0, s"dims ${w}x$h not multiples of 8")
    val bw = w / 8; val bh = h / 8
    require(blocks.length == bh && blocks.forall(_.length == bw))
    val dcEnc = buildEncodeTable(DcBits, DcVals)
    // DQT: Pq=0, Tq=0, 64 entries in ZIGZAG order
    val dqt = seg(0xdb, Array(0x00.toByte) ++
      (0 until 64).map(z => QuantLum(Zigzag(z)).toByte))
    val sof = seg(0xc0, Array[Byte](8) ++ be16(h) ++ be16(w) ++
      Array[Byte](1, 1, 0x11, 0))
    val dht = seg(0xc4,
      Array(0x00.toByte) ++ DcBits.map(_.toByte) ++ DcVals.map(_.toByte) ++
      Array(0x10.toByte) ++ AcBits.map(_.toByte) ++ AcVals.map(_.toByte))
    val sos = seg(0xda, Array[Byte](1, 1, 0x00, 0, 63, 0))
    val bw2 = new BitWriter
    val acEnc = buildEncodeTable(AcBits, AcVals)
    var pred = 0
    var by = 0
    while (by < bh) {
      var bx = 0
      while (bx < bw) {
        val v = blocks(by)(bx)
        require(v >= 0 && v <= 254 && v % 2 == 0, s"block value $v not even 0..254")
        val dcq = (v - 128) / 2 // exact: DC=8(v-128), Q=16
        val diff = dcq - pred
        pred = dcq
        val t = category(diff)
        val (c, l) = dcEnc(t)
        bw2.write(c, l)
        if (t > 0) {
          val mag = if (diff < 0) diff + (1 << t) - 1 else diff
          bw2.write(mag, t)
        }
        val (ec, el) = acEnc(0x00) // EOB: every AC is zero in a flat block
        bw2.write(ec, el)
        bx += 1
      }
      by += 1
    }
    Array(0xff.toByte, 0xd8.toByte) ++ dqt ++ sof ++ dht ++ sos ++
      bw2.finish() ++ Array(0xff.toByte, 0xd9.toByte)
  }

  /** Encode a grayscale baseline JPEG from QUANTIZED coefficients:
    * per block a DC level (quantized, i.e. the value the decoder's
    * DC prediction chain reproduces) plus a sparse list of nonzero AC
    * levels as (zigzagIndex 1..63, level != 0) pairs in ascending
    * zigzag order. This is the general sequential-DCT entropy encoder
    * — zero runs split into ZRL (0xF0) symbols per T.81 F.1.2.2.3,
    * run/size composite symbols, magnitude bits with the negative
    * EXTEND convention, EOB only when the tail is zero — so streams
    * built here exercise the decoder's full AC alphabet (runs, ZRL,
    * AC EXTEND), unlike [[encodeFlatBlocks]]'s DC+EOB-only scans.
    * Callers pick coefficient sets whose dequant+IDCT is exact (see
    * `Multimodal.jpegAcMedia`); the encoder itself is content-generic.
    */
  def encodeBlocks(
      w: Int, h: Int,
      dcq: Array[Array[Int]],
      ac: Array[Array[Seq[(Int, Int)]]]): Array[Byte] = {
    require(w % 8 == 0 && h % 8 == 0, s"dims ${w}x$h not multiples of 8")
    val bw = w / 8; val bh = h / 8
    require(dcq.length == bh && dcq.forall(_.length == bw))
    require(ac.length == bh && ac.forall(_.length == bw))
    val dcEnc = buildEncodeTable(DcBits, DcVals)
    val acEnc = buildEncodeTable(AcBits, AcVals)
    val dqt = seg(0xdb, Array(0x00.toByte) ++
      (0 until 64).map(z => QuantLum(Zigzag(z)).toByte))
    val sof = seg(0xc0, Array[Byte](8) ++ be16(h) ++ be16(w) ++
      Array[Byte](1, 1, 0x11, 0))
    val dht = seg(0xc4,
      Array(0x00.toByte) ++ DcBits.map(_.toByte) ++ DcVals.map(_.toByte) ++
      Array(0x10.toByte) ++ AcBits.map(_.toByte) ++ AcVals.map(_.toByte))
    val sos = seg(0xda, Array[Byte](1, 1, 0x00, 0, 63, 0))
    val out = new BitWriter
    var pred = 0
    var by = 0
    while (by < bh) {
      var bx = 0
      while (bx < bw) {
        val diff = dcq(by)(bx) - pred
        pred = dcq(by)(bx)
        val t = category(diff)
        val (c, l) = dcEnc(t)
        out.write(c, l)
        if (t > 0) {
          val mag = if (diff < 0) diff + (1 << t) - 1 else diff
          out.write(mag, t)
        }
        var z = 1
        ac(by)(bx).foreach { case (zz, lvl) =>
          require(zz >= z && zz <= 63, s"AC zigzag $zz out of order/range")
          require(lvl != 0, "AC level must be nonzero (zeros are runs)")
          var run = zz - z
          while (run >= 16) { // ZRL covers 16 zeros
            val (zc, zl) = acEnc(0xf0)
            out.write(zc, zl)
            run -= 16
          }
          val s = category(lvl)
          val (rc, rl) = acEnc((run << 4) | s)
          out.write(rc, rl)
          val mag = if (lvl < 0) lvl + (1 << s) - 1 else lvl
          out.write(mag, s)
          z = zz + 1
        }
        if (z <= 63) {
          val (ec, el) = acEnc(0x00) // EOB for the zero tail
          out.write(ec, el)
        }
        bx += 1
      }
      by += 1
    }
    Array(0xff.toByte, 0xd8.toByte) ++ dqt ++ sof ++ dht ++ sos ++
      out.finish() ++ Array(0xff.toByte, 0xd9.toByte)
  }

  /** EXTEND (T.81 F.2.2.1): map `mag` read as `t` magnitude bits back
    * to the signed coefficient.
    */
  def extend(mag: Int, t: Int): Int =
    if (t == 0) 0
    else if (mag < (1 << (t - 1))) mag - (1 << t) + 1
    else mag

  case class DecodedJpeg(w: Int, h: Int, pixels: Array[Int])

  /** Decode a grayscale baseline JPEG: segment walk (DQT zigzag-aware,
    * DHT canonical build, SOF0, SOS), full Huffman entropy decode
    * (general DC categories and the complete AC run/size alphabet —
    * EOB, ZRL, arbitrary runs), dequantization, and the T.81 A.3.3
    * IDCT (here in closed form per coefficient; exact for the DC-only
    * blocks these streams carry, and correctly rounded generally).
    */
  def decode(bytes: Array[Byte]): DecodedJpeg = {
    if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8)
      throw new IllegalArgumentException("not a JPEG (no SOI)")
    var off = 2
    var quant: Array[Int] = null // natural order
    var dcDec: HuffDecoder = null
    var acDec: HuffDecoder = null
    var w = -1; var h = -1
    var scanStart = -1
    while (scanStart < 0) {
      if (off + 4 > bytes.length)
        throw new IllegalArgumentException("JPEG truncated before SOS")
      if ((bytes(off) & 0xff) != 0xff)
        throw new IllegalArgumentException(f"JPEG marker expected at $off")
      val marker = bytes(off + 1) & 0xff
      val len = ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
      if (off + 2 + len > bytes.length)
        throw new IllegalArgumentException(s"JPEG segment at $off overruns file")
      val body = off + 4
      marker match {
        case 0xdb =>
          var p = body
          while (p < off + 2 + len) {
            val pq = (bytes(p) & 0xf0) >> 4
            if (pq != 0) throw new IllegalArgumentException("16-bit DQT unsupported")
            val q = new Array[Int](64)
            var z = 0
            while (z < 64) { q(Zigzag(z)) = bytes(p + 1 + z) & 0xff; z += 1 }
            if ((bytes(p) & 0x0f) == 0) quant = q
            p += 65
          }
        case 0xc4 =>
          var p = body
          while (p < off + 2 + len) {
            val tc = (bytes(p) & 0xf0) >> 4
            val th = bytes(p) & 0x0f
            val bits = Array.tabulate(16)(i => bytes(p + 1 + i) & 0xff)
            val nv = bits.sum
            val vals = Array.tabulate(nv)(i => bytes(p + 17 + i) & 0xff)
            val dec = new HuffDecoder(bits, vals)
            if (th == 0) { if (tc == 0) dcDec = dec else acDec = dec }
            p += 17 + nv
          }
        case 0xc0 =>
          if ((bytes(body) & 0xff) != 8)
            throw new IllegalArgumentException("only 8-bit baseline supported")
          h = ((bytes(body + 1) & 0xff) << 8) | (bytes(body + 2) & 0xff)
          w = ((bytes(body + 3) & 0xff) << 8) | (bytes(body + 4) & 0xff)
          if ((bytes(body + 5) & 0xff) != 1)
            throw new IllegalArgumentException("only 1-component (grayscale) supported")
        case 0xda => scanStart = off + 2 + len
        case _ => () // APPn/COM: skip
      }
      off += 2 + len
    }
    if (quant == null || dcDec == null || acDec == null || w < 0)
      throw new IllegalArgumentException("JPEG missing DQT/DHT/SOF before SOS")
    if (w % 8 != 0 || h % 8 != 0)
      throw new IllegalArgumentException(
        s"dims ${w}x$h not multiples of 8 (edge replication unsupported)")
    val in = new BitReader(bytes, scanStart)
    val px = new Array[Int](w * h)
    val coef = new Array[Int](64) // natural order
    val bw = w / 8; val bh = h / 8
    var pred = 0
    var by = 0
    while (by < bh) {
      var bx = 0
      while (bx < bw) {
        java.util.Arrays.fill(coef, 0)
        val t = dcDec.decode(in)
        pred += extend(if (t > 0) in.readBits(t) else 0, t)
        coef(0) = pred * quant(0)
        var z = 1
        var eob = false
        while (z < 64 && !eob) {
          val rs = acDec.decode(in)
          if (rs == 0x00) eob = true
          else if (rs == 0xf0) z += 16 // ZRL
          else {
            z += (rs >> 4)
            val s = rs & 0x0f
            if (z > 63) throw new IllegalArgumentException("AC run past block end")
            coef(Zigzag(z)) = extend(in.readBits(s), s) * quant(Zigzag(z))
            z += 1
          }
        }
        // IDCT (naive, double): exact for DC-only; correctly rounded
        // generally. Flat fast path when only coef(0) is set.
        val dcOnly = {
          var i = 1; var flat = true
          while (i < 64 && flat) { flat = coef(i) == 0; i += 1 }
          flat
        }
        if (dcOnly) {
          val v = clamp(Math.round(coef(0) / 8.0).toInt + 128)
          var dy = 0
          while (dy < 8) {
            var dx = 0
            while (dx < 8) {
              px((by * 8 + dy) * w + bx * 8 + dx) = v; dx += 1
            }
            dy += 1
          }
        } else {
          var dy = 0
          while (dy < 8) {
            var dx = 0
            while (dx < 8) {
              var s = 0.0
              var u = 0
              while (u < 8) {
                var vq = 0
                while (vq < 8) {
                  val c = coef(vq * 8 + u)
                  if (c != 0) {
                    val cu = if (u == 0) 0.7071067811865476 else 1.0
                    val cv = if (vq == 0) 0.7071067811865476 else 1.0
                    s += cu * cv * c *
                      math.cos((2 * dx + 1) * u * math.Pi / 16.0) *
                      math.cos((2 * dy + 1) * vq * math.Pi / 16.0)
                  }
                  vq += 1
                }
                u += 1
              }
              px((by * 8 + dy) * w + bx * 8 + dx) =
                clamp(Math.round(s / 4.0).toInt + 128)
              dx += 1
            }
            dy += 1
          }
        }
        bx += 1
      }
      by += 1
    }
    DecodedJpeg(w, h, px)
  }

  private def clamp(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
}
