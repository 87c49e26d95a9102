package graft.operators

/** Pure-JDK baseline JPEG codec (r8 verdict #5 — retiring mm04's last
  * pixel-decode stub; the reference engine has no media path at all, so
  * this whole family is north-star extension, SURVEY.md §0/§7.3).
  *
  * Decoder scope — baseline sequential DCT (SOF0), 8-bit, single
  * interleaved scan, per-component sampling factors 1 or 2 (so 4:4:4,
  * 4:2:2, 4:4:0 and the web-dominant 4:2:0 all decode; r9 verdict #3
  * retired the 1×1-only refusal), optional restart intervals.
  * Everything is implemented from the public spec (ITU-T T.81): marker
  * walk (DQT/DHT/SOF0/SOS/DRI), interleaved MCU layout (h×v blocks per
  * component per MCU, §A.2.3), canonical Huffman decode, zigzag
  * dequantization, separable double-precision IDCT with level shift +
  * clamp, triangular-filter ("fancy") chroma upsampling for the 2:1
  * ratios — the 3:1-weighted centered interpolation every IJG-derived
  * decoder (including the JDK's ImageIO) applies, so the ±1 ImageIO
  * cross-check holds on subsampled streams too — and libjpeg-style
  * fixed-point YCbCr→RGB for 3-component streams (floorDiv so the
  * DuckDB oracle can mirror the exact integer arithmetic with FLOOR
  * division).
  *
  * Encoder scope — the fixture generator: DC-only blocks (every AC
  * coefficient zero → one EOB per block) against a flat all-8s quant
  * table, coded with the spec's Annex K standard luminance tables. With
  * q=8, F(0,0)=8·dc and the IDCT of a DC-only block is exactly flat
  * F(0,0)/8 = dc, so decoded samples are closed-form integers
  * (dc + 128) with no rounding ambiguity for ANY correct decoder — the
  * property that lets the oracle recompute pixel statistics without a
  * codec while the Spark side must really decode the bitstream.
  */
private[graft] object JpegCodec {

  /** Zigzag order: zigzag index → natural (row-major) index. T.81 fig A.6. */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex K standard luminance DC table: code-length counts + symbols. */
  private val DcBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)

  /** Annex K standard luminance AC table. */
  private val AcBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcVals = Array(
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

  /** Canonical Huffman table in the classic mincode/maxcode/valptr
    * decode form (T.81 §F.2.2.3). */
  private final class Huff(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17) // -1 = no codes of this length
    val valPtr = new Array[Int](17)
    private var code = 0
    private var k = 0
    for (l <- 1 to 16) {
      if (bits(l) == 0) { maxCode(l) = -1 }
      else {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l); k += bits(l)
        maxCode(l) = code - 1
      }
      code <<= 1
    }
    def value(i: Int): Int = vals(i)
  }

  /** Encoder-side canonical code assignment: symbol → (code, length). */
  private def encTable(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val m = Map.newBuilder[Int, (Int, Int)]
    for (l <- 1 to 16) {
      for (_ <- 0 until bits(l)) { m += vals(k) -> (code, l); code += 1; k += 1 }
      code <<= 1
    }
    m.result()
  }

  // ------------------------------------------------------------- encoder

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xFF) out.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (nbits > 0) { // pad with 1s per spec
      acc = (acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)
      out.write(acc)
      if (acc == 0xFF) out.write(0x00)
      acc = 0; nbits = 0
    }
  }

  /** DC difference category (number of magnitude bits). */
  private def category(v: Int): Int = {
    var a = math.abs(v)
    var s = 0
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  /** Encode a baseline JPEG of flat 8×8 blocks: `dcOf(bx, by, c)` must
    * return the block's sample value MINUS 128 (the DC coefficient at
    * quant 8), in [-128, 127]. All components 1×1 sampling, quant
    * table all-8s, Annex K luminance Huffman tables for everything. */
  def encodeFlatBlocks(w: Int, h: Int, nc: Int,
      dcOf: (Int, Int, Int) => Int): Array[Byte] = {
    require(nc == 1 || nc == 3, "1 or 3 components")
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xFF); out.write(m) }
    def seg(m: Int, payload: Array[Int]): Unit = {
      marker(m)
      val len = payload.length + 2
      out.write(len >> 8); out.write(len & 0xFF)
      payload.foreach(out.write)
    }
    marker(0xD8) // SOI
    seg(0xDB, Array(0x00) ++ Array.fill(64)(8)) // DQT: table 0, all 8s
    seg(0xC0, Array(8, h >> 8, h & 0xFF, w >> 8, w & 0xFF, nc) ++
      (1 to nc).flatMap(c => Seq(c, 0x11, 0))) // SOF0: 1×1 sampling, qt 0
    seg(0xC4, Array(0x00) ++ DcBits.drop(1) ++ DcVals) // DHT DC 0
    seg(0xC4, Array(0x10) ++ AcBits.drop(1) ++ AcVals) // DHT AC 0
    seg(0xDA, Array(nc) ++ (1 to nc).flatMap(c => Seq(c, 0x00)) ++
      Seq(0, 63, 0)) // SOS
    val dcEnc = encTable(DcBits, DcVals)
    val acEnc = encTable(AcBits, AcVals)
    val bw = new BitWriter(out)
    val pred = new Array[Int](nc)
    for (by <- 0 until (h + 7) / 8; bx <- 0 until (w + 7) / 8; c <- 0 until nc) {
      val dc = dcOf(bx, by, c)
      val diff = dc - pred(c)
      pred(c) = dc
      val s = category(diff)
      val (code, len) = dcEnc(s)
      bw.put(code, len)
      if (s > 0) bw.put(if (diff >= 0) diff else diff + (1 << s) - 1, s)
      val (eob, eobLen) = acEnc(0x00)
      bw.put(eob, eobLen) // all ACs zero
    }
    bw.flush()
    marker(0xD9) // EOI
    out.toByteArray
  }

  // ------------------------------------------------------------- decoder

  private final class BitReader(p: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    var hitMarker = false
    /** Next bit, honoring FF00 unstuffing; an unexpected marker sets
      * [[hitMarker]] and yields 0s (caller checks). */
    def bit(): Int = {
      if (nbits == 0) {
        if (hitMarker || pos >= p.length) { hitMarker = true; return 0 }
        var b = p(pos) & 0xFF
        pos += 1
        if (b == 0xFF) {
          val b2 = if (pos < p.length) p(pos) & 0xFF else 0xD9
          if (b2 == 0x00) pos += 1 // stuffed data byte
          else { hitMarker = true; b = 0 } // marker: leave pos at FF
        }
        acc = b; nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** Byte-align and consume an expected RSTn marker. */
    def restart(): Boolean = {
      nbits = 0
      if (pos + 1 < p.length && (p(pos) & 0xFF) == 0xFF) {
        val m = p(pos + 1) & 0xFF
        if (m >= 0xD0 && m <= 0xD7) { pos += 2; hitMarker = false; return true }
      }
      false
    }
    def decode(t: Huff): Int = {
      var code = bit()
      var l = 1
      while (l <= 16 && (t.maxCode(l) < 0 || code > t.maxCode(l))) {
        code = (code << 1) | bit()
        l += 1
      }
      if (l > 16) { hitMarker = true; 0 }
      else t.value(t.valPtr(l) + code - t.minCode(l))
    }
  }

  /** T.81 §F.2.2.1 EXTEND: magnitude bits → signed value. */
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  /** Separable double-precision reference IDCT + level shift + clamp. */
  private val CosT = Array.tabulate(8, 8)((x, u) =>
    math.cos((2 * x + 1) * u * math.Pi / 16) * (if (u == 0) 1.0 / math.sqrt(2) else 1.0))

  private def idct(coef: Array[Int]): Array[Int] = {
    val tmp = new Array[Double](64)
    // rows: for each y, x: sum over u of C(u) F(u) cos
    for (y <- 0 until 8; x <- 0 until 8) {
      var s = 0.0
      var u = 0
      while (u < 8) { s += CosT(x)(u) * coef(y * 8 + u); u += 1 }
      tmp(y * 8 + x) = s / 2
    }
    val outp = new Array[Int](64)
    for (x <- 0 until 8; y <- 0 until 8) {
      var s = 0.0
      var v = 0
      while (v < 8) { s += CosT(y)(v) * tmp(v * 8 + x); v += 1 }
      val r = math.round(s / 2 + 128).toInt
      outp(y * 8 + x) = if (r < 0) 0 else if (r > 255) 255 else r
    }
    outp
  }

  /** libjpeg-style fixed-point YCbCr→RGB with floorDiv (>>16) — the
    * oracle mirrors this with FLOOR(x / 65536.0). */
  private def ycc2rgb(yv: Int, cb: Int, cr: Int): (Int, Int, Int) = {
    def cl(v: Int) = if (v < 0) 0 else if (v > 255) 255 else v
    val r = yv + Math.floorDiv(91881 * (cr - 128) + 32768, 65536)
    val g = yv - Math.floorDiv(22554 * (cb - 128) + 46802 * (cr - 128) + 32768, 65536)
    val b = yv + Math.floorDiv(116130 * (cb - 128) + 32768, 65536)
    (cl(r), cl(g), cl(b))
  }

  /** Decode a baseline JPEG (scope in class doc). Returns
    * (w, h, channels, pixels row-major channel-fastest) — RGB for
    * 3-component streams, the raw plane for 1-component — or None for
    * anything outside the supported shape. */
  def decodePixels(p: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
    if (p.length < 4 || (p(0) & 0xFF) != 0xFF || (p(1) & 0xFF) != 0xD8) return None
    val qt = scala.collection.mutable.Map[Int, Array[Int]]() // zigzag order
    val huffs = scala.collection.mutable.Map[(Int, Int), Huff]()
    var w = 0
    var h = 0
    var nc = 0
    var compQ: Array[Int] = null
    var compH: Array[Int] = null
    var compV: Array[Int] = null
    var dri = 0
    var i = 2
    var scanAt = -1
    var compTabs: Array[(Int, Int)] = null // (dcTab, acTab) per component
    while (scanAt < 0 && i + 4 <= p.length) {
      if ((p(i) & 0xFF) != 0xFF) return None
      val m = p(i + 1) & 0xFF
      if (m == 0xD9) return None // EOI before SOS
      val len = ((p(i + 2) & 0xFF) << 8) | (p(i + 3) & 0xFF)
      val body = i + 4
      m match {
        case 0xDB => // DQT (possibly several tables per segment)
          var j = body
          while (j < i + 2 + len) {
            val pq = (p(j) & 0xF0) >> 4
            if (pq != 0) return None // 8-bit precision only
            val id = p(j) & 0x0F
            qt(id) = Array.tabulate(64)(k => p(j + 1 + k) & 0xFF)
            j += 65
          }
        case 0xC4 => // DHT (possibly several tables per segment)
          var j = body
          while (j < i + 2 + len) {
            val cls = (p(j) & 0xF0) >> 4
            val id = p(j) & 0x0F
            val bits = new Array[Int](17)
            var n = 0
            for (l <- 1 to 16) { bits(l) = p(j + l) & 0xFF; n += bits(l) }
            val vals = Array.tabulate(n)(k => p(j + 17 + k) & 0xFF)
            huffs((cls, id)) = new Huff(bits, vals)
            j += 17 + n
          }
        case 0xC0 => // SOF0 baseline
          if ((p(body) & 0xFF) != 8) return None
          h = ((p(body + 1) & 0xFF) << 8) | (p(body + 2) & 0xFF)
          w = ((p(body + 3) & 0xFF) << 8) | (p(body + 4) & 0xFF)
          nc = p(body + 5) & 0xFF
          if (w == 0 || h == 0 || (nc != 1 && nc != 3)) return None
          compQ = new Array[Int](nc)
          compH = new Array[Int](nc)
          compV = new Array[Int](nc)
          for (c <- 0 until nc) {
            val samp = p(body + 6 + 3 * c + 1) & 0xFF
            compH(c) = (samp & 0xF0) >> 4
            compV(c) = samp & 0x0F
            // factors 1 and 2 cover 4:4:4 / 4:2:2 / 4:4:0 / 4:2:0 —
            // everything real encoders emit for photos; 4× is legal but
            // unseen in the wild, refuse rather than half-support
            if (compH(c) < 1 || compH(c) > 2 || compV(c) < 1 || compV(c) > 2)
              return None
            compQ(c) = p(body + 6 + 3 * c + 2) & 0xFF
          }
          // a single-component scan is never interleaved (§A.2.2): its
          // data units tile the image directly, sampling factors unused
          if (nc == 1) { compH(0) = 1; compV(0) = 1 }
        case 0xC1 | 0xC2 | 0xC3 => return None // non-baseline SOF
        case 0xDD => dri = ((p(body) & 0xFF) << 8) | (p(body + 1) & 0xFF)
        case 0xDA => // SOS
          val ns = p(body) & 0xFF
          if (nc == 0 || ns != nc) return None
          compTabs = Array.tabulate(nc) { c =>
            val tt = p(body + 1 + 2 * c + 1) & 0xFF
            ((tt & 0xF0) >> 4, tt & 0x0F)
          }
          scanAt = i + 2 + len
        case _ => // APPn / COM / others: skip
      }
      i += 2 + len
    }
    if (scanAt < 0 || compQ == null) return None
    if (compQ.exists(q => !qt.contains(q))) return None
    if (compTabs.exists { case (d, a) =>
      !huffs.contains((0, d)) || !huffs.contains((1, a)) }) return None

    val hmax = compH.max
    val vmax = compV.max
    // MCU grid over the image (§A.2.3); each component contributes
    // h×v blocks per MCU, raster order, into its own (padded) plane
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    val planeW = Array.tabulate(nc)(c => mcusX * compH(c) * 8)
    val planes = Array.tabulate(nc)(c => new Array[Int](planeW(c) * mcusY * compV(c) * 8))
    val br = new BitReader(p, scanAt)
    val pred = new Array[Int](nc)
    val coef = new Array[Int](64)
    var mcu = 0
    val nMcu = mcusX * mcusY
    while (mcu < nMcu) {
      if (dri > 0 && mcu > 0 && mcu % dri == 0) {
        if (!br.restart()) return None
        java.util.Arrays.fill(pred, 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var c = 0
      while (c < nc) {
        val q = qt(compQ(c))
        val dcT = huffs((0, compTabs(c)._1))
        val acT = huffs((1, compTabs(c)._2))
        var bv = 0
        while (bv < compV(c)) {
          var bhx = 0
          while (bhx < compH(c)) {
            java.util.Arrays.fill(coef, 0)
            val t = br.decode(dcT)
            pred(c) += extend(br.receive(t), t)
            coef(0) = pred(c) * q(0)
            var k = 1
            var eob = false
            while (k < 64 && !eob) {
              val rs = br.decode(acT)
              val r = (rs & 0xF0) >> 4
              val sz = rs & 0x0F
              if (sz == 0) { if (r == 15) k += 16 else eob = true }
              else {
                k += r
                if (k > 63) return None
                coef(Zigzag(k)) = extend(br.receive(sz), sz) * q(k)
                k += 1
              }
            }
            if (br.hitMarker && mcu < nMcu - 1 && !(dri > 0)) return None
            val block = idct(coef)
            val plane = planes(c)
            val bx = mx * compH(c) + bhx
            val by = my * compV(c) + bv
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                plane((by * 8 + yy) * planeW(c) + bx * 8 + xx) = block(yy * 8 + xx)
                xx += 1
              }
              yy += 1
            }
            bhx += 1
          }
          bv += 1
        }
        c += 1
      }
      mcu += 1
    }
    val ch = if (nc == 3) 3 else 1
    // bring every component to full resolution before color transform
    val full = Array.tabulate(nc) { c =>
      val dw = (w * compH(c) + hmax - 1) / hmax  // downsampled dims
      val dh = (h * compV(c) + vmax - 1) / vmax
      upsample(planes(c), planeW(c), dw, dh, hmax / compH(c), vmax / compV(c), w, h)
    }
    val px = new Array[Byte](w * h * ch)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        if (nc == 3) {
          val (r, g, b) = ycc2rgb(full(0)(y * w + x),
            full(1)(y * w + x), full(2)(y * w + x))
          px((y * w + x) * 3) = r.toByte
          px((y * w + x) * 3 + 1) = g.toByte
          px((y * w + x) * 3 + 2) = b.toByte
        } else px(y * w + x) = full(0)(y * w + x).toByte
        x += 1
      }
      y += 1
    }
    Some((w, h, ch, px))
  }

  // --------------------------------------------------------- upsampling

  /** Upsample one component plane to full image resolution (w×h,
    * stride w). `stride` is the DECODED plane's row stride (block-
    * padded); only the top-left dw×dh samples are image data — edge
    * handling must replicate those, never read the pad. Ratios:
    *  - 1×1: crop;
    *  - 2×1 / 2×2: the triangular ("fancy") filter — output samples sit
    *    at quarter/three-quarter positions between input centers, so
    *    each takes its nearer neighbor ×3 + farther neighbor, rounded —
    *    exactly the centered interpolation IJG-family decoders use,
    *    which is what keeps the ±1 ImageIO cross-check true on
    *    subsampled chroma;
    *  - anything else (1×2): plain replication (as IJG does for
    *    non-2:1 ratios). */
  private def upsample(plane: Array[Int], stride: Int, dw: Int, dh: Int,
      rh: Int, rv: Int, w: Int, h: Int): Array[Int] = {
    val out = new Array[Int](w * h)
    def in(x: Int, y: Int): Int = plane(y * stride + x)
    if (rh == 1 && rv == 1) {
      var y = 0
      while (y < h) {
        System.arraycopy(plane, y * stride, out, y * w, w)
        y += 1
      }
    } else if (rh == 2 && rv == 1) {
      // h2v1: out[2i] = (3·in[i] + in[i-1] + 1) >> 2,
      //       out[2i+1] = (3·in[i] + in[i+1] + 2) >> 2, edges replicate
      val row = new Array[Int](2 * dw)
      var y = 0
      while (y < h) {
        h2Row(x => in(x, y), dw, row)
        System.arraycopy(row, 0, out, y * w, w)
        y += 1
      }
    } else if (rh == 2 && rv == 2) {
      // h2v2: vertical triangular pass (3:1 between the two nearest
      // input rows) into column sums, then the horizontal pass over the
      // sums with 16-denominator rounding (+8 / +7)
      val sums = new Array[Int](dw)
      val row = new Array[Int](2 * dw)
      var oy = 0
      while (oy < h) {
        val v0 = oy >> 1
        val v1 = if ((oy & 1) == 0) math.max(v0 - 1, 0) else math.min(v0 + 1, dh - 1)
        var i = 0
        while (i < dw) { sums(i) = 3 * in(i, v0) + in(i, v1); i += 1 }
        // horizontal: first/last columns replicate
        if (dw == 1) {
          row(0) = (sums(0) * 4 + 8) >> 4
          row(1) = (sums(0) * 4 + 7) >> 4
        } else {
          row(0) = (sums(0) * 4 + 8) >> 4
          row(1) = (sums(0) * 3 + sums(1) + 7) >> 4
          i = 1
          while (i < dw - 1) {
            row(2 * i) = (sums(i) * 3 + sums(i - 1) + 8) >> 4
            row(2 * i + 1) = (sums(i) * 3 + sums(i + 1) + 7) >> 4
            i += 1
          }
          row(2 * dw - 2) = (sums(dw - 1) * 3 + sums(dw - 2) + 8) >> 4
          row(2 * dw - 1) = (sums(dw - 1) * 4 + 7) >> 4
        }
        System.arraycopy(row, 0, out, oy * w, w)
        oy += 1
      }
    } else {
      // replication for the remaining (1×2) shape
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          out(y * w + x) = in(x / rh, y / rv)
          x += 1
        }
        y += 1
      }
    }
    out
  }

  /** One h2v1 fancy row: dw input samples → 2·dw output samples. */
  private def h2Row(in: Int => Int, dw: Int, out: Array[Int]): Unit = {
    if (dw == 1) { out(0) = in(0); out(1) = in(0); return }
    out(0) = in(0)
    out(1) = (in(0) * 3 + in(1) + 2) >> 2
    var i = 1
    while (i < dw - 1) {
      out(2 * i) = (in(i) * 3 + in(i - 1) + 1) >> 2
      out(2 * i + 1) = (in(i) * 3 + in(i + 1) + 2) >> 2
      i += 1
    }
    out(2 * dw - 2) = (in(dw - 1) * 3 + in(dw - 2) + 1) >> 2
    out(2 * dw - 1) = in(dw - 1)
  }
}
