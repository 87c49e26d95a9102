package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Opaque media payload carried as a binary column + provenance. */
final case class MediaIn(doc_id: Long, source: String, payload: Array[Byte])

/** Typed decode result (what a real image/audio decoder would emit). */
final case class MediaMeta(
    doc_id: Long, mime: String, n_bytes: Long, content_md5: String,
    width: Int, height: Int, channels: Int, n_pixels: Long)

/** Multimodal-column plumbing (north-star extension): media as opaque
  * `binary` columns with typed metadata, decoded executor-side in batches.
  *
  * The decoder is REAL header parsing: PNG dimensions/channels come from
  * the IHDR chunk (big-endian ints at fixed offsets, colortype→channel
  * map per the PNG spec) and JPEG dimensions from a marker scan to the
  * SOF0..SOF3 frame header — no codec library needed for metadata. The
  * testdata carries no media files, so the *payload generator* wraps each
  * doc's text in a structurally-valid PNG/JPEG header (the synthetic
  * fixture); the decoder sees only bytes, and the oracle recomputes the
  * expected metadata in closed form, so a misparse fails the hash.
  *
  * Scale posture: decode runs `mapPartitions` executor-side (one batch
  * buffer per task, no shuffle, no driver involvement); payload bytes
  * never leave the executor that read them.
  */
object Multimodal {

  /** Batch size a vectorized decoder would use per call. */
  private val DecodeBatch = 64

  private def md5Hex(b: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(b)
    d.map(x => f"$x%02x").mkString
  }

  /** PNG: 8-byte signature + IHDR chunk = 33-byte header. */
  private val PngHeaderLen = 33
  private val PngSig = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  private def beInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xFF) << 24) | ((b(off + 1) & 0xFF) << 16) |
      ((b(off + 2) & 0xFF) << 8) | (b(off + 3) & 0xFF)

  private def beShort(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xFF) << 8) | (b(off + 1) & 0xFF)

  /** PNG colortype → samples per pixel (PNG spec §11.2.2). */
  private def pngChannels(colorType: Int): Int = colorType match {
    case 0 => 1 // greyscale
    case 2 => 3 // truecolour
    case 3 => 1 // indexed
    case 4 => 2 // greyscale+alpha
    case 6 => 4 // truecolour+alpha
    case _ => 0
  }

  /** Parse a PNG header: signature, then IHDR (the spec mandates it is
    * the first chunk: length at 8, type at 12, width/height big-endian at
    * 16/20, bit depth 24, colour type 25). Returns (w, h, channels,
    * bodyOffset) or None if the bytes aren't a PNG.
    */
  private[graft] def parsePng(p: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    if (p.length < PngHeaderLen || !p.startsWith(PngSig)) return None
    if (!(p(12) == 'I' && p(13) == 'H' && p(14) == 'D' && p(15) == 'R')) return None
    val ch = pngChannels(p(25) & 0xFF)
    if (ch == 0) None else Some((beInt(p, 16), beInt(p, 20), ch, PngHeaderLen))
  }

  /** Parse a JPEG header: SOI, then scan marker segments (skipping APPn /
    * COM / anything with a length field) until a SOF0..SOF3 frame header:
    * precision 1B, height 2B, width 2B, component count 1B. Returns
    * (w, h, channels, bodyOffset = end of the SOF segment) or None.
    */
  private[graft] def parseJpeg(p: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    if (p.length < 4 || (p(0) & 0xFF) != 0xFF || (p(1) & 0xFF) != 0xD8) return None
    var i = 2
    while (i + 4 <= p.length) {
      if ((p(i) & 0xFF) != 0xFF) return None
      var m = p(i + 1) & 0xFF
      while (m == 0xFF && i + 2 < p.length) { i += 1; m = p(i + 1) & 0xFF } // fill bytes
      if (m >= 0xD0 && m <= 0xD9 || m == 0x01) { i += 2 } // standalone, no length
      else {
        // the fill-byte skip may have consumed the 4-byte margin the
        // loop guard checked — a truncated segment is "not a JPEG",
        // never an out-of-bounds read
        if (i + 4 > p.length) return None
        val len = beShort(p, i + 2)
        if (m >= 0xC0 && m <= 0xC3) { // SOF0..SOF3 (baseline/progressive)
          if (i + 10 > p.length) return None // through the p(i+9) read
          val h = beShort(p, i + 5)
          val w = beShort(p, i + 7)
          val ncomp = p(i + 9) & 0xFF
          return Some((w, h, ncomp, i + 2 + len))
        }
        i += 2 + len
      }
    }
    None
  }

  /** Decode one payload from its BYTES only: sniff the container from the
    * signature, parse the header for dimensions/channels, hash the body
    * (the stream past the parsed header) as the content fingerprint.
    * Unknown formats degrade to octet-stream with zero dimensions.
    */
  private def decodeOne(m: MediaIn): MediaMeta = {
    val p = m.payload
    val (mime, w, h, ch, bodyOff) =
      parsePng(p).map { case (w, h, c, o) => ("image/png", w, h, c, o) }
        .orElse(parseJpeg(p).map { case (w, h, c, o) => ("image/jpeg", w, h, c, o) })
        .getOrElse(("application/octet-stream", 0, 0, 0, 0))
    MediaMeta(m.doc_id, mime, p.length.toLong, md5Hex(p.drop(bodyOff)),
      w, h, ch, w.toLong * h.toLong * ch.toLong)
  }

  /** Batched decode: drains the partition iterator in `DecodeBatch`-sized
    * buffers — the exact shape a vectorized (e.g. SIMD/JNI) decoder needs —
    * without materializing the whole partition.
    */
  def decodeBatches(it: Iterator[MediaIn]): Iterator[MediaMeta] =
    it.grouped(DecodeBatch).flatMap(_.map(decodeOne))

  /** Synthetic-fixture payload: the doc's UTF-8 text wrapped in a
    * structurally-valid media header. Even doc_id → PNG (sig + IHDR),
    * odd → JPEG (SOI + SOF0). Dimensions are a closed form of n_chars
    * so the DuckDB oracle can recompute them without parsing bytes;
    * channels cycle through 1/3/4 via the real colortype / component
    * fields. The decoder never sees these formulas — only the bytes.
    */
  private[graft] def synthPayload(docId: Long, text: String, nChars: Long): Array[Byte] = {
    val body = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val w = (nChars * 7 % 1920 + 1).toInt
    val h = (nChars * 13 % 1080 + 1).toInt
    if (docId % 2 == 0) {
      val colorType = Array(0, 2, 6)((docId % 3).toInt) // 1 / 3 / 4 channels
      val bb = java.nio.ByteBuffer.allocate(PngHeaderLen)
      bb.put(PngSig)
      bb.putInt(13).put("IHDR".getBytes)
      bb.putInt(w).putInt(h)
      bb.put(8.toByte).put(colorType.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      bb.putInt(0) // CRC not verified by the metadata parser
      bb.array() ++ body
    } else {
      val ncomp = Array(1, 3, 4)((docId % 3).toInt)
      val segLen = 8 + 3 * ncomp // counts itself, per the JPEG spec
      val bb = java.nio.ByteBuffer.allocate(4 + segLen)
      bb.put(0xFF.toByte).put(0xD8.toByte) // SOI
      bb.put(0xFF.toByte).put(0xC0.toByte).putShort(segLen.toShort) // SOF0
      bb.put(8.toByte).putShort(h.toShort).putShort(w.toShort).put(ncomp.toByte)
      (1 to ncomp).foreach(c => bb.put(c.toByte).put(0x11.toByte).put(0.toByte))
      bb.array() ++ body
    }
  }

  // ---------------------------------------------------------------- mm01
  /** Binary ingest → typed batched decode → metadata table.
    *
    * Since r14 (verdict #2, the layer doctrine finished on the mm
    * family): the header decode runs ONCE at [[pixelLayer]] write time —
    * serving is a projection of the layer's metadata columns, the
    * per-query re-decode (12.3 s warm at sf10) is gone. */
  def mm01(s: SparkSession, dir: String): DataFrame =
    Present.sorted(
      pixelLayer(s, dir).select(col("doc_id"), col("mime"), col("n_bytes"),
        col("meta_md5").as("content_md5"), col("meta_w").as("width"),
        col("meta_h").as("height"), col("meta_nc").as("channels"),
        col("n_pixels")),
      "doc_id")

  /** The PRE-LAYER mm01 (per-query header decode), kept for the same-box
    * A/B — see [[mm04Legacy]]. Not registered in [[qs]]. */
  private[graft] def mm01Legacy(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("text"), col("n_chars"))
      .as[(Long, String, String, Long)]
      .map { case (id, src, text, n) => MediaIn(id, src, synthPayload(id, text, n)) }
    Present.sorted(media.mapPartitions(decodeBatches).toDF(), "doc_id")
  }

  val mm01Sql: String =
    """SELECT doc_id,
      |       CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'image/jpeg' END AS mime,
      |       CASE WHEN doc_id % 2 = 0 THEN 33
      |            ELSE 12 + 3 * (CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END)
      |       END + octet_length(encode(text)) AS n_bytes,
      |       md5(text) AS content_md5,
      |       CAST(n_chars * 7 % 1920 + 1 AS INT) AS width,
      |       CAST(n_chars * 13 % 1080 + 1 AS INT) AS height,
      |       CAST(CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END AS INT) AS channels,
      |       CAST((n_chars * 7 % 1920 + 1) * (n_chars * 13 % 1080 + 1)
      |         * (CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END) AS BIGINT) AS n_pixels
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- mm02
  /** Frame sampling: every 10th frame of an (n_chars mod 240)+1-frame
    * clip, one output row per sampled frame with a per-frame content
    * hash — the generator/explode shape of video pipelines. Map-side
    * only: sequence+explode never shuffles.
    */
  def mm02(s: SparkSession, dir: String): DataFrame =
    // since r14 (verdict #2): the per-frame md5s are LAYER COLUMNS
    // (deterministic per doc — computed once at pixelLayer write);
    // serving explodes the hash array map-side, paying only the explode
    pixelLayer(s, dir)
      .select(col("doc_id"), col("n_frames"),
        posexplode(col("frame_hashes")).as(Seq("p", "frame_hash")))
      .select(col("doc_id"), col("n_frames"),
        (col("p") * 10).cast("int").as("frame_idx"), col("frame_hash"))
      .transform(Present.sorted(_, "doc_id", "frame_idx"))

  /** The PRE-LAYER mm02 (per-query frame md5s) — see [[mm04Legacy]]. */
  private[graft] def mm02Legacy(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("n_frames", (col("n_chars") % 240 + 1).cast("int"))
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(10))).as("frame_idx"))
      .withColumn("frame_hash",
        Dedup.h60(concat(col("doc_id").cast("string"), lit(":"), col("frame_idx").cast("string"))))
      .transform(Present.sorted(_, "doc_id", "frame_idx"))

  val mm02Sql: String =
    """WITH f AS (
      |  SELECT doc_id, CAST(n_chars % 240 + 1 AS INT) AS n_frames,
      |         unnest(range(0, CAST(n_chars % 240 + 1 AS INT), 10)) AS frame_idx
      |  FROM documents)
      |SELECT doc_id, n_frames, CAST(frame_idx AS INT) AS frame_idx,
      |       CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(frame_idx AS VARCHAR)), 1, 15)) AS BIGINT) AS frame_hash
      |FROM f ORDER BY doc_id, frame_idx""".stripMargin

  // ---------------------------------------------------------------- mm03
  /** Resize planning — the vision-preprocessing step after decode: scale
    * the short side to 224 preserving aspect ratio. Runs as a SECOND
    * batched executor-side stage chained after the decode (the
    * decode→transform pipeline shape); all arithmetic is integer
    * (out = dim·224 ÷ min-side, exact in both engines), and the actual
    * pixel resample is the stubbed codec step — the plumbing (batch
    * shape, chaining, metadata math) is real.
    */
  private val ShortSide = 224

  final case class ResizePlan(
      doc_id: Long, width: Int, height: Int, out_w: Int, out_h: Int,
      out_pixels: Long, upscaled: Int)

  def mm03(s: SparkSession, dir: String): DataFrame = {
    // since r14 (verdict #2): the header dims the resize plan reads are
    // layer columns — serving is pure codegen'd integer column math
    // over the layer scan (no payload re-scan, no typed map)
    val minSide = least(col("meta_w"), col("meta_h")).cast("long")
    val ow = (col("meta_w").cast("long") * ShortSide / minSide).cast("long").cast("int")
    val oh = (col("meta_h").cast("long") * ShortSide / minSide).cast("long").cast("int")
    Present.sorted(
      pixelLayer(s, dir).select(col("doc_id"),
        col("meta_w").as("width"), col("meta_h").as("height"),
        ow.as("out_w"), oh.as("out_h"),
        (ow.cast("long") * oh.cast("long")).as("out_pixels"),
        (minSide < ShortSide).cast("int").as("upscaled")),
      "doc_id")
  }

  /** The PRE-LAYER mm03 (per-query header decode) — see [[mm04Legacy]]. */
  private[graft] def mm03Legacy(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("text"), col("n_chars"))
      .as[(Long, String, String, Long)]
      .map { case (id, src, text, n) => MediaIn(id, src, synthPayload(id, text, n)) }
    media.mapPartitions { it =>
      decodeBatches(it).map { m =>
        val minSide = math.min(m.width, m.height)
        val ow = (m.width.toLong * ShortSide / minSide).toInt
        val oh = (m.height.toLong * ShortSide / minSide).toInt
        ResizePlan(m.doc_id, m.width, m.height, ow, oh,
          ow.toLong * oh, if (minSide < ShortSide) 1 else 0)
      }
    }.toDF().transform(Present.sorted(_, "doc_id"))
  }

  val mm03Sql: String =
    s"""WITH d AS (
      |  SELECT doc_id,
      |         CAST(n_chars * 7 % 1920 + 1 AS INT) AS width,
      |         CAST(n_chars * 13 % 1080 + 1 AS INT) AS height
      |  FROM documents)
      |SELECT doc_id, width, height,
      |       CAST(CAST(width AS BIGINT) * $ShortSide // LEAST(width, height) AS INT) AS out_w,
      |       CAST(CAST(height AS BIGINT) * $ShortSide // LEAST(width, height) AS INT) AS out_h,
      |       CAST((CAST(width AS BIGINT) * $ShortSide // LEAST(width, height))
      |          * (CAST(height AS BIGINT) * $ShortSide // LEAST(width, height)) AS BIGINT) AS out_pixels,
      |       CAST(LEAST(width, height) < $ShortSide AS INT) AS upscaled
      |FROM d ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------- PNG pixel I/O
  /** Standard PNG Paeth predictor (PNG spec §9.4). */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b), math.abs(p - c))
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** A REAL (tool-loadable) PNG carrying deterministic pixels: 8-bit
    * gray/truecolor/RGBA by doc_id mod 3, FIXTURE-SIZED dimensions
    * (4..15 per side — the closed forms below), zlib-deflated IDAT with
    * row filter type y mod 5 (all five PNG filters exercised in every
    * image taller than 4 rows), real CRCs. pixel(x, y, c) =
    * (docId·31 + x·7 + y·13 + c·5) mod 256 — closed-form so the DuckDB
    * oracle can recompute pixel STATISTICS without a decoder, while the
    * Spark side must actually inflate + unfilter to see them.
    *
    * Separate from [[synthPayload]] on purpose: mm01's oracle pins
    * n_bytes exactly, and a deflated IDAT's length has no closed form —
    * the metadata fixture keeps its text body, the pixel fixture is
    * mm04's.
    */
  private[graft] def pngPixelPayload(docId: Long, nChars: Long): Array[Byte] = {
    val w = (nChars * 7 % 12 + 4).toInt
    val h = (nChars * 13 % 12 + 4).toInt
    val colorType = Array(0, 2, 6)((docId % 3).toInt)
    val ch = pngChannels(colorType)
    val stride = w * ch
    val px = Array.tabulate(h * stride) { k =>
      val y = k / stride
      val i = k % stride
      val x = i / ch
      val c = i % ch
      ((docId * 31 + x * 7 + y * 13 + c * 5) % 256).toByte
    }
    // filter each scanline (filter byte + filtered row), type = y mod 5
    val raw = new Array[Byte]((stride + 1) * h)
    for (y <- 0 until h) {
      val t = y % 5
      raw(y * (stride + 1)) = t.toByte
      for (i <- 0 until stride) {
        val x = px(y * stride + i) & 0xFF
        val a = if (i >= ch) px(y * stride + i - ch) & 0xFF else 0
        val b = if (y > 0) px((y - 1) * stride + i) & 0xFF else 0
        val c = if (y > 0 && i >= ch) px((y - 1) * stride + i - ch) & 0xFF else 0
        val enc = t match {
          case 0 => x
          case 1 => x - a
          case 2 => x - b
          case 3 => x - (a + b) / 2
          case 4 => x - paeth(a, b, c)
        }
        raw(y * (stride + 1) + 1 + i) = (enc & 0xFF).toByte
      }
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val buf = new Array[Byte](raw.length + 64)
    val n = defl.deflate(buf)
    defl.end()
    val idat = java.util.Arrays.copyOf(buf, n)
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32()
      crc.update(typ.getBytes("US-ASCII")); crc.update(data)
      val bb = java.nio.ByteBuffer.allocate(12 + data.length)
      bb.putInt(data.length).put(typ.getBytes("US-ASCII")).put(data)
        .putInt(crc.getValue.toInt)
      bb.array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h)
      .put(8.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    PngSig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", idat) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** REAL pixel decode from bytes only — no codec library: walk the
    * chunk stream collecting IDAT segments, zlib-inflate
    * (java.util.zip.Inflater), reverse the per-scanline filter (all
    * five PNG filter types). Returns (w, h, channels, pixels) with
    * pixels row-major, channel-fastest — or None for anything that is
    * not a parseable 8-bit PNG.
    */
  private[graft] def decodePngPixels(p: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] =
    parsePng(p).flatMap { case (w, h, ch, _) =>
      // 8-bit, deflate(0), adaptive-filter(0), NON-interlaced(0) only —
      // an Adam7 stream would unfilter to garbage, so refuse it
      if ((p(24) & 0xFF) != 8 || (p(26) & 0xFF) != 0 ||
          (p(27) & 0xFF) != 0 || (p(28) & 0xFF) != 0) None
      else {
        val idat = new java.io.ByteArrayOutputStream()
        var i = 8
        var end = false
        while (!end && i + 8 <= p.length) {
          val len = beInt(p, i)
          val typ = new String(p, i + 4, 4, "US-ASCII")
          if (typ == "IDAT" && i + 8 + len <= p.length) idat.write(p, i + 8, len)
          if (typ == "IEND") end = true
          i += 12 + len // len + type + data + CRC
        }
        val comp = idat.toByteArray
        val stride = w * ch
        val out = new Array[Byte]((stride + 1) * h)
        val inflated =
          if (comp.isEmpty) false
          else {
            val inf = new java.util.zip.Inflater()
            try {
              inf.setInput(comp)
              var off = 0
              var stuck = false
              while (!inf.finished() && off < out.length && !stuck) {
                val n = inf.inflate(out, off, out.length - off)
                if (n == 0 && (inf.needsInput() || inf.needsDictionary())) stuck = true
                off += n
              }
              off == out.length
            } catch {
              case _: java.util.zip.DataFormatException => false
            } finally inf.end()
          }
        if (!inflated) None
        else {
          val px = new Array[Byte](stride * h)
          var bad = false
          for (y <- 0 until h if !bad) {
            val t = out(y * (stride + 1)) & 0xFF
            for (i2 <- 0 until stride) {
              val x = out(y * (stride + 1) + 1 + i2) & 0xFF
              val a = if (i2 >= ch) px(y * stride + i2 - ch) & 0xFF else 0
              val b = if (y > 0) px((y - 1) * stride + i2) & 0xFF else 0
              val c = if (y > 0 && i2 >= ch) px((y - 1) * stride + i2 - ch) & 0xFF else 0
              val v = t match {
                case 0 => x
                case 1 => x + a
                case 2 => x + b
                case 3 => x + (a + b) / 2
                case 4 => x + paeth(a, b, c)
                case _ => bad = true; 0
              }
              px(y * stride + i2) = (v & 0xFF).toByte
            }
          }
          if (bad) None else Some((w, h, ch, px))
        }
      }
    }

  // ------------------------------------------------------ JPEG pixel I/O
  /** A REAL baseline JPEG carrying deterministic pixels ([[JpegCodec]],
    * r8 verdict #5 — the former codec stub): DC-only 8×8 blocks against
    * an all-8s quant table, so any correct decoder recovers EXACTLY
    * blockvalue = dc + 128 per sample (IDCT of a DC-only block is flat
    * F00/8 = dc, no rounding ambiguity) while the bitstream is real
    * entropy-coded data (Annex K Huffman tables, DC prediction across
    * MCUs, byte stuffing). Component value of block (bx, by):
    * (docId·31 + bx·7 + by·13 + c·5) mod 256 — the PNG fixture's
    * formula family at block granularity, closed-form for the oracle.
    * 1 component (gray) when docId ≡ 0 (mod 3), else 3 (YCbCr → the
    * decoder's fixed-point RGB transform, which the oracle mirrors with
    * FLOOR arithmetic). */
  private[graft] def jpegPixelPayload(docId: Long, nChars: Long): Array[Byte] = {
    val w = (nChars * 7 % 12 + 4).toInt
    val h = (nChars * 13 % 12 + 4).toInt
    val nc = if (docId % 3 == 0) 1 else 3
    JpegCodec.encodeFlatBlocks(w, h, nc,
      (bx, by, c) => ((docId * 31 + bx * 7 + by * 13 + c * 5) % 256).toInt - 128)
  }

  /** Sniff-and-decode: PNG (inflate + unfilter) or baseline JPEG
    * (Huffman + dequant + IDCT + YCbCr→RGB) — both pure JDK. */
  private[graft] def decodePixels(p: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] =
    decodePngPixels(p).orElse(JpegCodec.decodePixels(p))

  // ------------------------------------------------- decoded-pixel layer
  /** One decoded media document, reduced to everything the serving
    * family reads:
    *  - PIXEL half (mm04/mm05): container dimensions/channels, exact
    *    integer pixel sums/extrema (mm04's feature inputs), the
    *    decoded-stream md5 (mm04's consumed fingerprint), and the dHash
    *    halves (mm05's perceptual signature). `decoded=0` marks the
    *    degrade row for an unparseable payload (content_md5 is then the
    *    BODY hash the metadata decoder computes, feeding mm04's
    *    deterministic hash-stub features; the perceptual hash is 0/0 —
    *    such a payload has no pixels to hash).
    *  - METADATA half (mm01/mm03, r13 verdict #2): the header decode of
    *    the metadata container ([[decodeOne]] over the bytes — mime
    *    sniff, header dims/channels, body fingerprint, byte count),
    *    computed once at layer write instead of re-run per serving
    *    query.
    *  - FRAME half (mm02): the sampled per-frame content hashes (every
    *    10th frame), deterministic per doc — one md5 per sampled frame
    *    paid at layer write; serving explodes the array map-side. */
  final case class PixelLayerRow(doc_id: Long, w: Int, h: Int, nc: Int,
      s0: Long, s1: Long, s2: Long, s3: Long, st: Long, mn: Int, mx: Int,
      content_md5: String, phash_hi: Long, phash_lo: Long, decoded: Int,
      mime: String, n_bytes: Long, meta_md5: String, meta_w: Int,
      meta_h: Int, meta_nc: Int, n_pixels: Long, n_frames: Int,
      frame_hashes: Array[Long])

  /** Sampled frame indices of an n-frame clip: 0, 10, ... (mm02's
    * every-10th-frame contract). */
  private def frameHashesOf(id: Long, nFrames: Int): Array[Long] =
    Array.tabulate((nFrames + 9) / 10)(p => h60OfString(s"$id:${p * 10}"))

  private def layerRowOf(id: Long, w: Int, h: Int, ch: Int,
      px: Array[Byte], meta: MediaMeta, nFrames: Int,
      fh: Array[Long]): PixelLayerRow = {
    val sums = new Array[Long](4)
    var tot = 0L
    var mn = 255
    var mx = 0
    var k = 0
    while (k < px.length) {
      val v = px(k) & 0xFF
      sums(k % ch) += v; tot += v
      if (v < mn) mn = v
      if (v > mx) mx = v
      k += 1
    }
    val csv = px.map(_ & 0xFF).mkString(",")
    val md = md5Hex(csv.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val (hi, lo) = dhashHalves(w, h, ch, px)
    PixelLayerRow(id, w, h, ch, sums(0), sums(1), sums(2), sums(3), tot,
      mn, mx, md, hi, lo, 1,
      meta.mime, meta.n_bytes, meta.content_md5, meta.width, meta.height,
      meta.channels, meta.n_pixels, nFrames, fh)
  }

  /** The decoded-pixel BUILT LAYER (r12 verdict #1): before it, mm04 and
    * mm05 each independently re-ran the full per-image JPEG/PNG decode —
    * at sf10 the two decodes were ~49 s of a 392 s bench, the single
    * largest redundant cost on the board. The engine's own DedupPrepare
    * doctrine applies unchanged: the decode is a corpus-level
    * computation, so it runs ONCE at layer-write time (batched,
    * executor-side, zero shuffle — payload bytes never leave the task
    * that generated them) into a doc_id-bucketed parquet table carrying
    * pixel stats + fingerprint + perceptual hash; serving queries are
    * then projections/aggregations over the layer. Fingerprinted,
    * swept, and build-cost-attributed exactly like the shingle layers.
    *
    * At 100 TB the layer is also the right OPERATIONAL shape: raw media
    * bytes are the corpus's dominant storage, and every downstream
    * consumer (feature extraction, perceptual dedup, resize planning)
    * wants the same decode — a decode-once materialization with
    * incremental append (LayerMaintenance's contract) amortizes the one
    * CPU-bound pass across the whole family. */
  private[graft] def pixelLayer(s: SparkSession, dir: String): DataFrame =
    DedupPrepare.ensure(s, "pixels", dir,
      () => {
        import s.implicits._
        Tables.documents(s, dir)
          .select(col("doc_id"), col("text"), col("n_chars"))
          .as[(Long, String, Long)]
          .mapPartitions(pixelLayerRows)
          .toDF()
      },
      Seq("doc_id"), Seq("doc_id"), variant = "_v2")

  /** The per-partition layer-build kernel: decode the pixel payload,
    * header-decode the metadata container, hash the sampled frames —
    * one pass per doc, shared by the corpus build above and
    * [[LayerMaintenance]]'s batch-sized ingest append. */
  private[graft] def pixelLayerRows(
      it: Iterator[(Long, String, Long)]): Iterator[PixelLayerRow] =
    it.grouped(DecodeBatch).flatMap(_.map { case (id, text, n) =>
      val meta = decodeOne(MediaIn(id, "", synthPayload(id, text, n)))
      val nFrames = (n % 240 + 1).toInt
      val fh = frameHashesOf(id, nFrames)
      val payload = if (id % 2 == 0) pngPixelPayload(id, n)
                    else jpegPixelPayload(id, n)
      decodePixels(payload) match {
        case Some((w, h, ch, px)) =>
          layerRowOf(id, w, h, ch, px, meta, nFrames, fh)
        case None =>
          val bodyMd5 =
            decodeBatches(Iterator(MediaIn(id, "", payload)))
              .next().content_md5
          PixelLayerRow(id, 0, 0, 0, 0L, 0L, 0L, 0L, 0L, 0, 0,
            bodyMd5, 0L, 0L, 0,
            meta.mime, meta.n_bytes, meta.content_md5, meta.width,
            meta.height, meta.channels, meta.n_pixels, nFrames, fh)
      }
    })

  // ---------------------------------------------------------------- mm04
  /** Feature extraction — REAL pixel statistics for BOTH containers
    * (r8 verdict #5 retired the JPEG stub):
    *  - even doc_ids carry [[pngPixelPayload]] (a real PNG), decoded by
    *    inflate + unfilter;
    *  - odd doc_ids carry [[jpegPixelPayload]] (a real baseline JPEG),
    *    decoded by [[JpegCodec]] — Huffman, dequant, IDCT, fixed-point
    *    YCbCr→RGB.
    * Features from the decoded pixels: f0..f3 per-channel means, f4
    * overall mean, f5/f6 min/max (all exact integer sums, one final
    * IEEE division, so the closed-form oracle agrees bit-for-bit), f7
    * the ENCODER head dim — since r9 a real forward pass in the ta13
    * weights-as-data shape: a quantized linear projection (weights from
    * the [[encWeights]] parquet model artifact, loaded driver-side and
    * shipped in the closure) over the integer-exact decoded-pixel
    * feature vector, sigmoid'd and 1e-9-gridded. content_md5
    * fingerprints what the stage actually consumed: the DECODED pixel
    * stream (as a comma-joined int string both engines can construct) —
    * a decode bug upstream fails the hash. An unparseable payload
    * (neither container) degrades to the deterministic hash-stub row.
    */
  private val FeatureDims = 8

  /** Input dimension of the encoder head: the projection reads the
    * 8-long integer feature vector [m0..m3 per-channel milli-means,
    * m4 overall milli-mean, m5/m6 milli-min/max, bias 1000] — every
    * element an exact floorDiv of the decoder's integer sums, so the
    * weighted sum is exact long arithmetic in both engines. */
  private[operators] val EncDims = 8

  /** The encoder-head weight table as a BUILT ARTIFACT (same contract
    * as ta13's `clfw`, closing the last weights-requiring stub): (dim
    * INT, w_milli LONG), exactly [[EncDims]] rows in a parquet model
    * layer. A real trained encoder head (e.g. a CLIP-style linear probe
    * over image statistics, milli-quantized) drops into this table
    * without touching the serving plan — [[mm04With]] is the spec-pinned
    * swap hook. The shipped FIXTURE weights are a deterministic
    * synthetic export, `w_milli(d) = h60("enc:" + d) mod 2001 − 1000`,
    * so the DuckDB oracle regenerates the table in closed form.
    */
  private[operators] def encWeights(s: SparkSession, dir: String): DataFrame =
    DedupPrepare.ensure(s, "encw", dir,
      () => s.range(0, EncDims.toLong)
        .select(col("id").cast("int").as("dim"),
          (Dedup.h60(concat(lit("enc:"), col("id").cast("string"))) % 2001L - 1000L)
            .as("w_milli")),
      Seq("dim"), Seq("dim"), variant = s"_d$EncDims")

  private def h60OfString(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 15 hex chars, same contract as Dedup.h60
    var v = 0L
    var j = 0
    while (j < 7) { v = (v << 8) | (d(j) & 0xFFL); j += 1 }
    (v << 4) | ((d(7) >> 4) & 0xFL)
  }

  final case class MediaFeatures(doc_id: Long, content_md5: String,
      f0: Float, f1: Float, f2: Float, f3: Float,
      f4: Float, f5: Float, f6: Float, f7: Float)

  def mm04(s: SparkSession, dir: String): DataFrame =
    mm04With(s, dir, encWeights(s, dir))

  /** [[mm04]] against an explicit encoder-head weight table — the swap
    * hook: the spec feeds an alternative (dim, w_milli) relation and
    * pins that f7 changes while f0..f6, content_md5, and the plan shape
    * do not.
    *
    * Since the decoded-pixel layer landed (r12 verdict #1), serving is
    * a pure map over [[pixelLayer]]: the integer sums/extrema the
    * features derive from were computed once at layer-write time, and
    * this query pays only the final double divisions + the encoder
    * head's exact-long weighted sum. The decode itself never re-runs. */
  private[graft] def mm04With(s: SparkSession, dir: String,
      weights: DataFrame): DataFrame = {
    import s.implicits._
    // model load (EncDims rows — the head's whole parameter set), shipped
    // executor-side inside the map closure: serving adds zero joins
    val wEnc = new Array[Long](EncDims)
    weights.select(col("dim"), col("w_milli")).collect()
      .foreach(r => wEnc(r.getInt(0)) = r.getLong(1))
    pixelLayer(s, dir).as[PixelLayerRow].map(r => featuresOf(r, wEnc))
      .toDF().transform(Present.sorted(_, "doc_id"))
  }

  /** Feature row from a decoded-pixel layer row + the encoder-head
    * weights — shared by the layer serving plan and [[mm04Legacy]]. */
  private def featuresOf(r: PixelLayerRow, wEnc: Array[Long]): MediaFeatures =
    if (r.decoded == 0) {
      // unparseable payload (neither container decoded at layer-build
      // time): the deterministic hash-stub fallback off the body hash
      val f = Array.tabulate(FeatureDims) { j =>
        ((h60OfString(s"${r.content_md5}:$j") % 1000L) / 1000.0).toFloat
      }
      MediaFeatures(r.doc_id, r.content_md5,
        f(0), f(1), f(2), f(3), f(4), f(5), f(6), f(7))
    } else {
      // REAL path: features off the layer's exact integer sums — one
      // double division each, float cast (portable, oracle-exact)
      val (ch, n) = (r.nc, r.w * r.h)
      val sums = Array(r.s0, r.s1, r.s2, r.s3)
      def chMean(c: Int): Float =
        if (c < ch) (sums(c).toDouble / (n * 255.0)).toFloat else 0f
      // the ENCODER head: exact-integer feature vector (floorDiv of
      // the layer's sums — milli-means/min/max + bias), then the
      // weighted sum in exact longs, ONE transcendental (sigmoid)
      // re-gridded at 1e-9 (Dedup.gridL's floor(p+0.5) form, = DuckDB
      // ROUND) — no float-order or engine skew
      val xs = new Array[Long](EncDims)
      var c = 0
      while (c < 4) {
        xs(c) = if (c < ch) Math.floorDiv(sums(c) * 1000L, n.toLong * 255L)
                else 0L
        c += 1
      }
      xs(4) = Math.floorDiv(r.st * 1000L, n.toLong * ch * 255L)
      xs(5) = Math.floorDiv(r.mn * 1000L, 255L)
      xs(6) = Math.floorDiv(r.mx * 1000L, 255L)
      xs(7) = 1000L
      var sm = 0L
      var d = 0
      while (d < EncDims) { sm += wEnc(d) * xs(d); d += 1 }
      val sig = 1.0 / (1.0 + Math.exp(-(sm.toDouble / 1e6)))
      MediaFeatures(r.doc_id, r.content_md5,
        chMean(0), chMean(1), chMean(2), chMean(3),
        (r.st.toDouble / (n.toLong * ch * 255.0)).toFloat,
        (r.mn.toDouble / 255.0).toFloat, (r.mx.toDouble / 255.0).toFloat,
        (Math.floor(sig * 1e9 + 0.5) / 1e9).toFloat)
    }

  /** The PRE-LAYER mm04 serving plan (decode re-run inside the query),
    * kept for the same-box A/B that justified the decoded-pixel layer —
    * the [[graft.operators.TextAnalysis.gateDfLegacy]] discipline:
    * adoption evidence stays executable. Not registered in [[qs]]. */
  private[graft] def mm04Legacy(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wEnc = new Array[Long](EncDims)
    encWeights(s, dir).select(col("dim"), col("w_milli")).collect()
      .foreach(r => wEnc(r.getInt(0)) = r.getLong(1))
    Tables.documents(s, dir)
      .select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        it.grouped(DecodeBatch).flatMap(_.map { case (id, n) =>
          val payload = if (id % 2 == 0) pngPixelPayload(id, n)
                        else jpegPixelPayload(id, n)
          val Some((w, h, ch, px)) = decodePixels(payload)
          // metadata/frame halves unused by featuresOf — dummy them
          val r = layerRowOf(id, w, h, ch, px,
            MediaMeta(id, "", 0L, "", 0, 0, 0, 0L), 0, Array.empty)
          featuresOf(r, wEnc)
        })
      }.toDF().transform(Present.sorted(_, "doc_id"))
  }

  /** The PRE-LAYER mm05 (decode re-run + Present.pooled); see
    * [[mm04Legacy]]. */
  private[graft] def mm05Legacy(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hashes = Present.pooled(Tables.documents(s, dir)
      .select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
      .map { case (id, n) =>
        val payload = if (id % 2 == 0) pngPixelPayload(id, n)
                      else jpegPixelPayload(id, n)
        val Some((w, h, ch, px)) = decodePixels(payload)
        val (hi, lo) = dhashHalves(w, h, ch, px)
        (id, hi, lo)
      }.toDF("doc_id", "phash_hi", "phash_lo"))
    val groups = hashes.groupBy(col("phash_hi"), col("phash_lo"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("group_n"))
    hashes.join(groups, Seq("phash_hi", "phash_lo"))
      .select(col("doc_id"), col("phash_hi"), col("phash_lo"),
        col("keeper_id"), col("group_n"),
        (col("doc_id") =!= col("keeper_id")).cast("int").as("is_dup"))
      .orderBy("doc_id")
  }

  /** Closed-form decoded-JPEG component value of pixel (x, y): the
    * fixture's per-block DC formula at block coords (x//8, y//8). */
  private def jvSql(c: Int): String =
    s"(doc_id * 31 + (x // 8) * 7 + (y // 8) * 13 + $c * 5) % 256"

  /** Fixed-point YCbCr→RGB, mirroring JpegCodec.ycc2rgb exactly:
    * floorDiv = FLOOR(x / 65536.0) (all operands < 2^24, double-exact). */
  private def rgbSql(ch: Int): String = {
    val (y, cb, cr) = (jvSql(0), jvSql(1), jvSql(2))
    val raw = ch match {
      case 0 => s"$y + CAST(FLOOR((91881 * ($cr - 128) + 32768) / 65536.0) AS BIGINT)"
      case 1 => s"$y - CAST(FLOOR((22554 * ($cb - 128) + 46802 * ($cr - 128) + 32768) / 65536.0) AS BIGINT)"
      case 2 => s"$y + CAST(FLOOR((116130 * ($cb - 128) + 32768) / 65536.0) AS BIGINT)"
    }
    s"LEAST(255, GREATEST(0, $raw))"
  }

  /** Closed-form fixture weight `d` of the `encw` model artifact — the
    * oracle regenerates the weight TABLE's fixture formula, exactly as
    * ta13's oracle does for `clfw`. */
  private def encwSql(d: Int): String =
    s"(CAST(concat('0x', substr(md5('enc:$d'), 1, 15)) AS BIGINT) % 2001 - 1000)"

  /** The encoder head's exact-long weighted sum over the integer feature
    * vector (milli-means via floor division of the pixel sums — `//` on
    * positives = Math.floorDiv — plus bias 1000), against [[encwSql]]
    * fixture weights. Evaluated on the oracle's `agg` CTE columns. */
  private val encMarginSql: String = {
    def m(c: Int) =
      s"CASE WHEN nc > $c THEN CAST((s$c * 1000) // (CAST(w AS BIGINT) * h * 255) AS BIGINT) ELSE 0 END"
    val xs = Seq(m(0), m(1), m(2), m(3),
      s"CAST((st * 1000) // (CAST(w AS BIGINT) * h * nc * 255) AS BIGINT)",
      "(mn * 1000) // 255", "(mx * 1000) // 255", "1000")
    xs.zipWithIndex.map { case (x, d) => s"${encwSql(d)} * ($x)" }.mkString(" + ")
  }

  val mm04Sql: String =
    // regenerate the pixel FORMULAS (the Spark side had to really decode
    // the bytes — inflate+unfilter for PNG, Huffman+IDCT(+YCbCr) for
    // JPEG — to see the same values)
    s"""WITH de AS (
       |  SELECT doc_id,
       |         CAST(n_chars * 7 % 12 + 4 AS INT) AS w,
       |         CAST(n_chars * 13 % 12 + 4 AS INT) AS h,
       |         CAST(CASE WHEN doc_id % 2 = 0
       |              THEN CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END
       |              ELSE CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 3 END
       |              END AS INT) AS nc
       |  FROM documents),
       |xs AS (SELECT CAST(unnest(range(0, 16)) AS INT) AS x),
       |ys AS (SELECT CAST(unnest(range(0, 16)) AS INT) AS y),
       |cs AS (SELECT CAST(unnest(range(0, 4)) AS INT) AS c),
       |pxe AS (SELECT doc_id, w, h, nc, x, y, c,
       |               CASE WHEN doc_id % 2 = 0
       |                    THEN (doc_id * 31 + x * 7 + y * 13 + c * 5) % 256
       |                    WHEN nc = 1 THEN ${jvSql(0)}
       |                    WHEN c = 0 THEN ${rgbSql(0)}
       |                    WHEN c = 1 THEN ${rgbSql(1)}
       |                    ELSE ${rgbSql(2)} END AS v
       |        FROM de JOIN xs ON x < w JOIN ys ON y < h JOIN cs ON c < nc),
       |agg AS (SELECT doc_id, ANY_VALUE(w) AS w, ANY_VALUE(h) AS h,
       |               ANY_VALUE(nc) AS nc,
       |               string_agg(CAST(v AS VARCHAR), ',' ORDER BY y, x, c) AS csv,
       |               SUM(CASE WHEN c = 0 THEN v END) AS s0,
       |               SUM(CASE WHEN c = 1 THEN v END) AS s1,
       |               SUM(CASE WHEN c = 2 THEN v END) AS s2,
       |               SUM(CASE WHEN c = 3 THEN v END) AS s3,
       |               SUM(v) AS st, MIN(v) AS mn, MAX(v) AS mx
       |        FROM pxe GROUP BY doc_id)
       |SELECT doc_id, md5(csv) AS content_md5,
       |       CAST(CAST(s0 AS DOUBLE) / (w * h * 255.0) AS REAL) AS f0,
       |       CAST(COALESCE(CAST(s1 AS DOUBLE) / (w * h * 255.0), 0.0) AS REAL) AS f1,
       |       CAST(COALESCE(CAST(s2 AS DOUBLE) / (w * h * 255.0), 0.0) AS REAL) AS f2,
       |       CAST(COALESCE(CAST(s3 AS DOUBLE) / (w * h * 255.0), 0.0) AS REAL) AS f3,
       |       CAST(CAST(st AS DOUBLE) / (CAST(w AS BIGINT) * h * nc * 255.0) AS REAL) AS f4,
       |       CAST(CAST(mn AS DOUBLE) / 255.0 AS REAL) AS f5,
       |       CAST(CAST(mx AS DOUBLE) / 255.0 AS REAL) AS f6,
       |       CAST(CAST(CAST(ROUND((1.0 / (1.0 + exp(-(CAST(($encMarginSql) AS DOUBLE) / 1e6)))) * 1e9) AS BIGINT) AS DOUBLE) / 1e9 AS REAL) AS f7
       |FROM agg ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- mm05
  /** Perceptual-hash image dedup — the LAION-style pass: decode each
    * image FOR REAL ([[decodePixels]]: PNG inflate + unfilter, baseline
    * JPEG Huffman + IDCT + YCbCr→RGB — r9 extended the pass to the JPEG
    * half of the corpus when [[JpegCodec]] retired the codec stub),
    * compute a 64-bit difference-hash (dHash) from the decoded pixels,
    * and drop exact pHash matches (keeper = min doc_id per hash, dd01's
    * contract on a perceptual rather than byte signature).
    *
    * dHash here SAMPLES the 9×8 luma grid (`x_i = i·w/9`, `y_j = j·h/8`,
    * integer division; luma = integer mean of the first min(ch,3)
    * channels) instead of area-averaging the downscale — every
    * operation stays exact integer arithmetic, so the Spark value from
    * DECODED BYTES and the oracle's closed-form pixel regeneration
    * agree bit-for-bit (area-averaging would too, but at 4-16 px
    * fixture sizes sampling ≡ the standard algorithm's shape while
    * keeping the oracle's point lookups linear). The 64 bits are packed
    * as two 32-bit halves (rows 0-3 → lo, rows 4-7 → hi): bit 63 of a
    * single BIGINT pack would flip its sign, and signed-shift overflow
    * is exactly the kind of cross-engine edge the grid rules exist to
    * avoid.
    *
    * Scale posture: the dHash is computed once at [[pixelLayer]] write
    * time (map-side, off the decoded pixels mm04's features also read);
    * serving projects the layer's hash columns and runs keeper/size via
    * groupBy(hash) + join-back — dd01's shape, skew-safe under
    * million-member dup groups. A Hamming-banded near-dup
    * variant composes with dd06's chunk machinery; the exact-match pass
    * is what LAION-5B actually deduped on.
    */
  private[graft] def dhashHalves(w: Int, h: Int, ch: Int,
      px: Array[Byte]): (Long, Long) = {
    val cmin = math.min(ch, 3)
    def lum(x: Int, y: Int): Int = {
      var s = 0
      var c = 0
      while (c < cmin) { s += px((y * w + x) * ch + c) & 0xFF; c += 1 }
      s / cmin
    }
    var lo = 0L
    var hi = 0L
    for (j <- 0 until 8; i <- 0 until 8) {
      val y = j * h / 8
      val b = if (lum((i + 1) * w / 9, y) > lum(i * w / 9, y)) 1L else 0L
      if (j < 4) lo |= b << (j * 8 + i)
      else hi |= b << ((j - 4) * 8 + i)
    }
    (hi, lo)
  }

  def mm05(s: SparkSession, dir: String): DataFrame = {
    // since the decoded-pixel layer (r12 verdict #1): the perceptual
    // hash is a LAYER COLUMN — the decode mm05 used to re-run (and the
    // Present.pooled persist that kept it from running twice) is gone;
    // both sides of the keeper join-back below are cheap projections of
    // the bucketed layer table
    // decoded=0 degrade rows carry the (0,0) sentinel hash — without the
    // filter, unparseable payloads would silently form one shared dup
    // group of unrelated docs (the pre-layer plan failed loudly instead);
    // unreachable with the synthetic payloads, latent trap (r13 ADVICE)
    val hashes = pixelLayer(s, dir).filter(col("decoded") === 1)
      .select(col("doc_id"), col("phash_hi"), col("phash_lo"))
    // keeper/size via groupBy + join-back, NOT min/count over
    // Window.partitionBy(phash) — a boilerplate/blank image's dup group
    // (10⁶+ members in web image corpora) must partial-aggregate
    // map-side instead of landing in one window task (dd01's rule)
    val groups = hashes.groupBy(col("phash_hi"), col("phash_lo"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("group_n"))
    hashes.join(groups, Seq("phash_hi", "phash_lo"))
      .select(col("doc_id"), col("phash_hi"), col("phash_lo"),
        col("keeper_id"), col("group_n"),
        (col("doc_id") =!= col("keeper_id")).cast("int").as("is_dup"))
      .orderBy("doc_id")
  }

  val mm05Sql: String = {
    // closed-form pixel luma (the Spark side had to decode real bytes):
    // PNG = per-pixel formula over min(nc, 3) channels; JPEG = the
    // per-block DC formula, through the fixed-point RGB transform for
    // 3-component streams (mirrors JpegCodec.ycc2rgb)
    def pv(x: String, y: String, c: Int) =
      s"(doc_id * 31 + ($x) * 7 + ($y) * 13 + $c * 5) % 256"
    def jv(x: String, y: String, c: Int) =
      s"(doc_id * 31 + (($x) // 8) * 7 + (($y) // 8) * 13 + $c * 5) % 256"
    def jrgb(x: String, y: String, ch: Int): String = {
      val (yy, cb, cr) = (jv(x, y, 0), jv(x, y, 1), jv(x, y, 2))
      val raw = ch match {
        case 0 => s"$yy + CAST(FLOOR((91881 * ($cr - 128) + 32768) / 65536.0) AS BIGINT)"
        case 1 => s"$yy - CAST(FLOOR((22554 * ($cb - 128) + 46802 * ($cr - 128) + 32768) / 65536.0) AS BIGINT)"
        case 2 => s"$yy + CAST(FLOOR((116130 * ($cb - 128) + 32768) / 65536.0) AS BIGINT)"
      }
      s"LEAST(255, GREATEST(0, $raw))"
    }
    def lum(x: String, y: String) =
      s"""CASE WHEN doc_id % 2 = 0 THEN
         |  (CASE WHEN nc = 1 THEN ${pv(x, y, 0)}
         |        ELSE (${pv(x, y, 0)} + ${pv(x, y, 1)} + ${pv(x, y, 2)}) // 3 END)
         |WHEN nc = 1 THEN ${jv(x, y, 0)}
         |ELSE (${jrgb(x, y, 0)} + ${jrgb(x, y, 1)} + ${jrgb(x, y, 2)}) // 3 END"""
        .stripMargin.replace("\n", " ")
    s"""WITH de AS (
       |  SELECT doc_id,
       |         CAST(n_chars * 7 % 12 + 4 AS INT) AS w,
       |         CAST(n_chars * 13 % 12 + 4 AS INT) AS h,
       |         CAST(CASE WHEN doc_id % 2 = 0
       |              THEN CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END
       |              ELSE CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 3 END
       |              END AS INT) AS nc
       |  FROM documents),
       |ij AS (SELECT CAST(a.i AS INT) AS i, CAST(b.j AS INT) AS j
       |       FROM (SELECT unnest(range(0, 8)) AS i) a,
       |            (SELECT unnest(range(0, 8)) AS j) b),
       |bits AS (SELECT doc_id, i, j,
       |                CASE WHEN (${lum("(i + 1) * w // 9", "j * h // 8")})
       |                        > (${lum("i * w // 9", "j * h // 8")})
       |                     THEN 1 ELSE 0 END AS b
       |         FROM de, ij),
       |ph AS (SELECT doc_id,
       |              CAST(SUM(CASE WHEN j >= 4 THEN b * (1::BIGINT << ((j - 4) * 8 + i)) ELSE 0 END) AS BIGINT) AS phash_hi,
       |              CAST(SUM(CASE WHEN j < 4 THEN b * (1::BIGINT << (j * 8 + i)) ELSE 0 END) AS BIGINT) AS phash_lo
       |       FROM bits GROUP BY doc_id)
       |SELECT doc_id, phash_hi, phash_lo,
       |       MIN(doc_id) OVER (PARTITION BY phash_hi, phash_lo) AS keeper_id,
       |       COUNT(*) OVER (PARTITION BY phash_hi, phash_lo) AS group_n,
       |       CAST(doc_id <> MIN(doc_id) OVER (PARTITION BY phash_hi, phash_lo) AS INT) AS is_dup
       |FROM ph ORDER BY doc_id""".stripMargin
  }

  /** Registry of this family. */
  val qs: Seq[Q] = Seq(
    Q("mm01_media_decode_meta", "binary payload → batched typed decode (stub codec)", mm01, Some(mm01Sql)),
    Q("mm02_frame_sample", "every-10th-frame sampling with per-frame hash", mm02, Some(mm02Sql)),
    Q("mm03_resize_plan", "aspect-preserving short-side-224 resize planning", mm03, Some(mm03Sql)),
    Q("mm04_feature_extract", "real PNG+JPEG pixel decode stats + encoder-head projection (weights-as-data)", mm04, Some(mm04Sql)),
    Q("mm05_phash_dedup", "decoded-pixel dHash + exact perceptual-hash dedup (LAION-style)", mm05, Some(mm05Sql)),
  )
}
