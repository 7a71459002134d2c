package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (extension tier): image/audio/video travel as
  * opaque `binary` columns with a typed metadata struct; decode / feature
  * extraction runs as a batched per-partition stage.
  *
  * Five decode paths are REAL, all pure JVM (no external codec library):
  * `decodeWav` parses RIFF/WAVE (PCM 16-bit) headers and samples,
  * `decodeBmp` parses 24-bit Windows bitmaps, `decodePng` parses
  * 8-bit RGB/RGBA PNGs (zlib IDAT inflated with the JDK's Inflater, all
  * five row filters defiltered), `decodeGif` parses GIF87a/89a
  * (hand-rolled GIF-LZW, 4-pass interlace, local/global palettes,
  * first frame of animations), and `decodeJpeg` rides the JDK's bundled
  * ImageIO decoder (the one family where a hand parser is out of
  * scope). Anything else falls back to the
  * clearly-marked deterministic fake (`fakeDecodeFeatures`'s byte-pair
  * hash), so the dispatch is honest: real where a pure-JVM decoder exists,
  * labeled stand-in elsewhere. Everything around the codec is real and
  * tested either way: the schema contract, the binary+metadata column
  * shapes, the batched mapPartitions execution (the JVM analog of
  * arrow-batched UDFs), and the partitioning behavior.
  *
  * Scale posture: media blobs dominate row size — the decode stage must
  * (a) run after column pruning so only (key, media) ship, (b) never
  * shuffle blobs (mapPartitions preserves partitioning), and (c) emit
  * compact features so downstream aggs shuffle features, not bytes.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", IntegerType))))))

  /** Synthesize a media table from `documents`: the binary payload is the
    * md5 digest bytes of the text (deterministic stand-in for real bytes),
    * metadata derived from doc properties. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      unhex(md5(col("text"))).as("media"),
      struct(
        when(col("doc_id") % 2 === 0, "png").otherwise("wav").as("format"),
        (lit(16) + pmod(col("n_chars"), lit(64))).cast("int").as("width"),
        (lit(16) + pmod(col("n_chars") * 7, lit(64))).cast("int").as("height"),
        (pmod(col("doc_id"), lit(8)) + 1).cast("int").as("n_frames")).as("meta"))

  // --- real pure-JVM WAV codec ---------------------------------------------

  /** Decoded PCM audio: sample rate in Hz, interleaved 16-bit samples. */
  final case class Wav(sampleRate: Int, channels: Int, bitsPerSample: Int,
                       samples: Array[Short])

  /** Parse a RIFF/WAVE container (canonical chunk layout per the public
    * WAVE format spec): walk the chunk list, read `fmt ` (PCM format tag,
    * channel count, sample rate, bits per sample), then decode the `data`
    * chunk's little-endian 16-bit samples. Returns None for anything that
    * is not uncompressed 16-bit PCM — callers fall back to the labeled
    * stand-in, never to garbage. Tolerates trailing chunks (LIST, fact)
    * and odd-size chunk padding; truncated data chunks decode the bytes
    * actually present (a torn object-store read should degrade, not
    * throw). */
  def decodeWav(bytes: Array[Byte]): Option[Wav] = {
    if (bytes == null || bytes.length < 44) return None
    def u8(i: Int): Int = bytes(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long =
      u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) |
        (u8(i + 3).toLong << 24)
    def tag(i: Int): String = new String(bytes, i, 4, "US-ASCII")
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var pos = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // (format, channels, rate, bits)
    var out: Option[Wav] = None
    while (pos + 8 <= bytes.length && out.isEmpty) {
      val id = tag(pos)
      val sz = math.min(le32(pos + 4), Int.MaxValue.toLong).toInt
      val body = pos + 8
      if (id == "fmt " && body + 16 <= bytes.length)
        fmt = Some((le16(body), le16(body + 2), le32(body + 4).toInt, le16(body + 14)))
      else if (id == "data") fmt.foreach { case (af, ch, rate, bits) =>
        if (af == 1 && bits == 16 && ch >= 1 && rate > 0) {
          val n = math.max(0, math.min(sz, bytes.length - body)) / 2
          val samples = new Array[Short](n)
          var i = 0
          while (i < n) {
            // low byte unsigned, high byte signed — that IS little-endian s16
            samples(i) = (u8(body + 2 * i) | (bytes(body + 2 * i + 1) << 8)).toShort
            i += 1
          }
          out = Some(Wav(rate, ch, bits, samples))
        }
      }
      // chunks pad to even length; advance in Long and clamp — a corrupt
      // 32-bit chunk size near MaxValue would overflow an Int advance
      // into a NEGATIVE pos that passes the loop guard and crashes the
      // tag read (found by the hostile-bytes fuzz spec)
      val next = body.toLong + sz + (sz & 1)
      pos = if (next > bytes.length) bytes.length else next.toInt
    }
    out
  }

  /** Features of a decoded signal, `dim` floats: [n_samples, sample_rate,
    * RMS amplitude, zero-crossing count] then (dim-4) per-band mean
    * absolute amplitudes over equal sample bands — the classic cheap
    * audio descriptor set. Sequential per-row loop: deterministic by
    * construction (no distributed fold touches these doubles). */
  def wavFeatures(w: Wav, dim: Int): Array[Float] = {
    val s = w.samples
    val n = s.length
    var sumSq = 0.0
    var zc = 0
    var i = 0
    while (i < n) {
      val v = s(i).toDouble
      sumSq += v * v
      if (i > 0 && ((s(i - 1) < 0) != (s(i) < 0))) zc += 1
      i += 1
    }
    val rms = if (n == 0) 0.0 else math.sqrt(sumSq / n)
    val head = Array(n.toFloat, w.sampleRate.toFloat, rms.toFloat, zc.toFloat)
    if (dim <= 4) head.take(dim)
    else head ++ Array.tabulate(dim - 4) { b =>
      val lo = (b.toLong * n / (dim - 4)).toInt
      val hi = ((b + 1).toLong * n / (dim - 4)).toInt
      if (hi <= lo) 0.0f
      else {
        var acc = 0L
        var j = lo
        while (j < hi) { acc += math.abs(s(j).toInt); j += 1 }
        (acc.toDouble / (hi - lo)).toFloat
      }
    }
  }

  // --- real pure-JVM BMP codec ---------------------------------------------

  /** Decoded bitmap: packed 0xRRGGBB pixels, row-major TOP-DOWN (the
    * decoder un-flips BMP's default bottom-up row order). */
  final case class Bmp(width: Int, height: Int, bitsPerPixel: Int,
                       pixels: Array[Int])

  /** Parse a BMP (Windows bitmap) container from the public format
    * layout: 14-byte file header (`BM`, data offset), BITMAPINFOHEADER
    * (width, signed height — negative means top-down — planes, bits per
    * pixel, compression), then pixel rows padded to 4-byte boundaries,
    * 24-bit BGR. Returns None for anything but uncompressed 24-bit
    * (callers fall back to the labeled stand-in); truncated pixel data
    * decodes to black pixels rather than throwing (degrade, not die).
    * Dimensions are capped at 16M pixels so a hostile header cannot
    * allocate unbounded memory on an executor. */
  def decodeBmp(bytes: Array[Byte]): Option[Bmp] = {
    if (bytes == null || bytes.length < 54) return None
    def u8(i: Int): Int = bytes(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Int =
      u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    if (bytes(0) != 'B' || bytes(1) != 'M') return None
    val dataOffset = le32(10)
    val dibSize = le32(14)
    if (dibSize < 40) return None // BITMAPCOREHEADER etc. not supported
    val width = le32(18)
    val rawH = le32(22)
    val topDown = rawH < 0
    val height = math.abs(rawH)
    val bpp = le16(28)
    val compression = le32(30)
    if (width <= 0 || height <= 0 || bpp != 24 || compression != 0 ||
        width.toLong * height > (1L << 24) || dataOffset < 54) return None
    val rowSize = (width * 3 + 3) & ~3 // rows pad to 4-byte boundaries
    val pixels = new Array[Int](width * height)
    var row = 0
    while (row < height) {
      val srcRow = if (topDown) row else height - 1 - row
      val base = dataOffset + srcRow.toLong * rowSize
      var x = 0
      while (x < width) {
        val i = base + x * 3
        if (i + 2 < bytes.length) {
          val b = u8(i.toInt); val g = u8(i.toInt + 1); val r = u8(i.toInt + 2)
          pixels(row * width + x) = (r << 16) | (g << 8) | b
        } // else: truncated payload → pixel stays 0 (black)
        x += 1
      }
      row += 1
    }
    Some(Bmp(width, height, bpp, pixels))
  }

  /** Features of a decoded bitmap, `dim` floats: [width, height, mean
    * luma (integer BT.601 weights — deterministic), mean R] then (dim-4)
    * per-band mean lumas over equal horizontal strips (the cheap image
    * descriptor set mirroring wavFeatures' shape). */
  def bmpFeatures(b: Bmp, dim: Int): Array[Float] = {
    val n = b.pixels.length
    def luma(p: Int): Long =
      (((p >> 16) & 0xff) * 299L + ((p >> 8) & 0xff) * 587L + (p & 0xff) * 114L) / 1000L
    var sumL = 0L
    var sumR = 0L
    var i = 0
    while (i < n) { sumL += luma(b.pixels(i)); sumR += (b.pixels(i) >> 16) & 0xff; i += 1 }
    val head = Array(b.width.toFloat, b.height.toFloat,
      if (n == 0) 0.0f else (sumL.toDouble / n).toFloat,
      if (n == 0) 0.0f else (sumR.toDouble / n).toFloat)
    if (dim <= 4) head.take(dim)
    else head ++ Array.tabulate(dim - 4) { band =>
      val lo = (band.toLong * b.height / (dim - 4)).toInt
      val hi = ((band + 1).toLong * b.height / (dim - 4)).toInt
      if (hi <= lo) 0.0f
      else {
        var acc = 0L
        var j = lo * b.width
        val end = hi * b.width
        while (j < end) { acc += luma(b.pixels(j)); j += 1 }
        (acc.toDouble / (end - lo * b.width)).toFloat
      }
    }
  }

  // --- real pure-JVM PNG codec ---------------------------------------------

  /** Parse a PNG from the public format layout (the PNG spec / RFC 2083):
    * 8-byte signature, then length-typed chunks — IHDR (dims, bit depth,
    * color type), concatenated IDAT zlib streams (inflated with the JDK's
    * `Inflater` — no external codec), IEND. Supports the canonical web
    * case: 8-bit depth, color type 2 (RGB) or 6 (RGBA; alpha dropped),
    * no interlace. Rows are defiltered per the five standard per-row
    * filter types (None/Sub/Up/Average/Paeth). Returns the same packed
    * top-down 0xRRGGBB `Bmp` record the BMP path yields — a decoded PNG
    * IS a bitmap; `bitsPerPixel` records the source channel width
    * (24/32). Anything else (16-bit, palette, grayscale, interlaced,
    * truncated, hostile dims) → None and the caller falls back to the
    * labeled stand-in. Chunk CRCs are not verified (degrade, not die —
    * same policy as decodeBmp's truncated-payload path); dimensions are
    * capped at 16M pixels like decodeBmp. */
  def decodePng(bytes: Array[Byte]): Option[Bmp] = {
    if (bytes == null || bytes.length < 45) return None // sig + IHDR + IEND
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    var s = 0
    while (s < 8) { if ((bytes(s) & 0xff) != sig(s)) return None; s += 1 }
    def u8(p: Int): Int = bytes(p) & 0xff
    def be32(p: Int): Long =
      (u8(p).toLong << 24) | (u8(p + 1) << 16) | (u8(p + 2) << 8) | u8(p + 3)
    var width = 0; var height = 0; var colorType = -1
    val idat = new java.io.ByteArrayOutputStream()
    var p = 8
    var done = false
    while (!done && p + 12 <= bytes.length) {
      val len = be32(p)
      if (len > bytes.length - p - 12) return None
      val typ = new String(bytes, p + 4, 4, "US-ASCII")
      val dp = p + 8
      typ match {
        case "IHDR" =>
          if (len != 13) return None
          width = be32(dp).toInt; height = be32(dp + 4).toInt
          colorType = u8(dp + 9)
          if (u8(dp + 8) != 8 || (colorType != 2 && colorType != 6) ||
              u8(dp + 10) != 0 || u8(dp + 11) != 0 || u8(dp + 12) != 0 ||
              width <= 0 || height <= 0 ||
              width.toLong * height > (1L << 24)) return None
        case "IDAT" => idat.write(bytes, dp, len.toInt)
        case "IEND" => done = true
        case _ => () // ancillary chunk: skip
      }
      p = dp + len.toInt + 4 // data + CRC
    }
    if (!done || colorType < 0 || idat.size() == 0) return None
    val ch = if (colorType == 6) 4 else 3
    val stride = width * ch
    val raw = new Array[Byte]((stride + 1) * height)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var off = 0
      while (!inf.finished() && off < raw.length) {
        val n = inf.inflate(raw, off, raw.length - off)
        if (n == 0 && inf.needsInput()) return None // truncated stream
        off += n
      }
      if (off < raw.length) return None
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inf.end()
    val pixels = new Array[Int](width * height)
    val prev = new Array[Int](stride)
    val cur = new Array[Int](stride)
    var y = 0
    while (y < height) {
      val rowBase = y * (stride + 1)
      val ft = raw(rowBase) & 0xff
      if (ft > 4) return None
      var x = 0
      while (x < stride) {
        val f = raw(rowBase + 1 + x) & 0xff
        val a = if (x >= ch) cur(x - ch) else 0
        val b = prev(x)
        val v = ft match {
          case 0 => f
          case 1 => (f + a) & 0xff
          case 2 => (f + b) & 0xff
          case 3 => (f + (a + b) / 2) & 0xff
          case _ => // Paeth predictor per the spec's reference algorithm
            val c = if (x >= ch) prev(x - ch) else 0
            val pr = a + b - c
            val pa = math.abs(pr - a); val pb = math.abs(pr - b)
            val pc = math.abs(pr - c)
            val pred = if (pa <= pb && pa <= pc) a
                       else if (pb <= pc) b else c
            (f + pred) & 0xff
        }
        cur(x) = v
        x += 1
      }
      var px = 0
      while (px < width) {
        val o = px * ch
        pixels(y * width + px) = (cur(o) << 16) | (cur(o + 1) << 8) | cur(o + 2)
        px += 1
      }
      System.arraycopy(cur, 0, prev, 0, stride)
      y += 1
    }
    Some(Bmp(width, height, ch * 8, pixels))
  }

  // --- real pure-JVM GIF codec ---------------------------------------------

  /** GIF-LZW decompression per the public GIF89a specification appendix:
    * variable-width codes (minCodeSize+1 … 12 bits, LSB-first within the
    * concatenated sub-block bytes), CLEAR resets the dictionary, EOI
    * terminates, dictionary entries are (prefix, suffix) pairs capped at
    * 4096 with deferred-clear behavior. Truncated bit streams decode what
    * they can (remaining pixels stay palette index 0 — the degrade-not-die
    * policy of the other codecs); structurally invalid codes → None. */
  private def lzwDecode(data: Array[Byte], minCodeSize: Int,
                        maxPixels: Int): Option[Array[Byte]] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new Array[Byte](maxPixels)
    var outLen = 0
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4097)
    var codeSize = minCodeSize + 1
    var next = eoi + 1
    var bitPos = 0L
    val nBits = data.length.toLong * 8
    def readCode(): Int = {
      if (bitPos + codeSize > nBits) return -1
      var v = 0
      var i = 0
      while (i < codeSize) {
        val bp = bitPos + i
        v |= ((data((bp >> 3).toInt) >> (bp & 7).toInt) & 1) << i
        i += 1
      }
      bitPos += codeSize
      v
    }
    def firstOf(code: Int): Byte = {
      var c = code
      while (c >= clear) c = prefix(c)
      c.toByte
    }
    var prev = -1
    var done = false
    while (!done && outLen < maxPixels) {
      val code = readCode()
      if (code < 0) done = true // truncated stream: keep what decoded
      else if (code == clear) { codeSize = minCodeSize + 1; next = eoi + 1; prev = -1 }
      else if (code == eoi) done = true
      else if (prev < 0) {
        if (code >= clear) return None // first code must be a literal
        out(outLen) = code.toByte; outLen += 1
        prev = code
      } else if (code > next || (code == next && next >= 4096)) {
        return None // code beyond the dictionary frontier
      } else {
        // expand `code` (or prev+firstOf(prev) for the just-about-to-be-
        // defined code) onto the stack, emit, then define the new entry
        var sp = 0
        var c = if (code == next) { stack(sp) = firstOf(prev); sp += 1; prev }
                else code
        while (c >= clear) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
        stack(sp) = c.toByte; sp += 1
        while (sp > 0 && outLen < maxPixels) {
          sp -= 1; out(outLen) = stack(sp); outLen += 1
        }
        if (next < 4096) {
          prefix(next) = prev; suffix(next) = firstOf(code)
          next += 1
          if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code
      }
    }
    Some(out)
  }

  /** Parse a GIF (87a/89a) from the public format layout: header +
    * logical screen descriptor, optional global color table, extension
    * blocks skipped by their sub-block lengths, then the FIRST image
    * descriptor (optional local color table, optional 4-pass interlace)
    * LZW-decoded and composed onto the screen canvas at its (left, top).
    * Animations decode as their first frame. Returns the same packed
    * top-down 0xRRGGBB `Bmp` record as the other image codecs
    * (`bitsPerPixel` = 8: palette-indexed source). Missing color table,
    * bad LZW structure, or hostile dims (16M-pixel cap, frame outside
    * the canvas) → None; truncated pixel data degrades to palette-0. */
  def decodeGif(bytes: Array[Byte]): Option[Bmp] = {
    if (bytes == null || bytes.length < 14) return None
    val hdr = new String(bytes, 0, 6, "US-ASCII")
    if (hdr != "GIF87a" && hdr != "GIF89a") return None
    def u8(i: Int): Int = bytes(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    val sw = le16(6); val sh = le16(8)
    if (sw <= 0 || sh <= 0 || sw.toLong * sh > (1L << 24)) return None
    val packed = u8(10)
    var p = 13
    def colorTable(at: Int, sizeBits: Int): Option[Array[Int]] = {
      val n = 2 << sizeBits
      if (at + 3 * n > bytes.length) None
      else Some(Array.tabulate(n)(i =>
        (u8(at + 3 * i) << 16) | (u8(at + 3 * i + 1) << 8) | u8(at + 3 * i + 2)))
    }
    var gct: Array[Int] = null
    if ((packed & 0x80) != 0) {
      gct = colorTable(p, packed & 7).getOrElse(return None)
      p += 3 * (2 << (packed & 7))
    }
    while (p < bytes.length) {
      u8(p) match {
        case 0x3b => return None // trailer before any image frame
        case 0x21 => // extension: introducer + label, then sub-blocks
          p += 2
          while (p < bytes.length && u8(p) != 0) p += 1 + u8(p)
          p += 1
        case 0x2c =>
          if (p + 10 > bytes.length) return None
          val ix = le16(p + 1); val iy = le16(p + 3)
          val iw = le16(p + 5); val ih = le16(p + 7)
          val ip = u8(p + 9)
          p += 10
          var ct = gct
          if ((ip & 0x80) != 0) {
            ct = colorTable(p, ip & 7).getOrElse(return None)
            p += 3 * (2 << (ip & 7))
          }
          if (ct == null || iw <= 0 || ih <= 0 ||
              ix + iw > sw || iy + ih > sh || p >= bytes.length) return None
          val minCode = u8(p); p += 1
          if (minCode < 2 || minCode > 8) return None
          val data = new java.io.ByteArrayOutputStream()
          while (p < bytes.length && u8(p) != 0) {
            val n = u8(p)
            if (p + 1 + n > bytes.length) return None
            data.write(bytes, p + 1, n)
            p += 1 + n
          }
          val idx = lzwDecode(data.toByteArray, minCode, iw * ih)
            .getOrElse(return None)
          val pixels = new Array[Int](sw * sh)
          // 4-pass interlace row order per the spec (rows 0,8,16… then
          // 4,12…, 2,6…, 1,3,5…); sequential otherwise
          val rowOrder: Seq[Int] =
            if ((ip & 0x40) != 0)
              (0 until ih by 8) ++ (4 until ih by 8) ++
                (2 until ih by 4) ++ (1 until ih by 2)
            else 0 until ih
          var src = 0
          rowOrder.foreach { destRow =>
            var x = 0
            while (x < iw) {
              val ci = idx(src) & 0xff
              pixels((iy + destRow) * sw + ix + x) =
                if (ci < ct.length) ct(ci) else 0
              src += 1; x += 1
            }
          }
          return Some(Bmp(sw, sh, 8, pixels))
        case _ => return None
      }
    }
    None
  }

  // --- JPEG via the JDK's bundled decoder ----------------------------------

  /** Decode a JPEG through `javax.imageio` — the one image family where a
    * hand parser is out of scope (baseline+progressive Huffman/DCT), and
    * the JDK ships a decoder, so "no external codec library" still holds.
    * Sniffed by the FFD8FF magic BEFORE handing bytes to ImageIO (a
    * non-JPEG must never reach it: the other formats keep their
    * hand-rolled parsers), dimension-capped like the other codecs, and
    * any ImageIO failure degrades to None. Returns the shared packed
    * top-down 0xRRGGBB `Bmp` record. */
  def decodeJpeg(bytes: Array[Byte]): Option[Bmp] = {
    if (bytes == null || bytes.length < 4 ||
        (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8 ||
        (bytes(2) & 0xff) != 0xff) return None
    val iis = try javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes)) catch { case _: Exception => null }
    if (iis == null) return None
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return None
      val reader = readers.next()
      try {
        reader.setInput(iis, true, true)
        // header-only dimension read BEFORE full decode — the hostile-
        // dimension guard must not require decoding the hostile payload
        val w = reader.getWidth(0); val h = reader.getHeight(0)
        if (w <= 0 || h <= 0 || w.toLong * h > (1L << 24)) return None
        val img = reader.read(0)
        val pixels = new Array[Int](w * h)
        img.getRGB(0, 0, w, h, pixels, 0, w)
        var i = 0
        while (i < pixels.length) { pixels(i) &= 0xffffff; i += 1 }
        Some(Bmp(w, h, 24, pixels))
      } finally reader.dispose()
    } catch { case _: Exception => None }
    finally iis.close()
  }

  /** The deterministic NON-decode stand-in for formats with no pure-JVM
    * decoder in this container: one float per payload byte pair. */
  private def fakeFeats(bytes: Array[Byte], dim: Int): Array[Float] = {
    val n = if (bytes == null) 0 else bytes.length
    Array.tabulate(dim) { i =>
      if (n == 0) 0.0f
      else ((bytes(i % n) & 0xff) * 31 + (bytes((i * 2 + 1) % n) & 0xff)).toFloat / 8192.0f
    }
  }

  private def featureRows(media: DataFrame, dim: Int,
                          feats: Array[Byte] => Array[Float]): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val out: Dataset[Row] = media.select(col("doc_id"), col("media"))
      .mapPartitions { rows =>
        // batch shape: iterator-in / iterator-out, blobs never shuffled
        rows.map { r => Row(r.getLong(0), feats(r.getAs[Array[Byte]](1))) }
      }(enc)
    out.toDF()
  }

  /** Decode → features, batched per partition. WAV, BMP, PNG, GIF and
    * JPEG payloads (sniffed by their container magic, not trusted
    * metadata) decode for real — the first four via the hand-rolled
    * parsers, JPEG via the JDK's bundled ImageIO decoder; anything else
    * gets the labeled byte-pair stand-in. Same output contract either
    * way: (doc_id, features[dim]). */
  def decodeFeatures(spark: SparkSession, media: DataFrame, dim: Int = 8): DataFrame =
    featureRows(media, dim, bytes =>
      decodeWav(bytes).map(wavFeatures(_, dim))
        .orElse(decodeBmp(bytes).map(bmpFeatures(_, dim)))
        .orElse(decodePng(bytes).map(bmpFeatures(_, dim)))
        .orElse(decodeGif(bytes).map(bmpFeatures(_, dim)))
        .orElse(decodeJpeg(bytes).map(bmpFeatures(_, dim)))
        .getOrElse(fakeFeats(bytes, dim)))

  /** STUB decode, kept as the explicit non-codec path (and the parity
    * baseline `decodeFeatures` must match on non-WAV payloads). */
  def fakeDecodeFeatures(spark: SparkSession, media: DataFrame, dim: Int = 8): DataFrame =
    featureRows(media, dim, bytes => fakeFeats(bytes, dim))

  /** Frame sampling for "video" payloads: emit every k-th byte-slice as a
    * frame (posexplode keeps the (doc, frame_idx) grain; blobs are sliced,
    * not duplicated whole). */
  def sampleFrames(media: DataFrame, everyK: Int = 2): DataFrame =
    media
      .select(col("doc_id"), col("meta.n_frames").as("n_frames"), col("media"))
      .select(col("doc_id"),
        posexplode(expr(
          s"transform(sequence(0, n_frames - 1), i -> substring(media, i * 4 + 1, 4))"))
          .as(Seq("frame_idx", "frame_bytes")))
      .filter(col("frame_idx") % everyK === 0)

  /** Frame sampling with REAL decoded dimensions: frames are `frameMs`
    * windows of the DECODED sample stream — boundaries come from the
    * signal's own sample rate and length, not from trusted metadata (the
    * m4 synthetic path's n_frames). Emits per-frame sample counts and
    * amplitude stats; non-WAV payloads yield no frames (honest: nothing
    * was decoded). Same batched no-shuffle shape as decodeFeatures. */
  def sampleWavFrames(spark: SparkSession, media: DataFrame,
                      frameMs: Int = 10, everyK: Int = 1): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("n_samples", IntegerType, nullable = false),
      StructField("peak_abs", IntegerType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val out: Dataset[Row] = media.select(col("doc_id"), col("media"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          decodeWav(r.getAs[Array[Byte]](1)).iterator.flatMap { w =>
            val perFrame = math.max(1, w.sampleRate * frameMs / 1000)
            val nFrames = (w.samples.length + perFrame - 1) / perFrame
            (0 until nFrames).iterator
              .filter(_ % everyK == 0)
              .map { f =>
                val lo = f * perFrame
                val hi = math.min(w.samples.length, lo + perFrame)
                var peak = 0
                var j = lo
                while (j < hi) {
                  val a = math.abs(w.samples(j).toInt); if (a > peak) peak = a
                  j += 1
                }
                Row(id, f, hi - lo, peak)
              }
          }
        }
      }(enc)
    out.toDF()
  }

  /** "Resize" stub: recompute metadata, payload untouched (a real resize
    * would transform bytes in the same mapPartitions shape as decode). */
  def resizeMeta(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("meta",
      struct(col("meta.format").as("format"), lit(w).as("width"),
             lit(h).as("height"), col("meta.n_frames").as("n_frames")))
}
