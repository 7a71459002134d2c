package graft

import graft.ext.Multimodal
import graft.Tables.t
import org.apache.spark.sql.functions._

/** Multimodal plumbing: schema contract, deterministic stub decode,
  * partition preservation, frame sampling grain. */
class MultimodalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val media = Multimodal.mediaTable(t(spark, dir, "documents"))

  test("media table matches the declared schema contract") {
    val got = media.schema
    assert(got("media").dataType.typeName === "binary")
    val meta = got("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq === Seq("format", "width", "height", "n_frames"))
    assert(media.count() === 500)
    // md5 payload = 16 bytes, never null
    val lens = media.select(length(col("media"))).distinct().collect().map(_.getInt(0))
    assert(lens.toSeq === Seq(16))
  }

  test("stub decode: deterministic, fixed-dim, no shuffle of blobs") {
    val f1 = Multimodal.fakeDecodeFeatures(spark, media)
    val f2 = Multimodal.fakeDecodeFeatures(spark, media)
    assert(f1.schema("features").dataType.simpleString === "array<float>")
    val a = f1.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val b = f2.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    assert(a.sameElements(b))
    assert(a.forall(_._2.length == 8))
    // decode is map-only: partition count preserved (no shuffle stage)
    assert(f1.rdd.getNumPartitions === media.select("doc_id", "media").rdd.getNumPartitions)
  }

  test("frame sampling keeps (doc, frame_idx) grain and strides correctly") {
    val frames = Multimodal.sampleFrames(media, everyK = 2)
    val byDoc = frames.groupBy("doc_id").agg(count(lit(1)).as("n"),
        max(col("frame_idx")).as("max_idx"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // n_frames = doc_id % 8 + 1; sampled = ceil(n_frames / 2)
    byDoc.foreach { case (id, n, maxIdx) =>
      val nf = (id % 8 + 1).toInt
      assert(n === (nf + 1) / 2, s"doc $id")
      assert(maxIdx % 2 === 0)
    }
  }

  // --- real WAV codec: self-written fixtures, no libraries ----------------

  /** Canonical 44-byte-header PCM WAV encoder (fixture side): mono/stereo
    * 16-bit little-endian. Written from the public WAVE format layout, so
    * the decoder is exercised against independently-authored bytes. */
  private def wavBytes(samples: Array[Short], rate: Int, channels: Int = 1,
                       trailer: Array[Byte] = Array.empty): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen + trailer.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen + trailer.length)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(rate)
      .putInt(rate * channels * 2).putShort((channels * 2).toShort).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.put(trailer)
    buf.array()
  }

  private def rampSamples(n: Int): Array[Short] =
    Array.tabulate(n)(i => ((i % 200) * 97 - 9700).toShort) // sign-alternating ramp

  test("decodeWav: self-written PCM fixtures round-trip rate, length, and samples") {
    val s = rampSamples(800)
    val w = Multimodal.decodeWav(wavBytes(s, 8000)).get
    assert(w.sampleRate === 8000 && w.channels === 1 && w.bitsPerSample === 16)
    assert(w.samples.toSeq === s.toSeq)
    // trailing LIST chunk must not confuse the chunk walk
    val trailer = "LIST".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0, 1, 2, 3, 4)
    val w2 = Multimodal.decodeWav(wavBytes(s, 44100, trailer = trailer)).get
    assert(w2.sampleRate === 44100 && w2.samples.length === 800)
    // non-RIFF and truncated payloads refuse, not crash
    assert(Multimodal.decodeWav("nope".getBytes).isEmpty)
    assert(Multimodal.decodeWav(null).isEmpty)
    val torn = wavBytes(s, 8000).take(44 + 100) // data chunk cut mid-stream
    assert(Multimodal.decodeWav(torn).get.samples.length === 50)
  }

  test("decodeFeatures: WAV payloads get real signal stats; others keep stub parity") {
    import spark.implicits._
    val s1 = rampSamples(1600)
    val fix = Seq(
      (1L, wavBytes(s1, 16000)), // real WAV
      (2L, Array.tabulate(16)(_.toByte)) // opaque non-WAV payload
    ).toDF("doc_id", "media")
    val out = Multimodal.decodeFeatures(spark, fix)
      .orderBy("doc_id").collect().map(r => r.getSeq[Float](1))
    // real path: [n_samples, rate, rms, zero-crossings, bands...]
    assert(out(0)(0) === 1600.0f, "decoded sample count")
    assert(out(0)(1) === 16000.0f, "decoded sample rate")
    assert(out(0)(2) > 0.0f && out(0)(3) > 0.0f, "signal stats empty")
    assert(out(0).length === 8)
    // non-WAV row must match the labeled stand-in bit-for-bit
    val stub = Multimodal.fakeDecodeFeatures(spark, fix.filter($"doc_id" === 2L))
      .collect().head.getSeq[Float](1)
    assert(out(1) === stub, "non-WAV payload diverged from the stub baseline")
  }

  // --- real BMP codec: self-written fixtures, no libraries ----------------

  /** Canonical 24-bit BMP encoder (fixture side): BITMAPINFOHEADER,
    * bottom-up rows (positive height) padded to 4 bytes — written from
    * the public format layout, independent of the decoder. `px(x, y)`
    * returns packed 0xRRGGBB, y = 0 at the TOP (encoder flips). */
  private def bmpBytes(w: Int, h: Int, px: (Int, Int) => Int): Array[Byte] = {
    val rowSize = (w * 3 + 3) & ~3
    val dataLen = rowSize * h
    val buf = java.nio.ByteBuffer.allocate(54 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataLen)
      .putInt(0).putInt(54)
    buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(dataLen).putInt(2835).putInt(2835).putInt(0).putInt(0)
    for (row <- h - 1 to 0 by -1) { // bottom-up storage
      for (x <- 0 until w) {
        val p = px(x, row)
        buf.put((p & 0xff).toByte) // B
          .put(((p >> 8) & 0xff).toByte) // G
          .put(((p >> 16) & 0xff).toByte) // R
      }
      (w * 3 until rowSize).foreach(_ => buf.put(0.toByte)) // row padding
    }
    buf.array()
  }

  test("decodeBmp: self-written 24-bit fixtures round-trip dims, colors, row order") {
    // 3x2, distinct corner colors — proves the bottom-up un-flip and the
    // BGR byte order in one assertion. Width 3 exercises row padding
    // (9 bytes data + 3 pad per row).
    val colors = Map((0, 0) -> 0xff0000, (2, 0) -> 0x00ff00,
                     (0, 1) -> 0x0000ff, (2, 1) -> 0x808080)
    val b = Multimodal.decodeBmp(
      bmpBytes(3, 2, (x, y) => colors.getOrElse((x, y), 0))).get
    assert(b.width === 3 && b.height === 2 && b.bitsPerPixel === 24)
    assert(b.pixels(0) === 0xff0000, "top-left red (row order flipped?)")
    assert(b.pixels(2) === 0x00ff00, "top-right green")
    assert(b.pixels(3) === 0x0000ff, "bottom-left blue")
    assert(b.pixels(5) === 0x808080, "bottom-right gray")
    // refusals: wrong magic, truncated header, hostile dimensions
    assert(Multimodal.decodeBmp("not a bitmap".getBytes).isEmpty)
    assert(Multimodal.decodeBmp(bmpBytes(3, 2, (_, _) => 0).take(30)).isEmpty)
    val hostile = bmpBytes(3, 2, (_, _) => 0)
    val bb = java.nio.ByteBuffer.wrap(hostile).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(18, 1 << 16); bb.putInt(22, 1 << 16) // claims 2^32 pixels
    assert(Multimodal.decodeBmp(hostile).isEmpty, "hostile header must refuse")
  }

  test("decodeFeatures: BMP payloads get real image stats; dispatch order holds") {
    import spark.implicits._
    // 8x8 gray ramp: mean luma is the ramp mean, computable by hand
    val ramp = bmpBytes(8, 8, (x, y) => { val v = (x + y * 8) * 4; (v << 16) | (v << 8) | v })
    val fix = Seq((1L, ramp)).toDF("doc_id", "media")
    val f = Multimodal.decodeFeatures(spark, fix).collect().head.getSeq[Float](1)
    assert(f(0) === 8.0f && f(1) === 8.0f, "decoded dimensions")
    // luma of gray v is v; pixel values 0,4,..,252 → mean 126
    assert(f(2) === 126.0f, "mean luma from decoded pixels")
    assert(f(3) === 126.0f, "mean R channel")
    assert(f.length === 8)
    // band means ascend with the ramp (top strip darker than bottom)
    assert(f(4) < f(7), "per-band lumas lost the ramp gradient")
  }

  /** Canonical PNG encoder (fixture side), written from the public spec
    * independent of the decoder: 8-bit RGB or RGBA, one zlib IDAT
    * (JDK DeflaterOutputStream), CRC32-correct chunks, and a CALLER-
    * CHOSEN filter type per row so the decoder's five defilter paths are
    * each exercised deliberately. `px(x, y)` returns packed 0xRRGGBB. */
  private def pngBytes(w: Int, h: Int, px: (Int, Int) => Int,
                       rowFilter: Int => Int,
                       alpha: Boolean = false): Array[Byte] = {
    val ch = if (alpha) 4 else 3
    val stride = w * ch
    val raw = new Array[Byte]((stride + 1) * h)
    val prev = new Array[Int](stride)
    val cur = new Array[Int](stride)
    for (y <- 0 until h) {
      for (x <- 0 until w) {
        val p = px(x, y)
        cur(x * ch) = (p >> 16) & 0xff
        cur(x * ch + 1) = (p >> 8) & 0xff
        cur(x * ch + 2) = p & 0xff
        if (alpha) cur(x * ch + 3) = 0xff
      }
      val ft = rowFilter(y)
      raw(y * (stride + 1)) = ft.toByte
      for (x <- 0 until stride) {
        val a = if (x >= ch) cur(x - ch) else 0
        val b = prev(x)
        val c = if (x >= ch) prev(x - ch) else 0
        val v = ft match {
          case 0 => cur(x)
          case 1 => cur(x) - a
          case 2 => cur(x) - b
          case 3 => cur(x) - (a + b) / 2
          case 4 =>
            val pr = a + b - c
            val pa = math.abs(pr - a); val pb = math.abs(pr - b)
            val pc = math.abs(pr - c)
            cur(x) - (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
          case other => fail(s"fixture filter $other")
        }
        raw(y * (stride + 1) + 1 + x) = (v & 0xff).toByte
      }
      Array.copy(cur, 0, prev, 0, stride)
    }
    val z = new java.io.ByteArrayOutputStream()
    val dos = new java.util.zip.DeflaterOutputStream(z)
    dos.write(raw); dos.close()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      def be32(v: Long): Unit = {
        out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
        out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
      }
      be32(data.length)
      out.write(typ.getBytes("US-ASCII")); out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(typ.getBytes("US-ASCII")); crc.update(data)
      be32(crc.getValue)
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(w).putInt(h).put(8.toByte)
      .put((if (alpha) 6 else 2).toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    chunk("IHDR", ihdr.array())
    chunk("IDAT", z.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  test("decodePng: self-written fixtures round-trip pixels through ALL five row filters") {
    // 6x5 pseudo-random-ish pixels; each row uses a different filter type
    // (None/Sub/Up/Average/Paeth), so a bug in ANY defilter path flips
    // concrete pixels
    def px(x: Int, y: Int): Int = {
      val v = (x * 37 + y * 101) % 251
      ((v & 0xff) << 16) | (((v * 3) & 0xff) << 8) | ((v * 7) & 0xff)
    }
    val rgb = Multimodal.decodePng(pngBytes(6, 5, px, y => y % 5)).get
    assert(rgb.width === 6 && rgb.height === 5 && rgb.bitsPerPixel === 24)
    for (y <- 0 until 5; x <- 0 until 6)
      assert(rgb.pixels(y * 6 + x) === px(x, y), s"pixel ($x,$y) under filter ${y % 5}")
    // RGBA input: alpha dropped, channel width recorded
    val rgba = Multimodal.decodePng(
      pngBytes(4, 4, px, y => (y + 1) % 5, alpha = true)).get
    assert(rgba.bitsPerPixel === 32)
    for (y <- 0 until 4; x <- 0 until 4)
      assert(rgba.pixels(y * 4 + x) === px(x, y), s"rgba pixel ($x,$y)")
    // refusals: wrong magic, truncated IDAT, unsupported color type
    assert(Multimodal.decodePng("not a png".getBytes).isEmpty)
    val good = pngBytes(6, 5, px, _ => 0)
    assert(Multimodal.decodePng(good.dropRight(30)).isEmpty, "truncated must refuse")
    val palette = good.clone()
    palette(8 + 8 + 9) = 3.toByte // IHDR color type byte → palette
    assert(Multimodal.decodePng(palette).isEmpty, "palette type must refuse")
  }

  test("decodeFeatures: PNG payloads get real image stats through the sniff chain") {
    import spark.implicits._
    // same 8x8 gray ramp as the BMP test — the two container formats must
    // land on identical features, proving format-independent decode
    def gray(x: Int, y: Int): Int = { val v = (x + y * 8) * 4; (v << 16) | (v << 8) | v }
    val png = pngBytes(8, 8, gray, y => y % 5)
    val bmp = bmpBytes(8, 8, gray)
    val fix = Seq((1L, png), (2L, bmp)).toDF("doc_id", "media")
    val f = Multimodal.decodeFeatures(spark, fix).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(f(1L) === f(2L), "PNG and BMP of the same image must yield identical features")
    assert(f(1L)(0) === 8.0f && f(1L)(2) === 126.0f)
  }

  // --- real GIF codec: self-written fixtures + JDK-decoder differential ---

  /** GIF-LZW literal-code encoder (fixture side): every pixel emitted as
    * its own literal code while tracking the decoder's dictionary frontier
    * so the variable code WIDTH still grows exactly as the spec requires —
    * the decoder's width-growth path is exercised without implementing
    * real LZW compression here. */
  private def gifLzwLiteral(indices: Array[Int], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode; val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var cur = 0L; var nbits = 0
    var codeSize = minCode + 1
    var next = eoi + 1
    def put(code: Int): Unit = {
      cur |= code.toLong << nbits; nbits += codeSize
      while (nbits >= 8) { out.write((cur & 0xff).toInt); cur >>= 8; nbits -= 8 }
    }
    put(clear)
    var first = true
    indices.foreach { i =>
      put(i)
      if (!first && next < 4096) {
        next += 1
        if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
      }
      first = false
    }
    put(eoi)
    if (nbits > 0) out.write((cur & 0xff).toInt)
    out.toByteArray
  }

  /** GIF89a container encoder (fixture side) from the public format
    * layout: logical screen, global or local power-of-two palette,
    * graphic-control + comment extensions (to exercise block skipping),
    * one image frame at an offset, optional 4-pass interlace. */
  private def gifBytes(w: Int, h: Int, idx: (Int, Int) => Int,
                       palette: Array[Int], interlaced: Boolean = false,
                       localCt: Boolean = false, offset: (Int, Int) = (0, 0),
                       screen: Option[(Int, Int)] = None): Array[Byte] = {
    require(Integer.bitCount(palette.length) == 1 && palette.length >= 4)
    val (sw, sh) = screen.getOrElse((w, h))
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    val field = Integer.numberOfTrailingZeros(palette.length) - 1
    le16(sw); le16(sh)
    out.write(if (localCt) 0 else 0x80 | field); out.write(0); out.write(0)
    def writeCt(): Unit = palette.foreach { c =>
      out.write((c >> 16) & 0xff); out.write((c >> 8) & 0xff); out.write(c & 0xff)
    }
    if (!localCt) writeCt()
    out.write(0x21); out.write(0xf9); out.write(4) // graphic control ext
    out.write(0); le16(0); out.write(0); out.write(0)
    out.write(0x21); out.write(0xfe) // comment ext, two sub-blocks
    out.write(2); out.write('h'); out.write('i'); out.write(1); out.write('!'); out.write(0)
    out.write(0x2c); le16(offset._1); le16(offset._2); le16(w); le16(h)
    out.write((if (localCt) 0x80 | field else 0) | (if (interlaced) 0x40 else 0))
    if (localCt) writeCt()
    val minCode = math.max(2, field + 1)
    out.write(minCode)
    val rowOrder =
      if (interlaced) (0 until h by 8) ++ (4 until h by 8) ++
        (2 until h by 4) ++ (1 until h by 2)
      else 0 until h
    val inds = rowOrder.flatMap(y => (0 until w).map(x => idx(x, y))).toArray
    val lzw = gifLzwLiteral(inds, minCode)
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      out.write(n); out.write(lzw, off, n); off += n
    }
    out.write(0); out.write(0x3b)
    out.toByteArray
  }

  private val gifPalette = Array(0x000000, 0xff0000, 0x00ff40, 0x4080ff)

  test("decodeGif: self-written fixtures round-trip dims, palette colors, extensions") {
    def idx(x: Int, y: Int): Int = (x + y) % 4
    val g = Multimodal.decodeGif(gifBytes(7, 5, idx, gifPalette)).get
    assert((g.width, g.height, g.bitsPerPixel) === ((7, 5, 8)))
    for (y <- 0 until 5; x <- 0 until 7)
      assert(g.pixels(y * 7 + x) === gifPalette(idx(x, y)), s"($x,$y)")
  }

  test("decodeGif: interlaced frame with local palette at an offset composes onto the canvas") {
    def idx(x: Int, y: Int): Int = (x * 3 + y) % 4
    val bytes = gifBytes(6, 9, idx, gifPalette, interlaced = true,
      localCt = true, offset = (2, 1), screen = Some((10, 12)))
    val g = Multimodal.decodeGif(bytes).get
    assert((g.width, g.height) === ((10, 12)))
    for (y <- 0 until 12; x <- 0 until 10) {
      val expected =
        if (x >= 2 && x < 8 && y >= 1 && y < 10) gifPalette(idx(x - 2, y - 1))
        else 0 // canvas outside the frame
      assert(g.pixels(y * 10 + x) === expected, s"($x,$y)")
    }
  }

  test("decodeGif agrees pixel-for-pixel with the JDK's own GIF decoder on real LZW streams") {
    // ImageIO WRITES a genuinely-compressed LZW stream (dictionary hits,
    // width growth, sub-block splits) — the differential the literal-code
    // fixtures cannot provide. Both decoders read the SAME bytes.
    val w = 37; val h = 23
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, gifPalette((x / 3 + y * 2) % 4))
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", baos), "JDK GIF writer unavailable")
    val bytes = baos.toByteArray
    val ours = Multimodal.decodeGif(bytes).get
    val jdk = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert((ours.width, ours.height) === ((jdk.getWidth, jdk.getHeight)))
    for (y <- 0 until h; x <- 0 until w)
      assert(ours.pixels(y * w + x) === (jdk.getRGB(x, y) & 0xffffff), s"($x,$y)")
  }

  test("decodeFeatures: GIF payloads get real image stats through the sniff chain") {
    import spark.implicits._
    val fix = Seq(
      (21L, gifBytes(7, 5, (x, y) => (x + y) % 4, gifPalette)),
      (22L, Array[Byte](71, 73, 70, 1, 2, 3)) // "GIF" prefix but not a container
    ).toDF("doc_id", "media")
    val got = Multimodal.decodeFeatures(spark, fix)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(got(21L)(0) === 7.0f && got(21L)(1) === 5.0f) // real decoded dims
    // non-container falls back to the labeled stand-in, never crashes
    assert(got(22L).length === 8)
  }

  test("decodeJpeg: JDK-encoded fixtures decode with exact dims and faithful stats") {
    val w = 31; val h = 17
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    // smooth gradient — survives lossy JPEG with small per-pixel error
    for (y <- 0 until h; x <- 0 until w) {
      val v = 40 + (x * 4 + y * 2)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", baos), "JDK JPEG writer unavailable")
    val got = Multimodal.decodeJpeg(baos.toByteArray).get
    assert((got.width, got.height, got.bitsPerPixel) === ((w, h, 24)))
    // lossy but faithful: mean luma within 3 levels of the source mean
    val srcMean = (for (y <- 0 until h; x <- 0 until w)
      yield (40 + (x * 4 + y * 2)).toDouble).sum / (w * h)
    val gotMean = got.pixels.map(p => ((p >> 16) & 0xff).toDouble).sum / (w * h)
    assert(math.abs(gotMean - srcMean) < 3.0, s"mean $gotMean vs $srcMean")
    // sniff is magic-exact: JFIF magic mangled → None, not an ImageIO probe
    val mangled = baos.toByteArray.clone(); mangled(0) = 0x00
    assert(Multimodal.decodeJpeg(mangled).isEmpty)
  }

  test("decodeFeatures: JPEG payloads get real image stats through the sniff chain") {
    import spark.implicits._
    val img = new java.awt.image.BufferedImage(12, 9,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 9; x <- 0 until 12) img.setRGB(x, y, 0x808080)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", baos)
    val fix = Seq((31L, baos.toByteArray)).toDF("doc_id", "media")
    val feats = Multimodal.decodeFeatures(spark, fix).collect().head.getSeq[Float](1)
    assert(feats(0) === 12.0f && feats(1) === 9.0f)
  }

  test("ScaleBench media blobs all really decode (no stand-in rows in the curve)") {
    (0L to 7L).foreach { id =>
      val b = graft.ScaleBench.mediaBlob(id)
      val decoded = Multimodal.decodeWav(b).isDefined ||
        Multimodal.decodeBmp(b).isDefined || Multimodal.decodePng(b).isDefined ||
        Multimodal.decodeGif(b).isDefined
      assert(decoded, s"blob $id fell through to the stand-in")
    }
  }

  test("decoders never throw on hostile bytes: noise, truncations, bit flips") {
    // a hostile or corrupt blob must degrade to None (or decode garbage),
    // NEVER throw — an uncaught parse exception in the mapPartitions
    // decode stage kills the executor task and, with it, the whole job.
    // Deterministic seed; three corruption families: pure noise at
    // assorted sizes, every prefix truncation of a valid container, and
    // random single-byte flips of a valid container (the worst case for
    // parsers that trust internal lengths/offsets).
    val rnd = new java.util.Random(42)
    def safe(b: Array[Byte]): Unit = {
      Multimodal.decodeWav(b); Multimodal.decodeBmp(b); Multimodal.decodePng(b)
      Multimodal.decodeGif(b); Multimodal.decodeJpeg(b)
      ()
    }
    for (_ <- 1 to 200) {
      val b = new Array[Byte](rnd.nextInt(400))
      rnd.nextBytes(b); safe(b)
    }
    def px(x: Int, y: Int): Int = (x * 41 + y * 7) & 0xffffff
    val fixtures = Seq(
      pngBytes(6, 5, px, y => y % 5),
      bmpBytes(6, 5, px),
      wavBytes(rampSamples(40), 8000),
      gifBytes(6, 5, (x, y) => (x + y) % 4, gifPalette))
    fixtures.foreach { fix =>
      (0 until fix.length).foreach(n => safe(fix.take(n)))
      for (_ <- 1 to 300) {
        val m = fix.clone()
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
        safe(m)
      }
    }
  }

  test("m4-style frame sampling over REAL decoded dimensions (self-written fixture)") {
    import spark.implicits._
    // 16 kHz × 10 ms frames = 160 samples/frame; 1000 samples → 7 frames,
    // last one partial (40 samples) — all derived from the DECODED header,
    // not metadata
    val fix = Seq(
      (7L, wavBytes(rampSamples(1000), 16000)),
      (8L, Array[Byte](1, 2, 3)) // undecodable: must emit no frames
    ).toDF("doc_id", "media")
    val frames = Multimodal.sampleWavFrames(spark, fix, frameMs = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(frames.forall(_._1 == 7L), "undecodable payload produced frames")
    assert(frames.length === 7)
    assert(frames.map(_._3).toSeq === Seq(160, 160, 160, 160, 160, 160, 40))
    assert(frames.forall(_._4 > 0), "per-frame peak missing")
    // every-k striding on the decoded frame grid
    val strided = Multimodal.sampleWavFrames(spark, fix, frameMs = 10, everyK = 2)
      .collect().map(_.getInt(1))
    assert(strided.toSeq.sorted === Seq(0, 2, 4, 6))
  }

  test("resize stub rewrites metadata only") {
    val resized = Multimodal.resizeMeta(media, 32, 32)
    val r = resized.select(col("meta.width"), col("meta.height"),
      length(col("media"))).distinct().collect()
    assert(r.map(x => (x.getInt(0), x.getInt(1), x.getInt(2))).toSeq === Seq((32, 32, 16)))
  }
}
