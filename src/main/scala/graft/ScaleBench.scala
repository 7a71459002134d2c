package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{CorpusPipeline, Dedup}

/** Scaling curves for the dedup / cluster / pack tier (r8 verdict item 1):
  * the 100 TB posture of these operators is argued from plan shape
  * (inverted indexes with hard caps before pair expansion, bounded-round
  * label propagation, two-level prefix-sum packing) — this main turns the
  * argument into MEASURED curves at 1×/4×/16× the sf0.1 documents table.
  *
  * Corpus scaling is deterministic and seedless (the ×factor replication
  * pattern of AssignBench): copy k of the corpus carries a copy tag token
  * (`c<k>x`) injected after every 3rd token, so
  *   - every 5-token shingle window spans at least one tag → cross-copy
  *     shingle overlap is ZERO: copies are fresh document populations and
  *     true near-dup structure grows LINEARLY with the factor (the shape
  *     of a real corpus growing with new data, not 16 literal clones of
  *     one corpus, which would manufacture ×factor² duplicate pairs);
  *   - stopword tokens survive untouched → the p1 quality gate sees the
  *     same per-language ratio distribution at every factor.
  *
  * For each (operator, factor): best-of-2 wall seconds, shuffle write
  * bytes/records (task-metrics listener over the timed pass), and the
  * operator's candidate/output cardinality as a separate uncounted pass.
  * A final pair at 16× quantifies the `maxDf` skew cap: a 40-token hot
  * phrase is planted UNTAGGED into 1% of documents (DedupSkewSpec's
  * pattern, 800 docs at 16×) and candidate counts + wall time are
  * measured with the default cap (10) vs the cap effectively disabled —
  * the blow-up the cap exists to prevent, printed next to the bounded
  * number the cap delivers.
  *
  * Prints one JSON line per measurement (the numbers quoted in
  * PERF.md §scaling). Pins and oracles untouched — measurement only.
  *
  * Usage: runMain graft.ScaleBench [sfDir] [factors...]   (default 1 4 16)
  *        runMain graft.ScaleBench [sfDir] bloom      (j10 pruned-vs-not)
  *        runMain graft.ScaleBench [sfDir] hot-only N (skew caps at ×N)
  *        runMain graft.ScaleBench [sfDir] ann [factors...]
  *                        (similarity tier: brute vs trained IVF curves)
  *        runMain graft.ScaleBench [sfDir] annbuild [factors...]
  *                        (persisted IVF×PQ lifecycle: build / warm-open /
  *                        probe / pruned-scan / qfetch, flat vs partitioned,
  *                        cache-dropped cold passes; factors > 64 use the
  *                        rotation×perturbation corpus — §ann-crossover)
  *        runMain graft.ScaleBench [sfDir] annrerank [factors...]
  *                        (the exact-re-rank candidate fetch in isolation:
  *                        broadcast-join scan vs bucketed literal-id
  *                        pruning, warm/cold — §ann-crossover re-rank rows)
  *        runMain graft.ScaleBench [sfDir] text [factors...]
  *                        (text tier: tfidf / segment dedup / LM scorer)
  *        runMain graft.ScaleBench [sfDir] media [factors...]
  *                        (decode tier: synthesized BMP/WAV/PNG throughput)
  *        runMain graft.ScaleBench [sfDir] incr [factors...]
  *                        (incremental admission: plain vs bloom-pruned)
  *        runMain graft.ScaleBench [sfDir] frame [factors...]
  *                        (RANGE frame: w10 single-window vs w10b banded)
  *        runMain graft.ScaleBench [sfDir] rank [factors...]
  *                        (rank family: w8 window vs w8b counts+broadcast)
  *        runMain graft.ScaleBench [sfDir] layout [factor]
  *                        (data skipping: random vs range vs z-order files)
  *        runMain graft.ScaleBench [sfDir] overlap [factors...]
  *                        (interval overlap: grid join vs inequality join)
  *        runMain graft.ScaleBench [sfDir] skew [factors...]
  *                        (j12: plain AQE join vs hybrid on planted skew)
  *        runMain graft.ScaleBench [sfDir] sketch [factors...]
  *                        (g27: exact distinct vs persisted-sketch requery)
  *
  * NB at ×64 the UNCAPPED hot arms OOM a single 128 GiB host by design
  * (~3,200²/2 pairs per hot shingle key) — that IS the measurement: the
  * capped arm completes at clean-corpus cost while `maxDf=n` kills the
  * job (PERF.md §scaling quotes the pair).
  */
object ScaleBench {

  /** Shuffle write volume of `run`, via public task metrics. The listener
    * bus is async: poll until the counters stabilize (bench tolerance —
    * the spec-grade pins in ShuffleCount use a deterministic drain). */
  private def withShuffleBytes(spark: SparkSession)(run: => Unit): (Long, Long) = {
    val bytes = new java.util.concurrent.atomic.AtomicLong
    val recs = new java.util.concurrent.atomic.AtomicLong
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null && m.shuffleWriteMetrics != null) {
          bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          recs.addAndGet(m.shuffleWriteMetrics.recordsWritten)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      run
      var prev = -1L
      var stable = 0
      var waited = 0
      while (stable < 2 && waited < 5000) {
        Thread.sleep(200); waited += 200
        val cur = bytes.get
        if (cur == prev) stable += 1 else { stable = 0; prev = cur }
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    (bytes.get, recs.get)
  }

  /** Copy-tagged ×factor corpus (see object scaladoc). Copy 0 is tagged
    * too (factor 1 = the base corpus with `c0x` tags), so every factor
    * has identical per-copy token statistics and the curves compare
    * corpus SIZE, not tag-induced token inflation. */
  def scaledDocs(spark: SparkSession, docs: DataFrame, factor: Int): DataFrame = {
    docs.crossJoin(spark.range(factor.toLong).select(col("id").as("k")))
      .select(
        (col("doc_id") + col("k") * 1000000L).as("doc_id"),
        regexp_replace(col("text"), lit("((?:\\S+\\s+){3})"),
          concat(lit("$1c"), col("k"), lit("x "))).as("text"),
        col("lang"), col("source"), col("n_chars"))
  }

  /** ×factor embedding corpus for the ANN curve: copy k rotates every
    * vector left by k positions (vec_id offset +k·n_base, copy 0
    * untouched). Rotation preserves norms and the WITHIN-copy similarity
    * structure exactly, while cross-copy directions are uncorrelated (the
    * dims of these vectors carry no positional alignment), so each copy
    * is a fresh vector population — a literal ×f clone would make every
    * query's true top-k its own near-identical copies and hand the index
    * an artificially easy recall task (clones land in the query's own
    * probed list by construction). The k·n_base offset keeps ids DENSE
    * 0..f·n-1 — the table contract `ivfCentroids`'s stride init documents
    * (a sparse k·10M offset starves the init down to copy-0-only
    * centroids and the curve degenerates to scanning everything).
    * Deterministic, seedless, SQL-only; distinct rotations require
    * factor ≤ dim (64). */
  /** Past the ×64 rotation ceiling: chunk c = k div 64 composes the
    * rotation (k mod 64) with a deterministic per-chunk perturbation of
    * coordinate 0 (+c·0.001, exactly representable shifts far below any
    * vector norm), so every copy is still a DISTINCT vector while the
    * within-copy similarity structure stays intact. This is the synthetic
    * multi-million-vector corpus for the flat-vs-partitioned index
    * crossover (annbuild mode) — ×4096 of sf0.1 = 8.2 M vectors, the
    * first locally reachable size where the index outgrows a page-cached
    * working set and list pruning can win on physical I/O. */
  def scaledEmbeddingsBig(spark: SparkSession, emb: DataFrame,
                          factor: Int): DataFrame = {
    if (factor <= 64) return scaledEmbeddings(spark, emb, factor)
    val nBase = emb.count()
    emb.crossJoin(spark.range(factor.toLong).select(col("id").as("k")))
      .select(
        (col("vec_id") + col("k") * nBase).as("vec_id"),
        expr("""transform(
               |  CASE WHEN k % 64 = 0 THEN embedding ELSE
               |    concat(slice(embedding, CAST(k % 64 AS INT) + 1,
               |                 size(embedding) - CAST(k % 64 AS INT)),
               |           slice(embedding, 1, CAST(k % 64 AS INT))) END,
               |  (x, i) -> IF(i = 0,
               |    CAST(x + (k div 64) * CAST(0.001 AS FLOAT) AS FLOAT), x))
               |""".stripMargin).as("embedding"),
        col("label"))
  }

  /** Drop the OS page cache (sync + /proc/sys/vm/drop_caches; needs
    * root). Returns whether the drop took — recorded in the output line,
    * so a "cold" number can never silently be a warm one. Evicts clean
    * cached pages only (a pure measurement knob, no persistent state);
    * used by annbuild mode to measure probes at physical-I/O cost, which
    * a 125 GiB page cache otherwise hides for any locally buildable
    * index. */
  private def dropPageCache(): Boolean =
    try {
      new ProcessBuilder("sync").start().waitFor()
      new ProcessBuilder("sh", "-c", "echo 3 > /proc/sys/vm/drop_caches")
        .start().waitFor() == 0
    } catch { case _: Throwable => false }

  def scaledEmbeddings(spark: SparkSession, emb: DataFrame, factor: Int): DataFrame = {
    require(factor <= 64, s"distinct rotations need factor <= dim 64, got $factor")
    val nBase = emb.count()
    emb.crossJoin(spark.range(factor.toLong).select(col("id").as("k")))
      .select(
        (col("vec_id") + col("k") * nBase).as("vec_id"),
        expr("""CASE WHEN k = 0 THEN embedding ELSE
               |  concat(slice(embedding, CAST(k AS INT) + 1, size(embedding) - CAST(k AS INT)),
               |         slice(embedding, 1, CAST(k AS INT))) END""".stripMargin)
          .as("embedding"),
        col("label"))
  }

  // --- media-mode blob generators: real container bytes from the public
  // BMP/WAVE/PNG layouts (mirroring the MultimodalSpec fixture encoders),
  // deterministic per id ----------------------------------------------------

  private def genBmp(id: Long): Array[Byte] = {
    val w = 32; val h = 32
    val rowSize = (w * 3 + 3) & ~3
    val buf = java.nio.ByteBuffer.allocate(54 + rowSize * h)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + rowSize * h)
      .putInt(0).putInt(54)
    buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(rowSize * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var row = h - 1
    while (row >= 0) {
      var x = 0
      while (x < w) {
        val v = ((x * 37 + row * 101 + id) % 251).toInt
        buf.put((v & 0xff).toByte).put(((v * 3) & 0xff).toByte)
          .put(((v * 7) & 0xff).toByte)
        x += 1
      }
      var p = w * 3
      while (p < rowSize) { buf.put(0.toByte); p += 1 }
      row -= 1
    }
    buf.array()
  }

  private def genWav(id: Long): Array[Byte] = {
    val nSamp = 512
    val buf = java.nio.ByteBuffer.allocate(44 + nSamp * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + nSamp * 2)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(nSamp * 2)
    var i = 0
    while (i < nSamp) {
      buf.putShort((((i * 131 + id) % 20000) - 10000).toShort); i += 1
    }
    buf.array()
  }

  private def genPng(id: Long): Array[Byte] = {
    val w = 24; val h = 24; val stride = w * 3
    // filter-0 rows — the measurement exercises the chunk walk + inflate
    // + pack path; the five defilter arms are covered by spec fixtures
    val raw = new Array[Byte]((stride + 1) * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < stride) {
        raw(y * (stride + 1) + 1 + x) = (((x * 7 + y * 13 + id) % 251) & 0xff).toByte
        x += 1
      }
      y += 1
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
    ihdr.putInt(w).putInt(h).put(8.toByte).put(2.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte)
    chunk("IHDR", ihdr.array())
    chunk("IDAT", z.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def genGif(id: Long): Array[Byte] = {
    val w = 24; val h = 24
    // 4-color palette, literal-code LZW with decoder-synchronized width
    // growth (the spec-fixture approach): the measurement exercises the
    // header walk + sub-block gather + LZW decode + palette-compose path
    val palette = Array(0x000000, 0xff0000, 0x00ff40, 0x4080ff)
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    le16(w); le16(h); out.write(0x80 | 1); out.write(0); out.write(0)
    palette.foreach { c =>
      out.write((c >> 16) & 0xff); out.write((c >> 8) & 0xff); out.write(c & 0xff)
    }
    out.write(0x2c); le16(0); le16(0); le16(w); le16(h); out.write(0)
    out.write(2) // min LZW code size
    val lzw = new java.io.ByteArrayOutputStream()
    var cur = 0L; var nbits = 0; var codeSize = 3; var next = 6
    def put(code: Int): Unit = {
      cur |= code.toLong << nbits; nbits += codeSize
      while (nbits >= 8) { lzw.write((cur & 0xff).toInt); cur >>= 8; nbits -= 8 }
    }
    put(4) // clear
    var i = 0; var first = true
    while (i < w * h) {
      put((((i % w) + (i / w) * 3 + id) % 4).toInt)
      if (!first && next < 4096) {
        next += 1
        if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
      }
      first = false; i += 1
    }
    put(5) // end-of-information
    if (nbits > 0) lzw.write((cur & 0xff).toInt)
    val data = lzw.toByteArray
    var off = 0
    while (off < data.length) {
      val n = math.min(255, data.length - off)
      out.write(n); out.write(data, off, n); off += n
    }
    out.write(0); out.write(0x3b)
    out.toByteArray
  }

  private[graft] def mediaBlob(id: Long): Array[Byte] = (id % 4) match {
    case 0 => genBmp(id)
    case 1 => genWav(id)
    case 2 => genPng(id)
    case _ => genGif(id)
  }

  /** 1% of docs get a shared UNTAGGED 40-token hot phrase appended —
    * the skew scenario the maxDf cap bounds by construction. */
  private def plantHotPhrase(docs: DataFrame): DataFrame = {
    val phrase = (1 to 40).map(i => s"hot$i").mkString(" ")
    docs.withColumn("text",
      when(col("doc_id") % 100 === 7, concat(col("text"), lit(" " + phrase)))
        .otherwise(col("text")))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // "hot-only" skips the factor curves and runs just the planted-skew
    // cap quantification (re-measure the caps without re-running curves)
    val hotOnly = args.contains("hot-only")
    val bloomMode = args.contains("bloom")
    val annMode = args.contains("ann")
    val annBuildMode = args.contains("annbuild")
    val annRerankMode = args.contains("annrerank")
    val textMode = args.contains("text")
    val mediaMode = args.contains("media")
    val incrMode = args.contains("incr")
    val neardupMode = args.contains("neardup")
    val profileMode = args.contains("profile")
    val htmlMode = args.contains("html")
    val frameMode = args.contains("frame")
    val rankMode = args.contains("rank")
    val layoutMode = args.contains("layout")
    val overlapMode = args.contains("overlap")
    val graphMode = args.contains("graph")
    val skewMode = args.contains("skew")
    val sketchMode = args.contains("sketch")
    val factors = {
      val fs = args.drop(1)
        .filterNot(a => a == "hot-only" || a == "bloom" || a == "ann" ||
          a == "annbuild" || a == "annrerank" ||
          a == "text" || a == "media" || a == "incr" || a == "html" ||
          a == "frame" || a == "rank" || a == "layout" || a == "overlap" ||
          a == "graph" || a == "skew" || a == "sketch" || a == "neardup" ||
          a == "profile")
        .toSeq.map(_.toInt)
      if (fs.nonEmpty) fs else Seq(1, 4, 16)
    }
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def num(v: Double): String = Fmt.num(v, 3)

    val base = Tables.t(spark, dir, "documents")

    def emit(op: String, factor: Int, nDocs: Long, mk: () => DataFrame,
             cardinality: () => Long): Unit = {
      // cardinality first (uncounted warm-up doubling as the pair count)
      val card = cardinality()
      val passes = (1 to 2).map { _ =>
        var sec = 0.0
        val (b, r) = withShuffleBytes(spark) {
          val t0 = System.nanoTime()
          mk().queryExecution.toRdd.count()
          sec = (System.nanoTime() - t0) / 1e9
        }
        (sec, b, r)
      }
      val best = passes.minBy(_._1)
      println(s"""{"op":"$op","factor":$factor,"n_docs":$nDocs,""" +
        s""""sec":${num(best._1)},"passes":[${passes.map(p => num(p._1)).mkString(",")}],""" +
        s""""cardinality":$card,"shuffle_write_bytes":${best._2},""" +
        s""""shuffle_write_records":${best._3}}""")
    }

    // "frame" mode: the w10-vs-w10b curve — the per-priority single-
    // window RANGE frame against the banded-prefix + as-of-merge form,
    // over ×factor replicated orders (keys shifted per copy; cents
    // distribution preserved, so band populations — the frame op's real
    // load — grow linearly). The window form serializes each of the ~5
    // priority strata through one sort task regardless of factor; the
    // banded form stays shuffle-parallel in (priority, band). Identical
    // output (the w10b oracle pins bit-equality at both gated SFs).
    if (frameMode) {
      val baseOrders = Tables.t(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
      factors.foreach { f =>
        val o = (0 until f).map(k => baseOrders.withColumn("o_orderkey",
            col("o_orderkey") + lit(k.toLong * 100000000L)))
          .reduce(_.unionByName(_)).localCheckpoint()
        val n = o.count()
        emit("w10_window_frame", f, n,
          () => operators.Windows.windowedTrailingFrame(o, 1000000L),
          () => n)
        emit("w10b_band_frame", f, n,
          () => operators.Windows.bandedTrailingFrame(o, 1000000L),
          () => n)
        o.unpersist()
      }
      spark.stop()
      return
    }

    // "layout" mode: MEASURED data-skipping benefit of the Compact tier.
    // Three physical layouts of the same ×factor orders table, 64 files
    // each: RANDOM (hash repartition — the as-ingested shape), RANGE
    // (single-key clustering on custkey), ZORDER (Morton interleave of
    // custkey+orderkey). For a selective band predicate on EACH key:
    //   - files_hit = files whose parquet footer [min,max] intersects the
    //     band (what footer-stat file skipping — Delta/Iceberg data
    //     skipping, or row-group pruning inside vanilla Spark's reader —
    //     can exploit; file count is the deterministic proxy);
    //   - best-of-2 wall of the selective aggregate over the layout
    //     (vanilla Spark realizes the benefit at row-group granularity).
    // The 100-TB claim under test: single-key clustering collapses ONE
    // key's scan and leaves the other at full width; z-order pays a
    // modest factor on both keys instead of 100% on one.
    if (layoutMode) {
      val f = factors.max
      val base = Tables.t(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
      // shift copies by (max+1) so the scaled key domain stays uniformly
      // dense — k*1e8 spacing was measured leaving macro-gaps that make
      // footer-intersection counts meaningless (bands landing in voids)
      val keySpan = base.agg(max(col("o_orderkey"))).collect()(0).getLong(0) + 1L
      val big = (0 until f).map(k => base
          .withColumn("o_orderkey", col("o_orderkey") + lit(k.toLong * keySpan)))
        .reduce(_.unionByName(_)).localCheckpoint()
      val n = big.count()
      val root = s"/tmp/graft_layout_$f"
      val srcDir = s"$root/src"
      big.write.mode("overwrite").parquet(srcDir)
      val layouts = Seq(
        "random" -> { () =>
          spark.read.parquet(srcDir).repartition(64)
            .write.mode("overwrite").parquet(s"$root/random"); s"$root/random" },
        "range_custkey" -> { () =>
          spark.read.parquet(srcDir).repartitionByRange(64, col("o_custkey"))
            .write.mode("overwrite").parquet(s"$root/range"); s"$root/range" },
        "zorder" -> { () =>
          sources.Compact.zorder(spark, srcDir, s"$root/zorder", 64,
            "o_custkey", "o_orderkey"); s"$root/zorder" })
      // band predicates: ~1% of each key's domain
      val custMax = base.agg(max(col("o_custkey"))).collect()(0).getLong(0)
      val keyMaxBig = big.agg(max(col("o_orderkey"))).collect()(0).getLong(0)
      val bands = Seq(
        ("custkey_band", "o_custkey", custMax / 2, custMax / 2 + custMax / 100),
        ("orderkey_band", "o_orderkey", keyMaxBig / 2, keyMaxBig / 2 + keyMaxBig / 100))
      layouts.foreach { case (lname, mk) =>
        val ldir = mk()
        val files = new java.io.File(ldir).listFiles()
          .filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted
        bands.foreach { case (bname, key, lo, hi) =>
          val hit = files.count { fp =>
            val r = spark.read.parquet(fp)
              .agg(min(col(key)), max(col(key))).collect()(0)
            r.getLong(0) <= hi && r.getLong(1) >= lo
          }
          val passes = (1 to 2).map { _ =>
            val t0 = System.nanoTime()
            spark.read.parquet(ldir)
              .filter(col(key) >= lo && col(key) <= hi)
              .agg(count(lit(1)), sum(col("cents")))
              .queryExecution.toRdd.count()
            (System.nanoTime() - t0) / 1e9
          }
          println(s"""{"op":"layout_$lname","band":"$bname","factor":$f,""" +
            s""""n_rows":$n,"files_hit":$hit,"files_total":${files.length},""" +
            s""""sec":${num(passes.min)},"passes":[${passes.map(num).mkString(",")}]}""")
        }
      }
      spark.stop()
      return
    }

    // "graph" mode: the gr1/gr2 curves. Node-shifted ×factor copies of
    // the part-supplier bipartite graph (PageRank: per-iteration cost is
    // one dst-keyed shuffle of |E| contribs — linear is the claim) and of
    // the supplier co-order graph (triangles: disjoint copies grow edges
    // AND triangles linearly). Then the orientation contrast: a planted
    // low-id hub (star over N nodes + a path tail), where id-ordering
    // anchors C(N,2) wedges at the hub and degree-ordering bounds the
    // hub's fan-out to ~0 — the skew blow-up the orientation prevents,
    // measured, not argued. Run at sf0.01 (the co-order graph at sf0.1
    // is near-complete on 1000 suppliers — 1.2e8 wedges at ×1 is a
    // stress shape, not a curve).
    // "sketch" mode: the g27 lifecycle in wall-time form. Re-asking an
    // exact COUNT(DISTINCT) re-shuffles every distinct value of the raw
    // corpus, every time; the sketch answer re-reads only the persisted
    // per-shard sketch table (f·shards binary rows, KBs). Measured: (a)
    // exact distinct over the ×f fact, (b) the one-time sketch build at
    // ×f, (c) the re-query from the persisted sketches — (c) is the cost
    // a daily dashboard pays after (b) amortizes across days. Estimate
    // accuracy is spec-pinned (ExtensionSpec); this measures cost only.
    if (sketchMode) {
      val li = Tables.t(spark, dir, "lineitem")
      val base0 = li.select(col("l_orderkey"), col("l_partkey"))
      factors.foreach { f =>
        val fact = (0 until f).map(k => base0.select(
            (col("l_orderkey") + lit(k.toLong * 100000000L)).as("l_orderkey"),
            col("l_partkey")))
          .reduce(_.unionByName(_)).localCheckpoint()
        val n = fact.count()
        emit("g27_exact_distinct", f, n,
          () => fact.agg(countDistinct(col("l_partkey")).as("exact")),
          () => fact.agg(countDistinct(col("l_partkey"))).collect()(0).getLong(0))
        val skDir = java.nio.file.Files
          .createTempDirectory(s"graft_sk_$f").toString + "/shards"
        def buildSketches(): DataFrame = fact
          .groupBy(pmod(col("l_orderkey"), lit(64)).as("shard"))
          .agg(hll_sketch_agg(col("l_partkey")).as("sk"))
        emit("g27_sketch_build", f, n,
          () => buildSketches(),
          () => { buildSketches().write.mode("overwrite").parquet(skDir)
                  spark.read.parquet(skDir).count() })
        emit("g27_sketch_requery", f, n,
          () => spark.read.parquet(skDir)
            .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx")),
          () => spark.read.parquet(skDir).count())
        // theta: persisted set-ALGEBRA re-query (g31/g32's capability HLL
        // lacks): per-(corpus, shard) sketches written once, then the
        // overlap AND new-keys cardinalities answered from the bytes —
        // wall-time must stay flat in f (the sketch table is 128 KB-ish
        // rows regardless of fact volume once built)
        locally {
          import graft.functions.SketchFunctions._
          val thDir = java.nio.file.Files
            .createTempDirectory(s"graft_th_$f").toString + "/shards"
          def buildTheta(): DataFrame = fact
            .groupBy(pmod(col("l_orderkey"), lit(2)).as("corpus"),
              pmod(col("l_orderkey"), lit(64)).as("shard"))
            .agg(thetaSketchAgg(col("l_partkey")).as("sk"))
          emit("g31_theta_build", f, n,
            () => buildTheta(),
            () => { buildTheta().write.mode("overwrite").parquet(thDir)
                    spark.read.parquet(thDir).count() })
          def overlapRequery(): DataFrame = {
            val sk = spark.read.parquet(thDir)
              .groupBy(col("corpus")).agg(thetaUnionAgg(col("sk")).as("sk"))
            sk.filter(col("corpus") === 0).select(col("sk").as("ska"))
              .crossJoin(sk.filter(col("corpus") === 1).select(col("sk").as("skb")))
              .select(
                round(thetaEstimate(thetaIntersect(col("ska"), col("skb"))))
                  .cast("long").as("overlap"),
                round(thetaEstimate(thetaANotB(col("ska"), col("skb"))))
                  .cast("long").as("only_a"))
          }
          emit("g31_theta_overlap_requery", f, n,
            () => overlapRequery(),
            () => spark.read.parquet(thDir).count())
        }
        fact.unpersist()
      }
      spark.stop()
      return
    }

    // "skew" mode: the j12 contrast — a planted 90%-one-key fact joined
    // to a dim with auto-broadcast DISABLED (emulating the operator's
    // stated regime: a dim too big to broadcast whole, so the plain join
    // is a sort-merge exchange that AQE can only split AFTER writing the
    // hot rows to shuffle). AQE stays ON in both arms — the claim under
    // measurement is that removing hot rows from the exchange beats
    // splitting the exchange, not that AQE is off. The hybrid's own
    // broadcast() hint on the ≤maxHot dim slice overrides the threshold,
    // as in production. Identical results (j12 pins exactness).
    if (skewMode) {
      import graft.operators.Skew
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val li = Tables.t(spark, dir, "lineitem")
      val dim = Tables.t(spark, dir, "supplier")
        .select(col("s_suppkey").cast("long").as("dk"), col("s_nationkey"))
        .localCheckpoint()
      val base0 = li.select(
        when(pmod(col("l_orderkey") * 7 + col("l_linenumber"), lit(10)) < 9,
          lit(0L))
          .otherwise(pmod(col("l_partkey"), lit(100)).cast("long")).as("fk"),
        col("l_extendedprice").as("v"))
      def agg(j: DataFrame): DataFrame = j.groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("v") * 100 + 0.5).cast("long")).as("cents"))
      factors.foreach { f =>
        val fact = (0 until f).map(_ => base0).reduce(_.unionByName(_))
          .localCheckpoint()
        val n = fact.count()
        emit("j12_plain_aqe_join", f, n,
          () => agg(fact.join(dim, col("fk") === col("dk"))),
          () => fact.join(dim, col("fk") === col("dk")).count())
        emit("j12_hybrid_skew_join", f, n,
          () => agg(Skew.hybridSkewJoin(fact, dim, "fk", "dk",
            hotThreshold = 100000L)),
          () => Skew.hybridSkewJoin(fact, dim, "fk", "dk",
            hotThreshold = 100000L).count())
        fact.unpersist()
      }
      spark.stop()
      return
    }

    if (graphMode) {
      import graft.operators.Graph
      val li = Tables.t(spark, dir, "lineitem")
      val pairs = li.select((col("l_partkey") * 2).as("p"),
        (col("l_suppkey") * 2 + 1).as("sp")).distinct().localCheckpoint()
      val span = pairs.agg(greatest(max(col("p")), max(col("sp"))))
        .collect()(0).getLong(0) / 2 * 2 + 2 // even: copies keep parity
      val os0 = li.select(col("l_orderkey").as("o"), col("l_suppkey").as("sk"))
        .distinct().localCheckpoint()
      val oSpan = os0.agg(max(col("o"))).collect()(0).getLong(0) + 1L
      val sSpan = os0.agg(max(col("sk"))).collect()(0).getLong(0) + 1L
      factors.foreach { f =>
        val pf = (0 until f).map(k => pairs.select(
            (col("p") + lit(k * span)).as("p"),
            (col("sp") + lit(k * span)).as("sp")))
          .reduce(_.unionByName(_))
        val edges = pf.select(col("p").as("src"), col("sp").as("dst"))
          .unionAll(pf.select(col("sp").as("src"), col("p").as("dst")))
          .localCheckpoint()
        val nE = edges.count()
        emit("gr1_pagerank_3it", f, nE,
          () => Graph.pagerankFixedPoint(edges, 3),
          () => Graph.pagerankFixedPoint(edges, 3).count())
        val os = (0 until f).map(k => os0.select(
            (col("o") + lit(k * oSpan)).as("o"),
            (col("sk") + lit(k * sSpan)).as("sk")))
          .reduce(_.unionByName(_))
        val coEdges = os.join(os.select(col("o"), col("sk").as("sk2")), "o")
          .filter(col("sk") < col("sk2"))
          .select(col("sk").as("u"), col("sk2").as("v")).distinct()
          .localCheckpoint()
        val nCo = coEdges.count()
        emit("gr2_triangles_degree_ordered", f, nCo,
          () => Graph.triangleCount(coEdges),
          () => Graph.triangleCount(coEdges).collect()(0).getLong(0))
        edges.unpersist(); coEdges.unpersist()
      }
      // hub plant: star center at id 0 (max degree AND min id) + path tail
      factors.foreach { f =>
        val n = 2000L * f
        val star = spark.range(1, n + 1)
          .select(lit(0L).as("u"), col("id").as("v"))
        val path = spark.range(1, n)
          .select(col("id").as("u"), (col("id") + 1).as("v"))
        val hubEdges = star.unionAll(path).localCheckpoint()
        val nH = hubEdges.count()
        emit("gr2_hub_degree_ordered", f, nH,
          () => Graph.triangleCount(hubEdges),
          () => Graph.triangleCount(hubEdges).collect()(0).getLong(0))
        emit("gr2_hub_id_ordered", f, nH,
          () => Graph.triangleCount(hubEdges, byDegree = false),
          () => Graph.triangleCount(hubEdges, byDegree = false)
            .collect()(0).getLong(0))
        hubEdges.unpersist()
      }
      spark.stop()
      return
    }

    // "overlap" mode: the j11 curve — interval-overlap via the grid
    // equi-join vs the naive inequality join. BOTH interval sets grow
    // with the factor (events replicated ×f by user_id shift → sessions
    // ×f; window cadence divided by f → windows ×f): the naive form can
    // only plan a broadcast nested loop whose predicate evaluations grow
    // as sessions × windows ∝ f², while the grid join's work follows
    // cell co-residency ∝ true overlap pairs. (With a FIXED tiny window
    // set the nested loop is the RIGHT plan — a 120-row broadcast beats
    // the grid's shuffle, measured 0.27 vs 0.35 s at ×1 — which is why
    // this mode scales the window side: the grid form exists for the
    // regime where neither interval set is broadcast-small.)
    if (overlapMode) {
      val baseEv = Tables.t(spark, dir, "events")
        .select(col("user_id"), col("event_id"), expr("ts div 1000").as("us"))
      val userSpan = baseEv.agg(max(col("user_id"))).collect()(0).getLong(0) + 1L
      factors.foreach { f =>
        val ev = (0 until f).map(k => baseEv
            .withColumn("user_id", col("user_id") + lit(k.toLong * userSpan)))
          .reduce(_.unionByName(_)).localCheckpoint()
        val sessions = operators.Joins.sessionIntervalsUs(ev).localCheckpoint()
        val wins = operators.Joins.maintenanceWindowsUs(ev,
          cadence = 21600000000L / f).localCheckpoint()
        val nS = sessions.count()
        val nW = wins.count()
        emit("overlap_grid", f, nS,
          () => operators.Joins.intervalOverlapGrid(sessions, wins),
          () => operators.Joins.intervalOverlapGrid(sessions, wins).count())
        emit("overlap_inequality_join", f, nS,
          () => operators.Joins.intervalOverlapNaive(sessions, wins),
          () => operators.Joins.intervalOverlapNaive(sessions, wins).count())
        println(s"""{"note":"overlap_inputs","factor":$f,"sessions":$nS,"windows":$nW}""")
        ev.unpersist(); sessions.unpersist(); wins.unpersist()
      }
      spark.stop()
      return
    }

    // "rank" mode: the w8-vs-w8b curve — the full-partition rank-family
    // window (percent_rank/cume_dist need every row, so the drk<=3
    // filter cannot push below the window and each segment sorts whole)
    // against the counts-table form (fact rows never windowed; the
    // distinct-value table is DOMAIN-bounded, so it stays ~constant as
    // the fact side grows — the per-row cost collapses to a hash agg +
    // broadcast probe). Replicated customers, acctbal distribution
    // preserved. Identical output (w8b's oracle pins bit-equality).
    if (rankMode) {
      val baseCust = Tables.t(spark, dir, "customer")
        .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"))
      factors.foreach { f =>
        val c = (0 until f).map(k => baseCust.withColumn("c_custkey",
            col("c_custkey") + lit(k.toLong * 100000000L)))
          .reduce(_.unionByName(_)).localCheckpoint()
        val n = c.count()
        emit("w8_window_rank", f, n,
          () => operators.Windows.windowedRankFamily(c),
          () => operators.Windows.windowedRankFamily(c).count())
        emit("w8b_rank_from_counts", f, n,
          () => operators.Windows.rankFamilyFromCounts(c),
          () => operators.Windows.rankFamilyFromCounts(c).count())
        c.unpersist()
      }
      spark.stop()
      return
    }

    // "text" mode: the text-analysis tier's curves over the same
    // copy-tagged scaled corpora as the dedup tier — TF-IDF (two hash
    // aggs + per-doc window), segment dedup (agg-only, skew-proof), and
    // the bigram LM scorer (model aggs + one equi-join on the bigram
    // key). Model-based ops amortize: the bigram/vocab tables grow with
    // CONTENT diversity, not corpus size, so per-doc cost falls as the
    // corpus grows.
    if (textMode) {
      import graft.ext.TextAnalysis
      for (f <- factors) {
        val docs = scaledDocs(spark, base, f).localCheckpoint()
        val n = docs.count()
        emit("t_tfidf", f, n,
          () => TextAnalysis.tfidfTopK(docs),
          () => TextAnalysis.tfidfTopK(docs).count())
        emit("t_segment_dedup", f, n,
          () => TextAnalysis.segmentDedupStats(docs),
          () => TextAnalysis.segmentDedupStats(docs).count())
        emit("t_lm_perplexity", f, n,
          () => TextAnalysis.lmPerplexity(docs),
          () => TextAnalysis.lmPerplexity(docs).count())
      }
      spark.stop()
      return
    }

    // "profile" mode: the one-pass Expand profile vs the per-column
    // pruned-scan form, over ×factor lineitem written to parquet FILES
    // (the scan cost must be real I/O, not a cached frame). Both arms
    // produce identical rows; the measurement DECIDED g33's
    // implementation (per-column won 19× at ×16 — see profileTable's
    // scaladoc for why the row-store intuition inverts on parquet).
    if (profileMode) {
      import operators.Aggregations
      val pCols = Seq(("l_returnflag", false), ("l_linestatus", false),
        ("l_suppkey", false), ("l_quantity", true), ("l_extendedprice", true))
      for (f <- factors) {
        // cache key includes the source dir: keyed only by factor, a run
        // at a different SF would silently reuse the previous SF's
        // replicated parquet and measure the wrong input
        val dirTag = dir.replaceAll("[^A-Za-z0-9._-]", "_")
        val srcDir = s"/tmp/graft_profile_${dirTag}_x$f"
        if (!new java.io.File(srcDir).exists()) {
          val li = Tables.t(spark, dir, "lineitem")
          li.crossJoin(spark.range(f.toLong).select(col("id").as("kk")))
            .drop("kk")
            .write.mode("overwrite").parquet(srcDir)
        }
        val src = spark.read.parquet(srcDir)
        val n = src.count()
        emit("profile_onepass", f, n,
          () => Aggregations.profileTable(src, pCols), () => pCols.size.toLong)
        emit("profile_percol", f, n,
          () => Aggregations.profileTablePerColumn(src, pCols), () => pCols.size.toLong)
      }
      spark.stop(); return
    }

    // "neardup" mode: the greedy ingest dedup (dedup_ingest_greedy) vs
    // the pair-expansion LSH (dedup_minhash_lsh) over the SAME
    // signatures and banding. The contrast is the intermediate the two
    // forms materialize: greedy's is the bucket-hit set (≤ 16·docs,
    // LINEAR by construction — this is also the streaming twin's state
    // bound), the pair form's is the candidate-pair set (quadratic per
    // bucket, survivable only because maxBucket caps it). Cardinality
    // column = live buckets for greedy, candidate pairs for pairs.
    if (neardupMode) {
      for (f <- factors) {
        val docs = scaledDocs(spark, base, f).localCheckpoint()
        val n = docs.count()
        emit("neardup_greedy", f, n, () => Dedup.neardupDropped(docs),
          () => Dedup.nearDupBuckets(docs).select("bucket").distinct().count())
        emit("neardup_pairs", f, n, () => Dedup.minhashLshPairs(docs),
          () => Dedup.minhashLshPairs(docs).count())
      }
      spark.stop(); return
    }

    // "incr" mode: incremental-dedup admission cost vs STORE size — the
    // scale question dedup_incremental's shape raises: a plain anti-join
    // of a small batch against the fingerprint store shuffles the WHOLE
    // store every batch (cost ∝ corpus lifetime), while a bloom of the
    // BATCH keys (small side!) broadcast as a map-side prune on the
    // store collapses the store's exchange to ~batch + fpp·store rows
    // before the exact anti-join absorbs false positives — cost ∝ batch.
    // Both arms must admit identical counts (asserted).
    if (incrMode) {
      import graft.ext.TextAnalysis
      val fpCol = TextAnalysis.fingerprint(col("text"))
      // fixed batch: copy-0 docs OF THE SCALED CORPUS (scaledDocs tags
      // every copy incl. 0, so raw base text would never match), evens
      // verbatim (dups vs the store), odds mutated (novel) — a 50% dup
      // admission workload
      val batch = scaledDocs(spark, base, 1)
        .select(col("doc_id"), when(col("doc_id") % 2 === 0, col("text"))
          .otherwise(concat(col("text"), lit(" novelbatchtoken"))).as("text"))
        .select(col("doc_id"), fpCol.as("fp")).localCheckpoint()
      for (f <- factors) {
        val store = scaledDocs(spark, base, f)
          .select(fpCol.as("fp")).distinct().localCheckpoint()
        val nStore = store.count()
        import graft.ext.Dedup
        def arm(name: String, mk: () => DataFrame): (Long, Long) = {
          var n = 0L
          val passes = (1 to 2).map { _ =>
            var sec = 0.0
            val (_, recs) = withShuffleBytes(spark) {
              val t0 = System.nanoTime()
              n = mk().queryExecution.toRdd.count()
              sec = (System.nanoTime() - t0) / 1e9
            }
            (sec, recs)
          }
          val best = passes.minBy(_._1)
          println(s"""{"op":"incr_admit_$name","factor":$f,"n_store":$nStore,""" +
            s""""admitted":$n,"sec":${num(best._1)},""" +
            s""""passes":[${passes.map(p => num(p._1)).mkString(",")}],""" +
            s""""shuffle_write_records":${best._2}}""")
          (n, best._2)
        }
        val (nPlain, _) = arm("plain",
          () => Dedup.admitIncremental(batch, store, bloomPrune = false))
        val (nBloom, _) = arm("bloom",
          () => Dedup.admitIncremental(batch, store, expectedBatch = 5000L))
        require(nPlain == nBloom,
          s"bloom-pruned admission diverged: $nPlain vs $nBloom")
      }
      spark.stop()
      return
    }

    // "html" mode: S1 DOM-parse throughput curve — the media-mode
    // pattern applied to the archived-page source. Full ~27-number
    // XSMB-style pages rendered in-JVM per id (generation excluded via
    // localCheckpoint), then the tolerant tag-scanner flatMap timed.
    // Like decode, the parse is map-only; the claim is per-page cost
    // flatness as the archive grows 64×.
    if (htmlMode) {
      import spark.implicits._
      for (f <- factors) {
        val n = 5000L * f
        val pages = spark.range(0, n, 1, 32).map { id =>
          val tiers = graft.sources.Html.prizeMappings.map(_._1).zipWithIndex
            .map { case (cls, t) =>
              cls -> Seq.tabulate(3)(i =>
                ((id * 31 + t * 7 + i) % 100000).toString)
            }
          graft.sources.Html.renderDrawPage(
            f"${(id % 28) + 1}%02d/01/2020", tiers)
        }.toDF("page").localCheckpoint()
        val totalBytes = pages.agg(sum(length(col("page")))).head.getLong(0)
        val passes = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          val parsed = pages.as[String]
            .flatMap(graft.sources.Html.lotteryRows(_))
            .toDF("full_date", "prize", "number_value")
          parsed.queryExecution.toRdd.count()
          (System.nanoTime() - t0) / 1e9
        }
        val sec = passes.min
        println(s"""{"op":"html_parse","factor":$f,"n_pages":$n,""" +
          s""""bytes":$totalBytes,"sec":${num(sec)},""" +
          s""""passes":[${passes.map(num).mkString(",")}],""" +
          s""""pages_per_s":${num(n / sec)},""" +
          s""""mb_per_s":${num(totalBytes / 1e6 / sec)}}""")
      }
      spark.stop()
      return
    }

    // "media" mode: decode-tier throughput curve — the one extension
    // tier without one. Synthesizes REAL container bytes in-JVM
    // (BMP/WAV/PNG/GIF round-robin by id, the four pure-JVM decoders —
    // written from the public format layouts like the spec fixtures),
    // localCheckpoints them (generation excluded from the measurement),
    // and times the batched mapPartitions decode stage. The stage is
    // map-only by construction, so the claim under test is per-row cost
    // FLATNESS: rows/s and MB/s should hold as the blob count grows 16×.
    if (mediaMode) {
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types.{BinaryType, LongType, StructField, StructType}
      val schema = StructType(Seq(
        StructField("doc_id", LongType, nullable = false),
        StructField("media", BinaryType)))
      val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
      for (f <- factors) {
        val n = 5000L * f
        val blobs = spark.range(0, n, 1, 32).toDF("doc_id")
          .mapPartitions(rows => rows.map { r =>
            val id = r.getLong(0); Row(id, mediaBlob(id))
          })(enc).toDF().localCheckpoint()
        val totalBytes = blobs
          .agg(org.apache.spark.sql.functions.sum(
            org.apache.spark.sql.functions.length(col("media")))).head.getLong(0)
        val passes = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          graft.ext.Multimodal.decodeFeatures(spark, blobs)
            .queryExecution.toRdd.count()
          (System.nanoTime() - t0) / 1e9
        }
        val sec = passes.min
        println(s"""{"op":"media_decode","factor":$f,"n_blobs":$n,""" +
          s""""bytes":$totalBytes,"sec":${num(sec)},""" +
          s""""passes":[${passes.map(num).mkString(",")}],""" +
          s""""rows_per_s":${num(n / sec)},""" +
          s""""mb_per_s":${num(totalBytes / 1e6 / sec)}}""")
      }
      spark.stop()
      return
    }

    // "ann" mode: the similarity tier's counterpart of the document
    // curves — brute-force top-k vs the trained-IVF index at ×1/×4/×16/
    // ×64 the sf0.1 embeddings. Per factor: train cost (nlist = √n by
    // autoNlist), then per arm the per-query wall (best of 2 passes over
    // 5 fixed query vectors), recall@10 vs the brute-force truth of the
    // SAME scaled corpus, and the scanned-set fraction (ivfProbedCount /
    // n) — the pair (recall, scanned fraction) is the claim an ANN index
    // makes, and the curve shows how it holds as the corpus grows.
    // "annbuild" mode: the persisted-index lifecycle the headline row no
    // longer pays — COLD build (train + encode + fused assignment⋈codes
    // join + parquet write) vs WARM ensure (fingerprint check + open) vs
    // per-query probe over the on-disk index. The build curve is the
    // amortized cost a deployment schedules offline; probe is what the
    // bench pin now measures. Writes go under ×factor-keyed roots so the
    // curve never reuses a stale layout.
    if (annBuildMode) {
      import graft.ext.Similarity
      import graft.sources.AnnIndex
      val embBase = Tables.t(spark, dir, "embeddings")
      val dirTag = dir.replaceAll("[^A-Za-z0-9._-]", "_")
      for (f <- factors) {
        // parquet-backed scaled corpus: build, warm-open and probes all
        // read from disk like a deployment. (The r12 curve fingerprint-
        // scanned a localCheckpointed frame — memory-speed — and its
        // warm_ensure_sec was a same-JVM fingerprint-cache hit that
        // understated real warm-open; both fixed here.)
        val corpusDir = new java.io.File(
          System.getProperty("java.io.tmpdir"),
          s"graft_annbuild_corpus_${dirTag}_x$f")
        org.apache.commons.io.FileUtils.deleteQuietly(corpusDir)
        // CLUSTERED BY vec_id on write (range partition + sort): each
        // file/row-group covers a disjoint id range, so a point filter
        // (the probe's query-vector fetch) prunes to one file via
        // parquet min/max stats instead of decoding the whole corpus —
        // the write-layout discipline any id-keyed table ships with; the
        // qfetch_sec_per_q field below measures exactly this term
        scaledEmbeddingsBig(spark, embBase, f)
          .sort(col("vec_id"))
          .write.parquet(corpusDir.getPath)
        val emb = spark.read.parquet(corpusDir.getPath)
        val n = emb.count()
        val nl = Similarity.autoNlist(n)
        val np = Similarity.autoNprobe(nl)
        // brute-force truth for recall@10 over the 5 fixed probe queries
        // — recall is a property of the TRAINED INDEX CONTENT (identical
        // across layouts), measured here because every factor above
        // trainSampleCap trains on the deterministic sample: the column
        // proves sampled training holds quality at scale, not just list
        // counts (the r13 seed collapse was invisible without it)
        val truth = (0L until 5L).map { q =>
          q -> Similarity.topK(emb, q, 10)
            .select("vec_id").collect().map(_.getLong(0)).toSet
        }.toMap
        var recallAt10 = -1.0
        // both layouts per factor: flat (small-corpus default) and
        // centroid_id-partitioned (the at-scale default with
        // listing-time list pruning) — the curve is the evidence behind
        // AnnIndex.partitionThreshold
        def arm(layout: String, parts: Boolean): String = {
          val root = new java.io.File(
            System.getProperty("java.io.tmpdir"),
            s"graft_annbuild_${dirTag}_${layout}_x$f")
          org.apache.commons.io.FileUtils.deleteQuietly(root)
          AnnIndex.clearFingerprintCache()
          val t0 = System.nanoTime()
          AnnIndex.ensureIvfPqFor(emb, root.getPath, partitioned = Some(parts))
          val buildSec = (System.nanoTime() - t0) / 1e9
          // warm-open = what a FRESH process pays against an existing
          // root: the fingerprint corpus scan (memo cleared, frame
          // re-read) + parquet opens
          AnnIndex.clearFingerprintCache()
          val embFresh = spark.read.parquet(corpusDir.getPath)
          val t1 = System.nanoTime()
          val idx = AnnIndex.ensureIvfPqFor(embFresh, root.getPath,
            partitioned = Some(parts))
          val warmSec = (System.nanoTime() - t1) / 1e9
          def probePass(): Double = {
            val t2 = System.nanoTime()
            (0L until 5L).foreach { q =>
              Similarity.ivfPqTopK(emb, q, 10, nlist = nl, nprobe = np,
                centroids = Some(idx.centroids), codebooks = Some(idx.codebooks),
                index = Some(idx.index)).queryExecution.toRdd.count()
            }
            (System.nanoTime() - t2) / 1e9 / 5
          }
          // the pruned index scan in ISOLATION — the only term where the
          // two layouts differ (the full probe adds layout-independent
          // costs: query fetch, ADC, exact re-rank over the corpus file)
          def scanPass(): Double = {
            val t3 = System.nanoTime()
            (0L until 5L).foreach { q =>
              idx.index.join(
                  broadcast(Similarity.probedLists(idx.centroids, emb, q, np)),
                  Seq("centroid_id"))
                .queryExecution.toRdd.count()
            }
            (System.nanoTime() - t3) / 1e9 / 5
          }
          // query-vector fetch alone: one point filter on the corpus —
          // with the clustered write above it row-group-prunes; on an
          // unclustered corpus it decodes everything and dominates probe
          // growth (the r13 breakdown)
          def qfetchPass(): Double = {
            val t4 = System.nanoTime()
            (0L until 5L).foreach { q =>
              emb.filter(col("vec_id") === q).queryExecution.toRdd.count()
            }
            (System.nanoTime() - t4) / 1e9 / 5
          }
          val probeWarm = (1 to 2).map(_ => probePass()).min
          val scanWarm = (1 to 2).map(_ => scanPass()).min
          val qfetchWarm = (1 to 2).map(_ => qfetchPass()).min
          // cold = physical-I/O cost: page cache dropped before the pass
          // (whether the drop took is in the record — a failed drop means
          // cold==warm and proves nothing)
          val coldOk = dropPageCache()
          val probeCold = probePass()
          dropPageCache()
          val scanCold = scanPass()
          val bytes = org.apache.commons.io.FileUtils.sizeOfDirectory(
            new java.io.File(root, "index"))
          // the ACTUAL trained list count, not the autoNlist formula: the
          // r13 sweep silently measured seed-collapsed indexes (a few
          // dozen lists where the formula said thousands — round-13
          // advice); recording the trained count in-record makes any
          // training/formula divergence visible in the evidence itself
          val trainedNl = idx.centroids.count()
          if (layout == "flat") {
            val hits = (0L until 5L).map { q =>
              val got = Similarity.ivfPqTopK(emb, q, 10, nlist = nl,
                  nprobe = np, centroids = Some(idx.centroids),
                  codebooks = Some(idx.codebooks), index = Some(idx.index))
                .select("vec_id").collect().map(_.getLong(0)).toSet
              got.intersect(truth(q)).size
            }.sum
            recallAt10 = hits / 50.0
          }
          org.apache.commons.io.FileUtils.deleteQuietly(root)
          s""""$layout":{"build_sec":${num(buildSec)},""" +
            s""""trained_nlist":$trainedNl,""" +
            s""""warm_ensure_sec":${num(warmSec)},""" +
            s""""probe_sec_per_q":${num(probeWarm)},""" +
            s""""probe_cold_sec_per_q":${num(probeCold)},""" +
            s""""scan_sec_per_q":${num(scanWarm)},""" +
            s""""scan_cold_sec_per_q":${num(scanCold)},""" +
            s""""qfetch_sec_per_q":${num(qfetchWarm)},""" +
            s""""cache_dropped":$coldOk,"index_bytes":$bytes}"""
        }
        val flat = arm("flat", parts = false)
        val part = arm("partitioned", parts = true)
        println(s"""{"op":"annbuild","factor":$f,"n_vectors":$n,""" +
          s""""nlist":$nl,"nprobe":$np,"recall_at10":${num(recallAt10)},""" +
          flat + "," + part + "}")
        org.apache.commons.io.FileUtils.deleteQuietly(corpusDir)
      }
      spark.stop()
      return
    }

    // "annrerank" mode: the probe's exact-re-rank FETCH term in isolation
    // — the one remaining corpus-shaped probe cost (r13 verdict item 2).
    // Per factor the scaled corpus is written twice: CLUSTERED plain
    // parquet (the in-plan broadcast-join fetch's best case) and a
    // vec_id-BUCKETED table (the ingest root's base layout), then a fixed
    // spread of k·refine = 80 candidate ids is fetched through both
    // shapes, warm and cold: the broadcast-join fetch scans the corpus
    // regardless of how few ids it wants; the bucketed literal-id fetch
    // reads only the candidates' buckets (SelectedBucketsCount — the
    // probeTopK serving path). 256 buckets so the 80 ids actually prune
    // (buckets must exceed the candidate count to matter; recorded).
    if (annRerankMode) {
      val dirTag = dir.replaceAll("[^A-Za-z0-9._-]", "_")
      val buckets = 256
      for (f <- factors) {
        val corpusDir = new java.io.File(
          System.getProperty("java.io.tmpdir"),
          s"graft_annrerank_corpus_${dirTag}_x$f")
        org.apache.commons.io.FileUtils.deleteQuietly(corpusDir)
        scaledEmbeddingsBig(spark, Tables.t(spark, dir, "embeddings"), f)
          .sort(col("vec_id"))
          .write.parquet(corpusDir.getPath)
        val emb = spark.read.parquet(corpusDir.getPath)
          .select(col("vec_id"), col("embedding"))
        val n = emb.count()
        val whDir = new java.io.File(
          System.getProperty("java.io.tmpdir"),
          s"graft_annrerank_bucketed_${dirTag}_x$f")
        val tbl = s"graft_annrerank_${dirTag}_x$f".replaceAll("[^A-Za-z0-9_]", "_")
        spark.sql(s"DROP TABLE IF EXISTS $tbl")
        org.apache.commons.io.FileUtils.deleteQuietly(whDir)
        graft.sources.Bucketed.ensureBucketed(emb, tbl, whDir.getPath,
          "vec_id", buckets)
        // 80 candidate ids spread across the id range (k=10 · refine=8,
        // the probe's candidate-cut shape)
        val ids = (0 until 80).map(i => i.toLong * (n / 80L))
        val idsDf = spark.range(0, 80).select(
          (col("id") * (n / 80L)).as("vec_id")).localCheckpoint()
        spark.conf.set(
          "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
        def joinFetch(): Double = {
          val t0 = System.nanoTime()
          emb.join(broadcast(idsDf), Seq("vec_id"))
            .queryExecution.toRdd.count()
          (System.nanoTime() - t0) / 1e9
        }
        def bucketFetch(): Double = {
          val t0 = System.nanoTime()
          spark.table(tbl)
            .filter(col("vec_id").isin(ids.map(Long.box): _*))
            .queryExecution.toRdd.count()
          (System.nanoTime() - t0) / 1e9
        }
        joinFetch(); bucketFetch() // warm codegen + listings
        val joinWarm = (1 to 3).map(_ => joinFetch()).min
        val bucketWarm = (1 to 3).map(_ => bucketFetch()).min
        val coldOk = dropPageCache()
        val joinCold = joinFetch()
        dropPageCache()
        val bucketCold = bucketFetch()
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
        println(s"""{"op":"annrerank","factor":$f,"n_vectors":$n,""" +
          s""""n_cand":80,"buckets":$buckets,""" +
          s""""join_fetch_warm_sec":${num(joinWarm)},""" +
          s""""join_fetch_cold_sec":${num(joinCold)},""" +
          s""""bucket_fetch_warm_sec":${num(bucketWarm)},""" +
          s""""bucket_fetch_cold_sec":${num(bucketCold)},""" +
          s""""cache_dropped":$coldOk}""")
        spark.sql(s"DROP TABLE IF EXISTS $tbl")
        org.apache.commons.io.FileUtils.deleteQuietly(whDir)
        org.apache.commons.io.FileUtils.deleteQuietly(corpusDir)
      }
      spark.stop()
      return
    }

    if (annMode) {
      import graft.ext.Similarity
      val k = 10
      val queryIds = (0L until 5L).toSeq
      val embBase = Tables.t(spark, dir, "embeddings")
      for (f <- factors) {
        val emb = scaledEmbeddings(spark, embBase, f).localCheckpoint()
        val n = emb.count()
        val nl = Similarity.autoNlist(n)
        val npAuto = Similarity.autoNprobe(nl)
        val t0 = System.nanoTime()
        val cent = Similarity.ivfTrainedCentroids(emb, nl)
        val trainSec = (System.nanoTime() - t0) / 1e9
        // the index itself — built once per corpus like a real serving
        // deployment (per-query assignment recompute would dwarf the
        // probe scan and bury the curve under O(n) per query)
        val t1 = System.nanoTime()
        val assigned = Similarity.ivfTrainedAssign(emb, cent).localCheckpoint()
        val assignSec = (System.nanoTime() - t1) / 1e9
        def ids(df: DataFrame): Set[Long] =
          df.select("vec_id").collect().map(_.getLong(0)).toSet
        def arm(mk: Long => DataFrame): (Double, Map[Long, Set[Long]]) = {
          val passes = (1 to 2).map { _ =>
            val t1 = System.nanoTime()
            val res = queryIds.map(q => q -> ids(mk(q))).toMap
            ((System.nanoTime() - t1) / 1e9 / queryIds.size, res)
          }
          passes.minBy(_._1)
        }
        val (bruteSec, truth) = arm(q => Similarity.topK(emb, q, k))
        def report(name: String, np: Int): String = {
          val (sec, res) = arm(q =>
            Similarity.ivfTrainedTopK(emb, q, k, nprobe = np,
              centroids = Some(cent), assigned = Some(assigned)))
          val recall = queryIds.map(q =>
            res(q).intersect(truth(q)).size.toDouble / truth(q).size).sum / queryIds.size
          val scanned = queryIds.map(q =>
            Similarity.ivfProbedCount(emb, q, np, cent,
              assigned = Some(assigned))).sum.toDouble / queryIds.size / n
          s""""$name":{"nprobe":$np,"sec_per_q":${num(sec)},""" +
            s""""recall":${num(recall)},"scanned_frac":${num(scanned)}}"""
        }
        val ivfAuto = report("ivf_auto", npAuto)
        val ivfP8 = report("ivf_p8", 8)
        // PQ arms: codebook train + corpus encode are the index build
        // (encode streams the vectors ONCE and writes the 16×-smaller
        // codes table); the per-query ADC scan then reads pqM bytes per
        // vector instead of 256 B of floats — full-corpus scan (pq) and
        // probe-pruned scan (ivfpq, the composed production shape)
        val t2 = System.nanoTime()
        val cb = Similarity.pqCodebooks(emb)
        val pqTrainSec = (System.nanoTime() - t2) / 1e9
        val t3 = System.nanoTime()
        val codes = Similarity.pqEncode(emb, cb).localCheckpoint()
        val pqEncodeSec = (System.nanoTime() - t3) / 1e9
        def pqArm(name: String, mk: Long => DataFrame): String = {
          val (sec, res) = arm(mk)
          val recall = queryIds.map(q =>
            res(q).intersect(truth(q)).size.toDouble / truth(q).size).sum / queryIds.size
          s""""$name":{"sec_per_q":${num(sec)},"recall":${num(recall)}}"""
        }
        val pqFull = pqArm("pq", q => Similarity.pqTopK(emb, q, k,
          codebooks = Some(cb), codes = Some(codes)))
        val ivfPq = pqArm("ivfpq", q => Similarity.ivfPqTopK(emb, q, k,
          centroids = Some(cent), assigned = Some(assigned),
          codebooks = Some(cb), codes = Some(codes)))
        // batch join: the WHOLE query panel (every 40th vector, so the
        // panel grows with the corpus like a real leakage/dedup scan) in
        // ONE job via sim_ann_join's engine — index build amortizes over
        // the panel instead of repeating per query, the production win
        // the per-query arms can't show
        val panelMod = 40L
        val nPanel = emb.filter(col("vec_id") % panelMod === 0).count()
        val (bjSec, bjRows) = (1 to 2).map { _ =>
          val t2 = System.nanoTime()
          val rows = Similarity.ivfAnnJoin(emb, panelMod, k)
            .queryExecution.toRdd.count()
          ((System.nanoTime() - t2) / 1e9, rows)
        }.minBy(_._1)
        val batchJoin =
          s""""batch_join":{"panel":$nPanel,"sec":${num(bjSec)},""" +
            s""""sec_per_q":${num(bjSec / nPanel)},"rows":$bjRows}"""
        // the same panel through the COMPOSED compressed index in one job
        // (probe-pruned ADC over codes, exact re-rank of survivors only)
        val (pjSec, pjRows) = (1 to 2).map { _ =>
          val t4 = System.nanoTime()
          val rows = Similarity.ivfPqAnnJoin(emb, panelMod, k,
              centroids = Some(cent), assigned = Some(assigned),
              codebooks = Some(cb), codes = Some(codes))
            .queryExecution.toRdd.count()
          ((System.nanoTime() - t4) / 1e9, rows)
        }.minBy(_._1)
        val batchJoinPq =
          s""""batch_join_ivfpq":{"panel":$nPanel,"sec":${num(pjSec)},""" +
            s""""sec_per_q":${num(pjSec / nPanel)},"rows":$pjRows}"""
        println(s"""{"op":"ann","factor":$f,"n_vectors":$n,"nlist":$nl,""" +
          s""""train_sec":${num(trainSec)},"assign_sec":${num(assignSec)},""" +
          s""""pq_train_sec":${num(pqTrainSec)},"pq_encode_sec":${num(pqEncodeSec)},""" +
          s""""brute_sec_per_q":${num(bruteSec)},""" +
          ivfAuto + "," + ivfP8 + "," + pqFull + "," + ivfPq + "," +
          batchJoin + "," + batchJoinPq + "}")
      }
      spark.stop()
      return
    }

    for (f <- factors if !hotOnly && !bloomMode) {
      // one materialized scaled corpus per factor: every operator reads
      // the same in-memory input, so curves compare operator cost, not
      // corpus-generation cost
      val docs = scaledDocs(spark, base, f).localCheckpoint()
      val n = docs.count()
      val texts = docs.select(col("doc_id"), col("text"))

      emit("dedup_ngram_jaccard", f, n,
        () => Dedup.jaccardPairs(texts),
        () => Dedup.jaccardPairs(texts).count())
      emit("dedup_minhash_lsh", f, n,
        () => Dedup.minhashLshPairs(texts),
        () => Dedup.minhashLshPairs(texts).count())
      emit("dedup_clusters", f, n,
        () => Dedup.dupClusters(Dedup.jaccardPairs(texts)),
        () => Dedup.dupClusters(Dedup.jaccardPairs(texts)).count())
      emit("p1_curate_corpus", f, n,
        () => CorpusPipeline.curateForWrite(docs),
        () => CorpusPipeline.curateForWrite(docs).count())
    }

    // "bloom" mode: the j10 shape at this sfDir — the same shuffle_hash
    // join with and without the BloomPrune pre-shuffle probe (wall +
    // shuffle write volume; the filter build is measured separately).
    // PERF.md quotes these next to BloomJoinSpec's ratio assertion.
    if (bloomMode) {
      val dim = Tables.t(spark, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING" && col("c_acctbal") > 5000)
      val fact = Tables.t(spark, dir, "orders")
      val t0 = System.nanoTime()
      val bloom = operators.BloomPrune.bloomOf(dim, "c_custkey")
      val buildSec = (System.nanoTime() - t0) / 1e9
      def joined(f: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
        f.join(dim.hint("shuffle_hash"), col("o_custkey") === col("c_custkey"))
          .select(col("o_orderkey"))
      def measure(name: String, mk: () => org.apache.spark.sql.DataFrame): Unit = {
        val passes = (1 to 2).map { _ =>
          var sec = 0.0
          val (b, r) = withShuffleBytes(spark) {
            val t1 = System.nanoTime()
            mk().queryExecution.toRdd.count()
            sec = (System.nanoTime() - t1) / 1e9
          }
          (sec, b, r)
        }
        val best = passes.minBy(_._1)
        println(s"""{"op":"$name","sec":${num(best._1)},""" +
          s""""bloom_build_sec":${num(buildSec)},"shuffle_write_bytes":${best._2},""" +
          s""""shuffle_write_records":${best._3}}""")
      }
      measure("j10_join_unpruned", () => joined(fact))
      measure("j10_join_bloom_pruned",
        () => joined(operators.BloomPrune.prune(fact, col("o_custkey"), bloom)))
      spark.stop()
      return
    }

    // maxDf cap quantification at the largest factor: planted 1% hot
    // phrase, default cap vs cap disabled (maxDf = corpus size)
    val fMax = factors.max
    val hot = plantHotPhrase(scaledDocs(spark, base, fMax)).localCheckpoint()
    val nHot = hot.count()
    val hotTexts = hot.select(col("doc_id"), col("text"))
    emit("ngram_hot_capped", fMax, nHot,
      () => Dedup.jaccardPairs(hotTexts),
      () => Dedup.jaccardPairs(hotTexts).count())
    emit("ngram_hot_uncapped", fMax, nHot,
      () => Dedup.jaccardPairs(hotTexts, maxDf = nHot.toInt),
      () => Dedup.jaccardPairs(hotTexts, maxDf = nHot.toInt).count())
    // same skew scenario through the LSH path: identical hot shingles
    // give the hot docs highly-similar minhash signatures, so their
    // banded buckets collide — maxBucket is the cap that bounds THAT
    // expansion (the LSH twin of maxDf)
    emit("minhash_hot_capped", fMax, nHot,
      () => Dedup.minhashLshPairs(hotTexts),
      () => Dedup.minhashLshPairs(hotTexts).count())
    emit("minhash_hot_uncapped", fMax, nHot,
      () => Dedup.minhashLshPairs(hotTexts, maxBucket = nHot.toInt),
      () => Dedup.minhashLshPairs(hotTexts, maxBucket = nHot.toInt).count())

    spark.stop()
  }
}
