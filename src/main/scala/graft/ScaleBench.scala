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
    val factors = {
      val fs = args.drop(1).filterNot(a => a == "hot-only" || a == "bloom")
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
