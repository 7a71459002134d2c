package graft

import graft.ext.Dedup

/** The maxDf hot-shingle guard in `Dedup.jaccardPairs`: one boilerplate
  * phrase shared by many documents must not generate candidate pairs
  * quadratically (a shingle in d docs is d² join pairs without the cap).
  */
class DedupSkewSpec extends SparkSpec {

  test("jaccardPairs: a planted 50-doc hot phrase is dropped from the index") {
    import spark.implicits._
    val hot = "the quick brown fox jumps over the lazy dog"
    // 50 docs share the 9-word hot phrase; unique 5-word tails keep them
    // otherwise pairwise-disjoint at the 5-shingle level
    val docs = (0L until 50L)
      .map(i => (i, s"$hot u${i}a u${i}b u${i}c u${i}d u${i}e"))
      .toDF("doc_id", "text")
    // threshNum=0 disables the similarity floor → output = all candidates
    val uncapped = Dedup.jaccardPairs(docs, threshNum = 0, maxDf = 10000).count()
    val capped = Dedup.jaccardPairs(docs, threshNum = 0, maxDf = 10).count()
    assert(uncapped === 50L * 49 / 2, s"plant failed: $uncapped pairs uncapped")
    assert(capped === 0L, s"hot shingles leaked past the cap: $capped pairs")
  }

  test("jaccardPairs: cap is inert on the real corpus (max df = 3 at sf0.001)") {
    val docs = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val withCap = Dedup.jaccardPairs(docs).collect().toSet
    val noCap = Dedup.jaccardPairs(docs, maxDf = Int.MaxValue).collect().toSet
    assert(withCap === noCap, "default cap changed results on real data")
    assert(withCap.nonEmpty)
  }

  // 200 byte-identical docs: every LSH band and every SimHash chunk puts
  // all 200 in ONE bucket — the degenerate shape a web crawl always
  // contains (empty pages, boilerplate). Uncapped that is C(200,2) = 19900
  // candidate pairs from one key; the maxBucket guard must drop the bucket
  // entirely (exact-fingerprint dedup owns identical docs).
  private def identicalDocs(n: Int) = {
    import spark.implicits._
    (0L until n.toLong)
      .map(i => (i, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
  }

  test("minhashLshPairs: a planted 200-doc degenerate bucket is dropped by maxBucket") {
    val docs = identicalDocs(200)
    val uncapped = Dedup.minhashLshPairs(docs, maxBucket = Int.MaxValue).count()
    val capped = Dedup.minhashLshPairs(docs).count()
    assert(uncapped === 200L * 199 / 2, s"plant failed: $uncapped pairs uncapped")
    assert(capped === 0L, s"degenerate bucket leaked past maxBucket: $capped pairs")
  }

  test("simhashCandidates: a planted 200-doc degenerate bucket is dropped by maxBucket") {
    val docs = identicalDocs(200)
    val uncapped = Dedup.simhashCandidates(docs, maxBucket = Int.MaxValue).count()
    val capped = Dedup.simhashCandidates(docs).count()
    assert(uncapped === 200L * 199 / 2, s"plant failed: $uncapped pairs uncapped")
    assert(capped === 0L, s"degenerate bucket leaked past maxBucket: $capped pairs")
  }

  test("minhash/simhash: default maxBucket is inert on the real corpus (sf0.001)") {
    val docs = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val lshCap = Dedup.minhashLshPairs(docs).collect().toSet
    val lshNo = Dedup.minhashLshPairs(docs, maxBucket = Int.MaxValue).collect().toSet
    assert(lshCap === lshNo, "maxBucket changed LSH results on real data")
    val shCap = Dedup.simhashCandidates(docs).collect().toSet
    val shNo = Dedup.simhashCandidates(docs, maxBucket = Int.MaxValue).collect().toSet
    assert(shCap === shNo, "maxBucket changed SimHash results on real data")
    assert(lshCap.nonEmpty && shCap.nonEmpty)
  }

  test("admitIncremental: bloom-pruned and plain paths admit identically") {
    // the bloomPrune flag may only move shuffle volume (PERF
    // §incr-scaling); false positives from the batch-key bloom must be
    // invisible behind the exact anti-join
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val docs = graft.Tables.t(spark, dir, "documents")
    val fp = graft.ext.TextAnalysis.fingerprint(col("text"))
    val store = docs.filter(col("doc_id") < 60).select(fp.as("fp")).distinct()
    // batch overlaps the store on ids 40-59 (dups) and adds 60+ (novel)
    val batch = docs.filter(col("doc_id") >= 40).select(col("doc_id"), fp.as("fp"))
    def run(bp: Boolean) = Dedup.admitIncremental(batch, store, bloomPrune = bp)
      .orderBy(col("admitted_doc_id")).collect().map(_.toSeq).toSeq
    val plain = run(false)
    val bloomed = run(true)
    assert(plain === bloomed, "bloom path changed admission results")
    val admitted = plain.map(_(1).asInstanceOf[Long])
    assert(admitted.nonEmpty && admitted.forall(_ >= 60),
      s"store overlap must be rejected: ${admitted.take(5)}")
  }

  test("containmentPairs: a quote pasted into a long page scores ~1 containment but tiny Jaccard") {
    import spark.implicits._
    // doc 0: a 12-word notice; doc 1: a 200-word page that embeds it
    // verbatim; doc 2: an unrelated page. Symmetric Jaccard misses the
    // inclusion (|intersect| / |union| is tiny against the big page);
    // containment = shared / min(sizes) flags it at ~1.0.
    val notice = (1 to 12).map(i => s"n$i").mkString(" ")
    val page = ((1 to 100).map(i => s"p$i") ++ notice.split(" ") ++
      (101 to 188).map(i => s"p$i")).mkString(" ")
    val other = (1 to 200).map(i => s"q$i").mkString(" ")
    val docs = Seq((0L, notice), (1L, page), (2L, other)).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(docs).collect()
    assert(cont.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((0L, 1L)),
      cont.mkString(","))
    assert(cont.head.getAs[Double]("containment") === 1.0)
    val jac = Dedup.jaccardPairs(docs) // default floor: jaccard >= 0.3
    assert(jac.count() === 0L, "Jaccard should miss the inclusion pair")
  }
}
