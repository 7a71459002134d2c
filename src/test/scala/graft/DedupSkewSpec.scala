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
}
