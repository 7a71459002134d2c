package graft

import graft.Tables.t
import graft.ext.Similarity
import org.apache.spark.sql.functions._

/** The sampled training path must train FULL-DENSITY quantizers.
  *
  * Above `trainSampleCap` the quantizers train on a hash-thinned sample
  * whose surviving vec_ids are sparse, while both stride seeders select
  * seeds with a density-assuming predicate (`vec_id % stride = 0 AND
  * vec_id < stride·k`). Before the dense re-id fix an 8.19 M corpus
  * trained ~23 IVF lists instead of nlist≈2862 and ~2 PQ codes per
  * subspace instead of 256 (round-13 advice, high) — hash-green on every
  * oracled corpus (all below the cap) but a silent contract violation at
  * scale. This spec drives `trainAndFuse` through the sampled path on the
  * small fixture (via the test-only `sampleCap` parameter) and pins that
  * the trained centroid/code counts track the requested nlist/ksub; under
  * the broken seeding the same run yields a HANDFUL of each, so the
  * floors separate cleanly. Also pins the rounded sample-stride bound
  * (the truncated form kept the whole corpus for cap < n < 2·cap). */
class SeedDensitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def emb = t(spark, dir, "embeddings")
    .select(col("vec_id"), col("embedding"))

  test("sampled training keeps centroid count ≈ nlist despite sparse sample ids") {
    // n=500, cap=64 → sample ≈ n/8 ≈ 62 rows with ids sparse over 0..499;
    // the broken predicate would seed ~2 lists of the 16 requested
    val (cent, cb, fused) = Similarity.trainAndFuse(emb, nlist = 16,
      sampleCap = 64L)
    val nCent = cent.count()
    assert(nCent >= 12 && nCent <= 16,
      s"sampled-path IVF training produced $nCent lists for nlist=16 — " +
        "seed set collapsed on the sparse sample")
    // PQ: ksub=32 seeds from the ~62-row dense-re-id'd sample; the broken
    // predicate survives ~4 codes per subspace
    val perSub = cb.groupBy(col("m")).agg(count(lit(1)).as("k"))
      .agg(min(col("k"))).head().getLong(0)
    assert(perSub >= 16,
      s"sampled-path PQ training kept only $perSub codes in some subspace " +
        "for ksub=32 — seed set collapsed on the sparse sample")
    // the fused index still covers the FULL corpus (sampling affects
    // training only, never assignment/encoding coverage)
    assert(fused.count() === emb.count())
    assert(fused.select(countDistinct(col("centroid_id"))).head().getLong(0)
      === nCent)
  }

  test("train sample size stays within the rounded-stride bound") {
    // n=500, cap=300: truncated stride (n/cap = 1) kept all 500 rows;
    // rounded stride = 2 keeps ~250 ∈ [cap/2, 1.5·cap]
    val n = emb.count()
    val sampled = Similarity.trainSample(emb, n, cap = 300L).count()
    assert(sampled <= 450 && sampled >= 150,
      s"sample of $sampled rows for cap=300 over n=$n violates the " +
        "~[2/3, 3/2]·cap bound")
  }

  test("id-filtered sub-cap corpus cannot starve the seed predicate (fuzz-202 crash shape)") {
    // standing = vec_id % 7 <> 0 at n≈428 derives stride 21 = 3·7, so on
    // RAW ids every seed candidate (multiple of 21) is a multiple of 7
    // and all are excluded — empty centroid table, null assignment,
    // engine crash (found by fuzz seed 202). trainAndFuse now densely
    // re-ids the train set unconditionally; this pins the exact shape.
    val standing = emb.filter(col("vec_id") % 7 =!= 0)
    val (cent, cb, fused) = Similarity.trainAndFuse(standing)
    val nCent = cent.count()
    assert(nCent >= 15, s"seed predicate starved: $nCent lists trained")
    assert(fused.count() === standing.count())
    assert(cb.groupBy(col("m")).count().count() === Similarity.pqM.toLong)
  }

  test("below-cap corpora never sample: trainAndFuse(sampleCap=default) is full-corpus") {
    // parity guard: the fix must be invisible to every oracled corpus —
    // same artifacts as an explicit full-corpus train
    val (cent, cb, _) = Similarity.trainAndFuse(emb, nlist = 16)
    val centFull = Similarity.ivfTrainedCentroids(emb, 16)
    assert(rows(cent) === rows(centFull))
    assert(rows(cb) === rows(Similarity.pqCodebooks(emb)))
  }
}
