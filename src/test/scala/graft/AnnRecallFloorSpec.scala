package graft

import graft.Tables.t
import graft.ext.Similarity

/** Recall floor for the composed IVF×PQ index at DERIVED settings — the
  * guard the hash oracles cannot provide: `sim_ann_ivfpq`'s driver row is
  * hash-pinned against a fixture, so a refactor that degrades recall while
  * staying deterministic (a worse centroid init, a subtly-wrong codebook
  * fold) would ship hash-green. This spec re-derives ground truth by brute
  * force per query and asserts the index keeps finding it.
  *
  * Floor: recall@10 >= 0.7 over 20 queries on the sf0.01 fixture with
  * everything derived (nlist ≈ √n, nprobe = 3/8 · nlist, m/ksub defaults,
  * refine 8). Measured: 0.765 at sf0.1 (PERF.md §ivfpq-curve) and 0.725 at
  * sf0.01 — both DETERMINISTIC (seedless stride-init training, fixed query
  * panel), so the thin 0.025 margin is safe: the number moves only when
  * code changes it, and a broken refactor (mis-trained quantizer, ADC bug)
  * lands near the random-probe 0.2–0.4 band, nowhere near the floor. The
  * nprobe→recall trade is documented next to Similarity.autoNprobe.
  */
class AnnRecallFloorSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.01"

  test("ivfpq: recall@10 >= 0.7 over 20 queries at derived settings (sf0.01)") {
    val embs = t(spark, dir, "embeddings")
    // train/encode ONCE (the serve posture ivfPqTopK's index params exist
    // for); per-query work is then probe + ADC scan + refine only
    val cent = Similarity.ivfTrainedCentroids(embs)
    val assigned = Similarity.ivfTrainedAssign(embs, cent).localCheckpoint()
    val cb = Similarity.pqCodebooks(embs)
    val codes = Similarity.pqEncode(embs, cb).localCheckpoint()
    val queries = (0L until 20L)
    val recalls = queries.map { q =>
      val brute = Similarity.topK(embs, q, 10).collect().map(_.getLong(0)).toSet
      val ann = Similarity.ivfPqTopK(embs, q, 10, centroids = Some(cent),
        assigned = Some(assigned), codebooks = Some(cb), codes = Some(codes))
        .collect().map(_.getLong(0)).toSet
      ann.intersect(brute).size / 10.0
    }
    val mean = recalls.sum / recalls.size
    info(f"ivfpq recall@10 mean=$mean%.3f min=${recalls.min}%.2f over ${recalls.size} queries")
    assert(mean >= 0.7,
      f"composed IVF×PQ recall@10 $mean%.3f < 0.7 at derived settings — " +
        "a training/encoding change degraded the index (see PERF.md §ivfpq-curve)")
  }
}
