package graft

import graft.ext.Dedup

/** `Dedup.dupClusters`: connected components over near-dup pairs — the
  * keep-one-copy-per-cluster step. Pairs alone under-delete on chains
  * (A~B, B~C, A≁C), so transitivity is the load-bearing property.
  */
class DedupClusterSpec extends SparkSpec {

  private def clusters(pairs: Seq[(Long, Long)]): Map[Long, (Long, Long)] = {
    import spark.implicits._
    Dedup.dupClusters(pairs.toDF("doc_i", "doc_j"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
  }

  test("a chain collapses transitively to one representative") {
    // 1-2, 2-3, 3-4: no direct 1-4 pair, but one cluster of 4
    val got = clusters(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    assert(got === Map(
      1L -> ((1L, 4L)), 2L -> ((1L, 4L)), 3L -> ((1L, 4L)), 4L -> ((1L, 4L))))
  }

  test("disjoint clusters keep separate representatives and sizes") {
    val got = clusters(Seq((10L, 11L), (11L, 12L), (20L, 21L), (30L, 31L)))
    assert(got(10L) === ((10L, 3L)) && got(12L) === ((10L, 3L)))
    assert(got(21L) === ((20L, 2L)))
    assert(got(30L) === ((30L, 2L)) && got(31L) === ((30L, 2L)))
  }

  test("long chain (diameter 20 >> 3) converges, reliable checkpoint mode agrees") {
    import spark.implicits._
    // path graph 0-1-2-...-20: worst case for min-label propagation (the
    // min label travels one hop per round → exactly diameter rounds);
    // proves the loop is diameter-bounded, not hardcoded for dense
    // near-dup cliques
    val chain = (0L until 20L).map(i => (i, i + 1)).toDF("doc_i", "doc_j")
    val expect = (0L to 20L).map(i => i -> ((0L, 21L))).toMap
    val local = Dedup.dupClusters(chain).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(local === expect, "localCheckpoint mode missed the chain fixpoint")
    // reliable mode: rounds go through the SparkContext checkpoint dir
    // (durable storage on a real cluster) — same fixpoint, recoverable
    // lineage
    val durable = Dedup.dupClusters(chain, reliable = true).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(durable === expect, "reliable-checkpoint mode diverged")
  }

  test("pointer-doubling mode: 40-edge chain hits the same fixpoint in O(log d) rounds") {
    import spark.implicits._
    val chain = (0L until 40L).map(i => (i, i + 1)).toDF("doc_i", "doc_j")
    val expect = (0L to 40L).map(i => i -> ((0L, 41L))).toMap
    // maxRounds = 12 IS the logarithmic-convergence assertion: plain
    // min-label propagation needs 40 rounds on this graph (one hop per
    // round), so terminating within 12 proves the doubling step works
    val got = Dedup.dupClusters(chain, jump = true, maxRounds = 12).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === expect, "jump mode missed the chain fixpoint")
  }

  test("maxRounds guard fails loudly instead of spinning") {
    import spark.implicits._
    val chain = (0L until 20L).map(i => (i, i + 1)).toDF("doc_i", "doc_j")
    val e = intercept[IllegalStateException] {
      Dedup.dupClusters(chain, maxRounds = 3)
    }
    assert(e.getMessage.contains("no convergence"))
  }

  test("jump and plain modes agree on the real corpus") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val pairs = Dedup.jaccardPairs(docs)
    val plain = Dedup.dupClusters(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val jumped = Dedup.dupClusters(pairs, jump = true).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(jumped === plain)
  }

  test("real corpus: every rep is the min doc_id of its cluster") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val got = Dedup.dupClusters(Dedup.jaccardPairs(docs)).collect()
    assert(got.nonEmpty)
    val byRep = got.groupBy(_.getLong(1))
    byRep.foreach { case (rep, members) =>
      assert(members.map(_.getLong(0)).min === rep)
      assert(members.forall(_.getLong(2) === members.length.toLong))
    }
  }
}
