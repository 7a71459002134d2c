package graft

import graft.ext.Dedup
import org.apache.spark.sql.functions._

/** The native one-pass SimHash signature (graftshim.SimHashSignature):
  * bit-identical to the explode+groupBy vote-aggregation form — including
  * the distinct-shingle-STRING voting semantics — null-filtered for
  * sub-shingle docs, and map-only in the plan. dedup_simhash /
  * dedup_simhash_rerank oracles replay the aggregated definition, so
  * exact equality is the load-bearing property.
  */
class SimHashExprSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("map-only signature == explode+groupBy signature, bit-exact, real corpus") {
    val docs = Tables.t(spark, dir, "documents")
    val fast = Dedup.simhashChunks(docs).collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val ref = Dedup.simhashChunksAgg(docs).collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(fast.keySet === ref.keySet, "doc coverage diverged")
    assert(fast.nonEmpty)
    fast.foreach { case (id, sig) =>
      assert(sig === ref(id), s"signature diverged for doc $id")
    }
  }

  test("repeated shingles vote once (distinct-string semantics), short docs absent") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c a b c a b c"), // heavy shingle repetition
      (2L, "x y"),               // < 3 tokens → absent
      (3L, "p q r s"))
      .toDF("doc_id", "text")
    val fast = Dedup.simhashChunks(docs).collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val ref = Dedup.simhashChunksAgg(docs).collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(fast.keySet === Set(1L, 3L))
    assert(fast === ref)
  }

  test("signature pass is map-only and codegen'd") {
    val docs = Tables.t(spark, dir, "documents")
    val df = Dedup.simhashChunks(docs)
    df.queryExecution.toRdd.count()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*("), "simhash_sig fell out of codegen:\n" + p)
    assert(!p.contains("HashAggregate"),
      "signature is aggregating — the map-only path regressed:\n" + p)
  }
}
