package graft

import graft.ext.Dedup
import org.apache.spark.sql.functions._

/** The native one-pass MinHash signature (graftshim.MinHashSignature):
  * bit-identical to the explode+groupBy reference form, null for
  * sub-shingle docs, and inside whole-stage codegen. The equality is the
  * load-bearing property — dedup_minhash_lsh's oracle replays the
  * aggregated definition, so the map-only expression must reproduce it
  * exactly.
  */
class MinHashExprSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("map-only signature == explode+groupBy signature, bit-exact, real corpus") {
    val docs = Tables.t(spark, dir, "documents")
    val fast = Dedup.minhash(docs).collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val ref = Dedup.minhashAgg(docs).collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(fast.keySet === ref.keySet, "doc coverage diverged")
    assert(fast.nonEmpty)
    fast.foreach { case (id, sig) =>
      assert(sig === ref(id), s"signature diverged for doc $id")
    }
  }

  test("documents with fewer than k tokens are absent (null-filtered), like the agg form") {
    import spark.implicits._
    val docs = Seq(
      (1L, "one two three four five six"), // >= 5 tokens → signed
      (2L, "too short"),                   // < 5 tokens → absent
      (3L, "   "))                         // empty after trim → absent
      .toDF("doc_id", "text")
    val fast = Dedup.minhash(docs).select("doc_id").as[Long].collect().toSet
    val ref = Dedup.minhashAgg(docs).select("doc_id").as[Long].collect().toSet
    assert(fast === Set(1L))
    assert(ref === Set(1L))
  }

  test("signature pass is map-only: no shuffle below the expression, codegen'd") {
    val docs = Tables.t(spark, dir, "documents")
    val df = Dedup.minhash(docs)
    df.queryExecution.toRdd.count()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*("), "minhash_sig fell out of codegen:\n" + p)
    // the only exchange allowed is the explicit CPU-fanout repartition of
    // the RAW docs; no aggregate exchange may follow the signature
    assert(!p.contains("HashAggregate"),
      "signature is aggregating — the map-only path regressed:\n" + p)
  }
}
