package graft

import graft.ext.{CorpusPipeline, Dedup, TextAnalysis}
import graft.Tables.t
import org.apache.spark.sql.functions._

/** End-to-end curation invariants (p1_curate_corpus is also oracle-checked
  * wholesale; these pin the SEMANTIC guarantees of the composition).
  */
class CorpusPipelineSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("curate: gate holds, survivors are pairwise non-dup, shards respect the budget") {
    val docs = t(spark, dir, "documents")
    val out = CorpusPipeline.curate(docs).cache()
    assert(out.count() > 0)

    // 1. every survivor meets its language's median stopword-ratio gate
    val r = (TextAnalysis.hits(col("text"), TextAnalysis.enPat).cast("double") /
      size(TextAnalysis.tokens(col("text"))))
    val q = docs.select(col("doc_id"), col("lang"), r.as("r"))
    val med = q.groupBy(col("lang"))
      .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY r)").as("m"))
    val below = out.join(q, Seq("doc_id")).join(med, Seq("lang"))
      .filter(col("r") < col("m"))
    assert(below.count() === 0)

    // 2. planted near-dups collapsed: the SURVIVING corpus has no
    // Jaccard pair left at all (distinct-cluster reps can't be near-dups
    // — they would have been one cluster)
    val survivingTexts = docs.join(out.select("doc_id"), Seq("doc_id"))
      .select(col("doc_id"), col("text"))
    assert(Dedup.jaccardPairs(survivingTexts).count() === 0)
    // and something was actually dropped (the corpus has ~25 planted pairs)
    assert(out.count() < q.filter(col("r") >= lit(0)).count())

    // 3. shard budgets: a shard overflows its 2000-token budget by at
    // most its last document (exclusive-prefix assignment)
    val bad = out.groupBy(col("lang"), col("shard_id"))
      .agg(sum(col("n_tok")).as("tot"), max(col("n_tok")).as("biggest"))
      .filter(col("tot") > lit(2000) + col("biggest"))
    assert(bad.count() === 0)
  }
}
