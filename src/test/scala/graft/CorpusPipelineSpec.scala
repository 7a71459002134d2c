package graft

import graft.ext.{CorpusPipeline, Dedup, TextAnalysis}
import graft.Tables.t
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Sort
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

  // --- production (sort-free) write path ----------------------------------

  /** The two plan pins of the r8 verdict item: the ForWrite variant has NO
    * global Sort anywhere, and the oracled variant is that same plan plus
    * exactly one tail Sort. `sameResult` (not string equality) absorbs
    * cosmetic expression-id differences. */
  private def assertSortFreeTwin(forWrite: DataFrame): Unit = {
    val unsorted = forWrite.queryExecution.optimizedPlan
    val globalSorts = unsorted.collect { case s: Sort if s.global => s }
    assert(globalSorts.isEmpty,
      "production write variant contains a global Sort:\n" + unsorted)
    val sorted = forWrite.orderBy(col("doc_id")).queryExecution.optimizedPlan
    sorted match {
      case s: Sort =>
        assert(s.global, "tail sort lost its global flag")
        assert(s.child.sameResult(unsorted),
          "oracled and ForWrite plans differ upstream of the tail Sort")
      case other => fail("oracled variant's root is not the tail Sort:\n" + other)
    }
  }

  test("curateForWrite / fullCurateForWrite / curateIncrementalForWrite: " +
       "sort-free, and the oracled twin differs only by the tail Sort") {
    val docs = t(spark, dir, "documents")
    assertSortFreeTwin(CorpusPipeline.curateForWrite(docs))
    assertSortFreeTwin(CorpusPipeline.fullCurateForWrite(docs))
    assertSortFreeTwin(CorpusPipeline.curateIncrementalForWrite(docs))
  }

  test("writeCurated: hive-partitioned by (lang, shard_id), prunable, lossless") {
    val docs = t(spark, dir, "documents")
    val curated = CorpusPipeline.curateForWrite(docs).localCheckpoint()
    val out = java.nio.file.Files.createTempDirectory("curated_").toFile
    out.deleteOnExit()
    CorpusPipeline.writeCurated(curated, out.getPath)
    // directory layout: lang=*/shard_id=* (pruning happens at listing time)
    val langDirs = out.listFiles().filter(_.isDirectory).map(_.getName)
    assert(langDirs.nonEmpty && langDirs.forall(_.startsWith("lang=")), langDirs.toSeq)
    val shardDirs = out.listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).filter(_.isDirectory).map(_.getName)
    assert(shardDirs.nonEmpty && shardDirs.forall(_.startsWith("shard_id=")))
    // round trip is lossless (partition columns come back from the path)
    val back = spark.read.parquet(out.getPath)
      .select("doc_id", "lang", "n_tok", "shard_id")
    assert(rows(back) === rows(curated.select("doc_id", "lang", "n_tok", "shard_id")))
    // a one-language read plans only that language's files: the lang
    // predicate must land in PartitionFilters (listing-time pruning) and
    // the scan's numFiles metric must equal that language's file count
    // (df.inputFiles is relation-level and would show ALL files)
    val oneLang = langDirs.head.stripPrefix("lang=")
    val pruned = spark.read.parquet(out.getPath).filter(col("lang") === oneLang)
    pruned.collect()
    val scan = pruned.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.metadata.get("PartitionFilters").exists(_.contains("lang")),
      "lang predicate not in PartitionFilters:\n" + scan.metadata)
    val langFiles = java.nio.file.Files.walk(out.toPath.resolve(s"lang=$oneLang"))
      .filter(p => p.toString.endsWith(".parquet")).count()
    assert(scan.metrics("numFiles").value === langFiles,
      "scan read more files than the selected language partition holds")
  }

  test("t_leakage_split: no near-dup edge straddles a split; doc-hash split would leak") {
    val docs = t(spark, dir, "documents")
    val pairs = Dedup.jaccardPairs(docs.select(col("doc_id"), col("text")))
      .select(col("doc_i"), col("doc_j")).cache()
    assert(pairs.count() > 0, "corpus lost its planted near-dup pairs")

    def splitOf(keyCol: org.apache.spark.sql.Column) = {
      val slot = conv(substring(md5(keyCol.cast("string").cast("binary")),
        1, 8), 16, 10).cast("long") % 100
      when(slot < 80, "train").when(slot < 90, "val").otherwise("test")
    }
    // cluster-rep assignment (the t_leakage_split rule, per doc)
    val byRep = docs
      .join(Dedup.dupClusters(
        Dedup.jaccardPairs(docs.select(col("doc_id"), col("text"))))
        .select(col("doc_id"), col("rep_id")), Seq("doc_id"), "left")
      .withColumn("rep", coalesce(col("rep_id"), col("doc_id")))
      .select(col("doc_id"), splitOf(col("rep")).as("split"))
    val leakSafe = pairs
      .join(byRep.withColumnRenamed("doc_id", "doc_i")
        .withColumnRenamed("split", "si"), Seq("doc_i"))
      .join(byRep.withColumnRenamed("doc_id", "doc_j")
        .withColumnRenamed("split", "sj"), Seq("doc_j"))
    assert(leakSafe.filter(col("si") =!= col("sj")).count() === 0,
      "a near-dup pair straddles train/val/test under the cluster-rep split")

    // the guard is non-vacuous: the naive doc-id-hash split (the
    // t_split_assign rule) DOES put near-dup pairs across splits on this
    // exact corpus (12 of 28 pairs at sf0.001, deterministic seed)
    val byDoc = docs.select(col("doc_id"), splitOf(col("doc_id")).as("split"))
    val leakNaive = pairs
      .join(byDoc.withColumnRenamed("doc_id", "doc_i")
        .withColumnRenamed("split", "si"), Seq("doc_i"))
      .join(byDoc.withColumnRenamed("doc_id", "doc_j")
        .withColumnRenamed("split", "sj"), Seq("doc_j"))
      .filter(col("si") =!= col("sj")).count()
    assert(leakNaive > 0,
      "expected the doc-hash split to leak on this corpus — fixture drifted")
  }
}
