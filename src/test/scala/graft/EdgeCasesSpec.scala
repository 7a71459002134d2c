package graft

import graft.ext.{CorpusPipeline, Dedup, TextAnalysis}
import org.apache.spark.sql.DataFrame

/** Degenerate-input behavior of the extension operators: an EMPTY batch
  * (a no-data day, a fully-filtered partition) and a single-document
  * corpus must flow through every pipeline stage as empty/trivial results
  * — never an exception. The iterative operators are the risky ones: a
  * fold or loop that assumes ≥1 row (or ≥1 pair) dies precisely on the
  * day the upstream filter drops everything.
  */
class EdgeCasesSpec extends SparkSpec {

  private def docsOf(rows: Seq[(Long, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang")
  }
  private def emptyDocs = docsOf(Nil)
  private def oneDoc = docsOf(Seq((7L, "one lonely document with several words inside", "en")))

  test("w11b refuses a non-UTC session zone — band key is only DST-free under UTC") {
    // Tables.requireUtc guards the epoch-micros band derivation: under a
    // DST zone a 7-day frame straddling a transition would silently
    // diverge from the oracle's INTERVAL arithmetic. The guard must fire
    // at QUERY BUILD time (before any job), with the pin named.
    val saved = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val e = intercept[IllegalStateException](
        SparkEntry.queries("w11b_time_band_frame")(spark, "/root/testdata/sf0.001"))
      assert(e.getMessage.contains("UTC") && e.getMessage.contains("w11b"))
    } finally spark.conf.set("spark.sql.session.timeZone", saved)
    // and under the restored UTC session the same build succeeds
    assert(SparkEntry.queries("w11b_time_band_frame")(spark, "/root/testdata/sf0.001")
      .columns.nonEmpty)
  }

  test("segment dedup: planted copies are counted as dups, first occurrence wins") {
    // seg length 3; doc 1 owns two segments, doc 2 copies doc 1's first
    // segment plus a fresh one, doc 3 repeats ONE segment internally
    // (the second occurrence is a dup even within the same doc)
    val docs = docsOf(Seq(
      (1L, "a b c d e f", "en"),             // segs: "a b c", "d e f"
      (2L, "a b c x y z", "en"),             // "a b c" dups doc 1
      (3L, "p q r p q r", "en")))            // second "p q r" dups the first
    val got = TextAnalysis.segmentDedupStats(docs, segLen = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((1L, 2L, 0L), (2L, 2L, 1L), (3L, 2L, 1L)))
  }

  test("segment dedup: empty and single-doc corpora flow through") {
    assert(TextAnalysis.segmentDedupStats(emptyDocs).count() === 0)
    val one = TextAnalysis.segmentDedupStats(oneDoc).collect()
    assert(one.length === 1 && one.head.getLong(2) === 0L)
  }

  test("pair generators return empty on an empty corpus") {
    assert(Dedup.jaccardPairs(emptyDocs).count() === 0)
    assert(Dedup.containmentPairs(emptyDocs).count() === 0)
    assert(Dedup.minhashLshPairs(emptyDocs).count() === 0)
    assert(Dedup.simhashCandidates(emptyDocs).count() === 0)
  }

  test("pair generators return empty on a single-document corpus (no pair exists)") {
    assert(Dedup.jaccardPairs(oneDoc).count() === 0)
    assert(Dedup.containmentPairs(oneDoc).count() === 0)
    assert(Dedup.minhashLshPairs(oneDoc).count() === 0)
    assert(Dedup.simhashCandidates(oneDoc).count() === 0)
  }

  test("connected components converge immediately on an empty pair set") {
    assert(Dedup.dupClusters(Dedup.jaccardPairs(emptyDocs)).count() === 0)
  }

  test("shard packing of an empty corpus is empty") {
    import org.apache.spark.sql.functions._
    val empty = emptyDocs.select(col("doc_id"), col("lang"),
      size(split(col("text"), " ")).as("n_tok"))
    assert(TextAnalysis.packShards(empty, budget = 2000).count() === 0)
  }

  test("end-to-end curation of an empty corpus is empty, of one doc is that doc") {
    assert(CorpusPipeline.curate(emptyDocs).count() === 0)
    val one = CorpusPipeline.curate(oneDoc).collect()
    assert(one.length === 1 && one.head.getLong(0) === 7L)
  }

  test("full curation (p3 chain) survives empty / eval-only / one-corpus-doc inputs") {
    assert(CorpusPipeline.fullCurate(emptyDocs).count() === 0)
    // every doc below the eval split: corpus side is empty, not an error
    val evalOnly = docsOf(Seq((7L, "held out eval doc with words", "en")))
    assert(CorpusPipeline.fullCurate(evalOnly).count() === 0)
    // one corpus doc sharing no 8-gram with the (empty) eval set survives
    val oneCorpus = docsOf(Seq(
      (200L, "one lonely corpus document with several distinct words inside", "en")))
    val got = CorpusPipeline.fullCurate(oneCorpus).collect()
    assert(got.length === 1 && got.head.getLong(0) === 200L)
  }

  test("full curation drops an exact 8-gram overlap with the eval set") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = docsOf(Seq(
      (1L, s"$shared plus eval tail words", "en"),
      (200L, s"$shared contaminated corpus document here", "en"),
      (201L, "totally different clean corpus document with enough words", "en")))
    val got = CorpusPipeline.fullCurate(docs).collect().map(_.getLong(0)).toSet
    assert(!got.contains(200L), "contaminated doc survived")
    assert(got.contains(201L), "clean doc was dropped")
  }

  test("UPSTREAM CANARY: Spark's EXTRACT/date_trunc calendar anchors (the T20 contract)") {
    // The two cross-engine divergences the T20 pin run surfaced, frozen
    // as Spark-side facts so an upgrade that silently moves either fails
    // HERE, not as a scattered fuzz mismatch: (a) Spark EXTRACT(DOW)
    // anchors Sunday=1 where DuckDB anchors Sunday=0 (T20 uses DOY,
    // 1-based in both); (b) Spark date_trunc returns TIMESTAMP at every
    // grain where DuckDB returns DATE for day-or-coarser (T20 CASTs to
    // DATE on both sides). Week anchoring (Monday) agrees and is pinned
    // too — 2024-01-07 is a Sunday, so its week starts 2024-01-01.
    val r = spark.sql(
      "SELECT CAST(EXTRACT(DOW FROM DATE '2024-01-07') AS INT) AS dow, " +
        "CAST(EXTRACT(DOY FROM DATE '2024-01-07') AS INT) AS doy, " +
        "date_trunc('day', TIMESTAMP '2024-01-07 10:00:00') AS d, " +
        "CAST(date_trunc('week', TIMESTAMP '2024-01-07 10:00:00') AS DATE) AS wk").head
    assert(r.getInt(0) === 1, "Spark DOW anchor moved (was Sunday=1)")
    assert(r.getInt(1) === 7, "DOY is 1-based in both engines")
    assert(r.get(2).isInstanceOf[java.sql.Timestamp],
      "Spark date_trunc('day') stopped returning TIMESTAMP")
    assert(r.getDate(3).toString === "2024-01-01", "Monday week anchor moved")
  }

  test("UPSTREAM CANARY: rollup/cube over EMPTY input emits NO grand-total row") {
    // The SQL standard (and DuckDB) emit the empty grouping set as one
    // all-NULL row with COUNT(*)=0 even when the input is empty — the
    // same way a global aggregate does. Spark 4.1.2's rollup()/cube()
    // emit NOTHING (found by the T13 rollup differential, seed 42).
    // The fuzz template papers over the divergence with a symmetric
    // `HAVING cnt > 0`; this canary pins the Spark side so a future
    // Spark that heals to the standard fails HERE loudly, at which point
    // the guard (Fuzz.genRollup) can be retired.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val empty = Seq.empty[(String, Long)].toDF("k", "v")
    assert(empty.rollup($"k").agg(count(lit(1)).as("cnt")).count() === 0L,
      "Spark rollup over empty input now emits rows (standard behavior?) — " +
        "retire genRollup's HAVING guard and re-pin the corpus")
    assert(empty.cube($"k").agg(count(lit(1)).as("cnt")).count() === 0L)
    // while the plain global aggregate DOES emit its zero row — the
    // asymmetry that makes the divergence surprising
    assert(empty.agg(count(lit(1))).count() === 1L)
  }

  test("UPSTREAM CANARY: recursive CTE supports UNION ALL, rejects the distinct arm (T22 contract)") {
    // Spark 4.1.2's UnionLoop handles WITH RECURSIVE ... UNION ALL but
    // rejects UNION (distinct) with UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE —
    // which is why Fuzz.genRecSpine only generates the ALL arm and why no
    // closure-style recursive query (whose termination NEEDS the distinct
    // arm on cyclic edges) can run through spark.sql yet. A future Spark
    // that adds the distinct arm fails HERE loudly, at which point T22
    // can grow a closure arm and dedup_clusters gains a same-text twin.
    val ok = spark.sql(
      "WITH RECURSIVE r(n) AS (SELECT 1 UNION ALL SELECT n+1 FROM r WHERE n < 5) " +
        "SELECT CAST(SUM(n) AS BIGINT) AS s FROM r").collect()
    assert(ok.head.getLong(0) === 15L)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        "WITH RECURSIVE r(n) AS (SELECT 1 UNION SELECT n+1 FROM r WHERE n < 5) " +
          "SELECT COUNT(*) FROM r").collect()
    }
    assert(e.getCondition == "UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE",
      "Spark now accepts the distinct arm in recursive CTEs — extend T22 " +
        s"with a closure arm and re-pin the corpus (got: ${e.getCondition})")
  }
}
