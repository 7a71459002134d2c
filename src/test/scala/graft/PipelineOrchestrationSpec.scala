package graft

import graft.pipeline.{Control, Pipeline}
import java.nio.file.Files

/** SURVEY §3.1 end-to-end: gated P2→P4+mart orchestration into a parquet
  * warehouse, crash-safe re-runs (idempotent loads), run-log trail. */
class PipelineOrchestrationSpec extends SparkSpec {

  test("runAll builds the warehouse, re-run is a no-op, log trail complete") {
    val csvDir = getClass.getResource("/lottery").getPath
    val root = Files.createTempDirectory("wh").toString + "/wh"

    val mart1 = Pipeline.runAll(spark, csvDir, root)
    assert(mart1.count() === 4) // numbers 9, 33, 45, 78

    val lay = Pipeline.Layout(root)
    val factCount = spark.read.parquet(lay.factPrize).count()
    assert(factCount === 6)

    // second run over the SAME csvs: idempotent (A1-A3 contract end-to-end)
    val mart2 = Pipeline.runAll(spark, csvDir, root)
    assert(mart2.count() === 4)
    assert(spark.read.parquet(lay.factPrize).count() === factCount)
    assert(spark.read.parquet(lay.dimDate).count() === 3)

    // log trail: every stage incl. the P1 crawler-drop gate has a
    // SUCCESS; gates see it — the reference's four-stage story, 4/4
    Seq("P1", "P2", "P3", "P4", "MART").foreach { st =>
      assert(Control.lastStatusIsSuccess(spark, lay.processLog, st), st)
    }
    // run correlation survives in the log: every process_id appears as a
    // RUNNING + terminal pair with a consistent source_id
    val log = spark.read.schema(Control.processLogSchema).parquet(lay.processLog)
    val byId = log.collect().groupBy(_.getAs[Long]("process_id"))
    byId.foreach { case (id, rows) =>
      assert(rows.length === 2, s"process_id $id has ${rows.length} rows")
      assert(rows.map(_.getAs[String]("status")).contains("RUNNING"), id)
      assert(rows.map(_.getAs[Int]("source_id")).distinct.length === 1, id)
    }
  }

  test("Observation: stage metrics ride the write pass itself — no second count job") {
    // the production shape for the run-log's row counts: attach an
    // Observation to the stage's plan and read the metrics after the
    // SAME action that materialized the stage, instead of a separate
    // df.count() that re-runs the scan (at 100 TB a metrics-only rescan
    // is a real cost). Exactness: the observed count/sum must equal the
    // ground truth computed independently.
    import org.apache.spark.sql.Observation
    import org.apache.spark.sql.functions._
    val df = Tables.t(spark, "/root/testdata/sf0.001", "orders")
    val obs = Observation("stage_metrics")
    val out = java.nio.file.Files.createTempDirectory("obs").toString + "/o"
    df.observe(obs,
        count(lit(1)).as("n_rows"),
        sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .as("total_price"))
      .write.parquet(out)
    val m = obs.get
    assert(m("n_rows") === df.count())
    assert(m("total_price") ===
      df.agg(sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2))))
        .head().getDecimal(0))
    // and the written stage is intact
    assert(spark.read.parquet(out).count() === m("n_rows"))
  }

  test("P2 is gated on P1: an empty crawler drop fails at P1, nothing downstream runs") {
    val emptyDrop = Files.createTempDirectory("emptydrop").toString
    val root = Files.createTempDirectory("wh").toString + "/wh"
    val e = intercept[Exception](Pipeline.runAll(spark, emptyDrop, root))
    assert(e.getMessage.contains("P1"), e.getMessage)
    val lay = Pipeline.Layout(root)
    assert(!Control.lastStatusIsSuccess(spark, lay.processLog, "P1"))
    // P2 never started: its stage row is absent entirely
    val log = spark.read.schema(Control.processLogSchema).parquet(lay.processLog)
    assert(log.filter(org.apache.spark.sql.functions.col("process_code") === "P2").count() === 0)
  }
}
