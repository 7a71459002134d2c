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

    // log trail: every stage has a SUCCESS; gates see it
    Seq("P2", "P3", "P4", "MART").foreach { st =>
      assert(Control.lastStatusIsSuccess(spark, lay.processLog, st), st)
    }
  }
}
