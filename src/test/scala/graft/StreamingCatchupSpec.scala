package graft

import graft.Tables.t
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** End-to-end streaming catch-up after a simulated outage (r6 verdict
  * item 7): the scheduled-pipeline lifecycle — deliver files, drain with
  * Trigger.AvailableNow, go down while new files AND an at-least-once
  * duplicate redelivery accumulate, cold-start a NEW query from the same
  * checkpoint, drain again — reconciled row-for-row against the batch
  * twin over everything ever delivered.
  *
  * What the checkpoint must carry across the outage for this to pass:
  * source offsets (run 2 must not re-emit run 1's files) and the
  * dedupe state (the redelivered file's rows are duplicates from a
  * PREVIOUS run — only checkpointed state can drop them). The
  * effectively-once contract = at-least-once delivery + checkpointed
  * dedupe + append sink.
  */
class StreamingCatchupSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("cold restart from checkpoint reconciles with the batch twin after an outage") {
    import spark.implicits._
    val events = t(spark, dir, "events").orderBy("event_id").as[Ev].collect()
    val (a, rest) = events.splitAt(400)
    val b = rest.take(300)

    val inbox = java.nio.file.Files.createTempDirectory("catchup_in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("catchup_ck").toString
    val out = java.nio.file.Files.createTempDirectory("catchup_out").toString + "/sink"

    def deliver(evs: Seq[Ev]): Unit =
      evs.toDF().coalesce(1).write.mode("append").parquet(inbox)

    // the pipeline under test: event-time watermark, dedupe by event_id,
    // enrich against a broadcast static dim — the same shape the oracled
    // e-suite uses. The wide watermark keeps every delivery inside the
    // dedupe horizon for this test; production bounds it by the upstream
    // redelivery window so state stays finite.
    val dim = Seq(("view", "browse"), ("click", "browse"),
      ("purchase", "convert"), ("signup", "convert"))
      .toDF("event_type", "category")
    def transform(df: DataFrame): DataFrame = df
      .withColumn("tss", graft.streaming.EventStream.tsCol)
      .withWatermark("tss", "3650 days")
      .dropDuplicatesWithinWatermark("event_id")
      .join(broadcast(dim), Seq("event_type"), "left_outer")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("category"), col("value"))

    def drainOnce(): Unit = {
      val q = transform(
        spark.readStream.schema(Encoders(spark)).parquet(inbox))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      try assert(q.awaitTermination(120000), "AvailableNow did not self-terminate")
      finally q.stop()
    }

    // run 1: the scheduled job drains delivery A, then "the cluster dies"
    deliver(a.toSeq)
    drainOnce()
    assert(spark.read.parquet(out).count() === a.length.toLong)

    // outage: delivery B arrives, AND the upstream redelivers half of A
    // (at-least-once semantics — a crashed producer resends)
    deliver(b.toSeq)
    deliver(a.take(200).toSeq)

    // run 2: a brand-new query instance cold-starts from the checkpoint
    drainOnce()

    // RAW sink count first: the set-based reconciliation below is
    // duplicate-blind, so this is the assertion that actually proves
    // effectively-once — lost dedupe state or offsets would re-emit the
    // redelivered 200 rows (or all of A) and land above 700 here
    assert(spark.read.parquet(out).count() === (a.length + b.length).toLong,
      "sink row count shows double-emission after the cold restart")

    // reconcile against the batch twin over EVERYTHING ever delivered:
    // same transform minus the streaming-only dedupe operator
    val delivered = spark.read.parquet(inbox)
    val twin = delivered.dropDuplicates("event_id")
      .join(broadcast(dim), Seq("event_type"), "left_outer")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("category"), col("value"))
    val got = rows(spark.read.parquet(out)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("category"), col("value")))
    assert(got === rows(twin),
      "stream output after catch-up diverged from the batch twin")
    // and the counts tell the effectively-once story exactly: 700
    // distinct events from 900 delivered rows, zero double-emissions
    assert(got.size === a.length + b.length)
  }

  /** Schema of the typed event rows as the file source needs it. */
  private def Encoders(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    Seq.empty[Ev].toDF().schema
  }
}
