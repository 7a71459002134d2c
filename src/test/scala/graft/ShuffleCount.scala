package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageSubmitted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Counts the RUNTIME shuffle footprint of a query: jobs started and
  * shuffle-map stages actually submitted while the thunk runs.
  *
  * Why a listener and not the plan string: the expensive pipelines
  * (p1/p2/p3, dedup_clusters) materialize stages through eager
  * localCheckpoints, whose jobs never appear in the final
  * `executedPlan.toString` — but they DO hit the scheduler. Submitted
  * stages with a shuffle dependency are exactly the map sides of
  * exchanges that really executed; stages skipped via ReuseExchange are
  * never submitted, so exchange reuse keeps the count down — which is
  * the behavior worth pinning.
  */
object ShuffleCount {

  final case class Footprint(jobs: Int, shuffleStages: Int)

  def of(spark: SparkSession)(run: => Unit): Footprint = {
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val shuffles = new java.util.concurrent.atomic.AtomicInteger
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        if (org.apache.spark.scheduler.GraftStageInfoAccess
              .isShuffleMapStage(s.stageInfo)) shuffles.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      run
      // the listener bus is async: drain it deterministically (a
      // sleep-poll can undercount on a loaded host and turn the
      // footprint ceilings into false greens)
      org.apache.spark.scheduler.GraftStageInfoAccess
        .waitUntilListenerBusEmpty(spark.sparkContext, 30000)
    } finally spark.sparkContext.removeSparkListener(listener)
    Footprint(jobs.get, shuffles.get)
  }

  /** Per-task shuffle-read record counts across every stage the thunk
    * executes — the raw material for max-task-share (skew) assertions. */
  def taskShuffleReads(spark: SparkSession)(run: => Unit): Seq[Long] = {
    val reads = new scala.collection.concurrent.TrieMap[Long, Long]()
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null && m.shuffleReadMetrics != null)
          reads.put(t.taskInfo.taskId, m.shuffleReadMetrics.recordsRead)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      run
      org.apache.spark.scheduler.GraftStageInfoAccess
        .waitUntilListenerBusEmpty(spark.sparkContext, 30000)
    } finally spark.sparkContext.removeSparkListener(listener)
    reads.values.toSeq
  }
}
