package org.apache.spark.scheduler

/** Test-scope accessor for `StageInfo.shuffleDepId` (private[spark]).
  * A submitted stage with a shuffle dependency is the map side of an
  * exchange that actually executed — the quantity the plan-hygiene
  * footprint pins count. Same shim pattern as main's graftshim package. */
object GraftStageInfoAccess {
  def isShuffleMapStage(si: StageInfo): Boolean = si.shuffleDepId.isDefined

  /** Drain the async listener bus before reading listener-fed counters —
    * deterministic, unlike a sleep-poll that can silently undercount on a
    * loaded host (throws on timeout instead of returning short counts). */
  def waitUntilListenerBusEmpty(sc: org.apache.spark.SparkContext,
                                timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
