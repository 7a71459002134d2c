package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-loop checkpoint manager for the iterative operators (PageRank,
  * label-propagation cluster collapse). Both loops need every round's
  * table materialized — otherwise K iterations embed K copies of the
  * upstream derivation in one plan and wall time becomes planner-weather
  * (root-caused in PERF.md §gr1-stabilization) — but the two reliability
  * tiers manage that state very differently:
  *
  *   - `reliable = false` (default; local mode / short jobs):
  *     `localCheckpoint` — executor-memory blocks, fastest, evicted with
  *     the executors; an executor loss mid-loop fails the job.
  *   - `reliable = true` (multi-executor clusters): each round is written
  *     to parquet under a managed loop directory and read back —
  *     durable-storage lineage truncation, so a lost executor recomputes
  *     from the last round instead of dying.
  *
  * The reliable tier fixes two lifecycle leaks the naive
  * `SparkContext.checkpoint` form had (round-12 advice): (1) it never
  * calls `setCheckpointDir`, so a caller-configured checkpoint location
  * is respected as the loop-dir PARENT rather than clobbered (and when
  * none is set, a process-local temp dir is the documented single-JVM
  * fallback); (2) on-disk state is O(1) in the round count, not O(K) —
  * a round write completing proves everything that round derived from is
  * fully materialized in the new file, so every earlier round file is
  * superseded and deleted immediately. `pin` checkpoints loop-invariant
  * inputs (edge lists, degree tables) that every round re-reads; pins
  * live for the whole loop. The final round's file must outlive the
  * returned lazy frame (callers compose orderBy/joins on it), so the
  * loop directory itself is removed by a JVM shutdown hook, not eagerly.
  */
private[graft] final class LoopCkpt(s: SparkSession, reliable: Boolean) {
  private val root: Option[Path] =
    if (!reliable) None
    else {
      val base = s.sparkContext.getCheckpointDir.getOrElse(
        java.nio.file.Files.createTempDirectory("graft-ckpt").toString)
      Some(new Path(base,
        "graft-loop-" + java.util.UUID.randomUUID().toString.take(12)))
    }
  private val fs = root.map(_.getFileSystem(s.sparkContext.hadoopConfiguration))
  root.foreach { r =>
    val f = fs.get
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try { f.delete(r, true); () } catch { case _: Throwable => () }))
  }
  private var seq = 0
  // at most ONE live (non-pinned) round file exists at any moment
  private var liveRound: Option[Path] = None

  /** Checkpoint a loop-invariant input; kept for the loop's lifetime. */
  def pin(df: DataFrame): DataFrame = ckpt(df, pinned = true)

  /** Checkpoint a round table; deletes the superseded previous round. */
  def round(df: DataFrame): DataFrame = ckpt(df, pinned = false)

  /** Current on-disk round file, exposed for the lifecycle spec. */
  private[graft] def liveRoundPath: Option[String] =
    liveRound.map(_.toString)
  private[graft] def rootPath: Option[String] = root.map(_.toString)

  private def ckpt(df: DataFrame, pinned: Boolean): DataFrame =
    root match {
      case None => df.localCheckpoint()
      case Some(r) =>
        seq += 1
        val p = new Path(r, f"$seq%04d")
        df.write.parquet(p.toString)
        if (!pinned) {
          liveRound.foreach(old =>
            try { fs.get.delete(old, true); () } catch { case _: Throwable => () })
          liveRound = Some(p)
        }
        df.sparkSession.read.parquet(p.toString)
    }
}
