package graft

import graft.operators.LoopCkpt
import org.apache.spark.sql.functions._

/** Reliable-tier loop lifecycle: one static exit hook over a registry of
  * live loop dirs (round-13 advice: a per-instance hook accumulated
  * O(#loops) hook threads and retained every finished loop's directory
  * until process exit), with an explicit close() for callers that have
  * consumed the final frame. Within-loop O(1)-in-K disk is pinned by the
  * liveRound bookkeeping; this spec pins the ACROSS-loop lifecycle. */
class LoopCkptSpec extends SparkSpec {

  test("close() deletes the loop dir and deregisters it from the exit sweep") {
    val df = spark.range(100).select(col("id"))
    val before = LoopCkpt.liveCount
    val lc = new LoopCkpt(spark, reliable = true)
    val pinned = lc.pin(df)
    val r1 = lc.round(pinned.withColumn("x", col("id") * 2))
    assert(r1.count() === 100)
    assert(LoopCkpt.liveCount === before + 1)
    val root = new java.io.File(new java.net.URI(lc.rootPath.get).getPath
      match { case "" => lc.rootPath.get; case p => p })
    assert(root.exists(), s"loop dir missing before close: $root")
    lc.close()
    assert(LoopCkpt.liveCount === before, "close() did not deregister")
    assert(!root.exists(), s"close() left the loop dir behind: $root")
    lc.close() // idempotent
    assert(LoopCkpt.liveCount === before)
  }

  test("N reliable loops register N entries; closes drain them all") {
    val df = spark.range(10).toDF("id")
    val before = LoopCkpt.liveCount
    val loops = (1 to 3).map { _ =>
      val lc = new LoopCkpt(spark, reliable = true)
      lc.round(df)
      lc
    }
    assert(LoopCkpt.liveCount === before + 3)
    loops.foreach(_.close())
    assert(LoopCkpt.liveCount === before)
  }

  test("local tier (reliable = false) registers nothing") {
    val before = LoopCkpt.liveCount
    val lc = new LoopCkpt(spark, reliable = false)
    assert(lc.round(spark.range(5).toDF("id")).count() === 5)
    assert(LoopCkpt.liveCount === before)
    lc.close()
  }
}
