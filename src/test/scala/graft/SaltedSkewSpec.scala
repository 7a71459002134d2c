package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

/** Planted-skew scale evidence for the salted-agg path (r6 verdict
  * item 5): at sf0.1 scale, a 90%-one-key distribution is planted and
  * the salted two-phase aggregation's max per-task shuffle read is
  * asserted to bound far below the naive per-key shape's.
  *
  * The honest naive comparator is `groupByKey(...).mapGroups` — custom
  * per-key logic, the one aggregation shape with NO map-side partial
  * phase, so the hot key's rows all shuffle to ONE task (at 100 TB: one
  * executor receives 90 TB). Catalyst's declarative sum/count aggregates
  * already partial-combine before the shuffle — which is exactly why
  * Skew.saltedSumCount exists as the decomposable-agg replacement for
  * per-key logic over skewed keys, not as a substitute for Catalyst's
  * own partial aggregation.
  */
class SaltedSkewSpec extends SparkSpec {

  test("90%-one-key plant at sf0.1: salted agg bounds the max task share " +
       "the naive per-key shape concentrates") {
    val sf = "/root/testdata/sf0.1"
    // 9 of 10 orderkeys collapse to key 0 → ~90% of ~600k rows are hot.
    // v = l_quantity: integral-valued doubles, so every sum below is
    // exact in IEEE double and the two paths must agree bit-for-bit.
    val base = Tables.t(spark, sf, "lineitem")
      .select(when(col("l_orderkey") % 10 < 9, lit(0L))
                .otherwise(col("l_orderkey")).as("k"),
              col("l_quantity").as("v"))
    val n = base.count()

    import spark.implicits._
    val naive = base.as[(Long, Double)].groupByKey(_._1)
      .mapGroups { (k, it) =>
        var s = 0.0; var c = 0L
        it.foreach { r => s += r._2; c += 1 }
        (k, s, c)
      }.toDF("k", "sum_v", "n")
    val naiveReads = ShuffleCount.taskShuffleReads(spark) {
      naive.queryExecution.toRdd.count()
    }
    assert(naiveReads.nonEmpty, "listener saw no naive-path tasks")
    val naiveMax = naiveReads.max
    // the plant worked: one task really did absorb ~90% of the corpus
    assert(naiveMax >= (n * 0.8).toLong,
      s"plant failed: max task read $naiveMax of $n rows")

    val salted = Skew.saltedSumCount(base, col("k"), col("v"))
    val saltedReads = ShuffleCount.taskShuffleReads(spark) {
      salted.queryExecution.toRdd.count()
    }
    // an empty read-set would make the bound below pass vacuously
    assert(saltedReads.nonEmpty, "listener saw no salted-path tasks")
    val saltedMax = saltedReads.max
    // phase-1 partials spread the hot key over the salt buckets and
    // combine map-side, so no task's shuffle read may come anywhere near
    // the naive hot task; 1/8 is a deliberately loose ceiling (measured
    // ratio is ~1000x) that still fails on any single-task concentration
    assert(saltedMax <= naiveMax / 8,
      s"salted path concentrated: max task read $saltedMax vs naive $naiveMax")

    // same answer, exactly (integral-valued doubles): decomposing the
    // sum over salt buckets must not change a single bit
    val got = salted.collect().map(r =>
      r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    val exp = naive.collect().map(r =>
      r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(got == exp, "salted and naive aggregates disagree")
  }
}
