package graft

import graft.operators.BloomPrune
import graft.Tables.t
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning (BloomPrune + BloomMightContainLong): the
  * pruned join must be result-identical to the plain join (no false
  * negatives), actually prune (the whole point), and place the probe
  * below the fact-side exchange inside whole-stage codegen.
  */
class BloomJoinSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def dim = t(spark, dir, "customer")
    .filter(col("c_mktsegment") === "BUILDING" && col("c_acctbal") > 5000)

  private def fact = t(spark, dir, "orders")

  test("pruned join is result-identical to the plain join") {
    val bloom = BloomPrune.bloomOf(dim, "c_custkey")
    val pruned = BloomPrune.prune(fact, col("o_custkey"), bloom)
      .join(dim, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_custkey"))
    val plain = fact.join(dim, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_custkey"))
    assert(rows(pruned) === rows(plain))
    assert(pruned.count() > 0) // non-vacuous
  }

  test("no false negatives, and the prune actually prunes") {
    val bloom = BloomPrune.bloomOf(dim, "c_custkey")
    val total = fact.count()
    val survivors = BloomPrune.prune(fact, col("o_custkey"), bloom).count()
    val exact = fact
      .join(dim, col("o_custkey") === col("c_custkey"), "left_semi").count()
    // survivors ⊇ exact matches (bloom never loses a key) ...
    assert(survivors >= exact, s"false negatives: $survivors < $exact")
    // ... but ≈ selectivity + fpp, far below the full fact (~9% dim here)
    assert(survivors < total / 2,
      s"bloom pruned nothing: $survivors of $total survived")
  }

  test("null fact keys are dropped by the probe (inner-join semantics)") {
    import spark.implicits._
    val bloom = BloomPrune.bloomOf(dim, "c_custkey")
    val withNulls = Seq(Some(1L), None, Some(2L)).toDF("o_custkey")
    // must not throw, and the null row cannot survive
    val out = BloomPrune.prune(withNulls, col("o_custkey"), bloom)
    assert(out.filter(col("o_custkey").isNull).count() === 0)
  }

  test("interpreted eval matches codegen eval row-for-row") {
    val bloom = BloomPrune.bloomOf(dim, "c_custkey")
    val conf = "spark.sql.codegen.wholeStage"
    val before = spark.conf.get(conf)
    val gen = rows(BloomPrune.prune(fact, col("o_custkey"), bloom)
      .select(col("o_orderkey")))
    try {
      spark.conf.set(conf, "false")
      val interp = rows(BloomPrune.prune(fact, col("o_custkey"), bloom)
        .select(col("o_orderkey")))
      assert(interp === gen)
    } finally spark.conf.set(conf, before)
  }

  test("j10: probe sits below the fact-side exchange, in codegen, and the join stays shuffle-hash") {
    val df = SparkEntry.queries("j10_bloom_prune_join")(spark, dir)
    df.queryExecution.toRdd.count() // let AQE finalize
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("bloom_might_contain"), "probe missing from plan:\n" + p)
    assert(p.contains("ShuffledHashJoin"), "expected the at-scale shuffle join shape:\n" + p)
    // tree renders top-down: the probe Filter must be BELOW (printed after)
    // the exchange it protects — pre-shuffle pruning, not post
    val ex = p.indexOf("Exchange")
    assert(ex >= 0 && p.indexOf("bloom_might_contain") > ex,
      "bloom probe not below the exchange:\n" + p)
    assert(p.contains("*("), "probe fell out of whole-stage codegen:\n" + p)
  }

  test("prune cuts the join's shuffled volume by ~the dim selectivity") {
    val bloom = BloomPrune.bloomOf(dim, "c_custkey")
    def joined(f: org.apache.spark.sql.DataFrame) =
      f.join(dim.hint("shuffle_hash"), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"))
    val unpruned = ShuffleCount.taskShuffleReads(spark) {
      joined(fact).queryExecution.toRdd.count()
    }.sum
    val pruned = ShuffleCount.taskShuffleReads(spark) {
      joined(BloomPrune.prune(fact, col("o_custkey"), bloom))
        .queryExecution.toRdd.count()
    }.sum
    // ~9% dim selectivity + 1% fpp: the fact side shrinks ~10×; half is a
    // loose ceiling robust to the dim side's fixed contribution
    assert(pruned < unpruned / 2,
      s"prune did not shrink the shuffle: pruned=$pruned unpruned=$unpruned")
  }

  test("j10 oracle parity on sf0.001 (values, not just shape)") {
    val got = orderedRows(
      SparkEntry.queries("j10_bloom_prune_join")(spark, "/root/testdata/sf0.001"))
    assert(got.nonEmpty)
    assert(got.head.head === "BUILDING")
  }
}
