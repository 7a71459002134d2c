package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

/** Hybrid skew join (j12): exactness of the hot/cold branch split, the
  * map-only hot branch (hot rows never enter an exchange), the knownHot
  * fast path, and the maxHot loud-fail.
  *
  * Plant: 90% of lineitem orderkeys collapse onto one hot key — the same
  * plant SaltedSkewSpec uses on the aggregation side — joined to a dim
  * wide enough (one row per distinct key) that the cold branch really
  * shuffles when auto-broadcast is disabled.
  */
class HybridSkewJoinSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  private def planted() = {
    val fact = Tables.t(spark, sf, "lineitem")
      .select(when(col("l_orderkey") % 10 < 9, lit(0L))
                .otherwise(col("l_orderkey")).as("k"),
              col("l_quantity").as("v"))
    // localCheckpoint: the dim's own distinct-shuffle must not pollute
    // the shuffle-read measurements below
    val dim = fact.select(col("k").as("dk")).distinct()
      .withColumn("dv", col("dk") * 2 + 1).localCheckpoint()
    (fact, dim)
  }

  test("hybrid equals the plain join exactly, with both branches populated") {
    val (fact, dim) = planted()
    val hybrid = Skew.hybridSkewJoin(fact, dim, "k", "dk",
      hotThreshold = 1000L)
    val plain = fact.join(dim, col("k") === col("dk"))
    // aggregate comparison (sums of integral-valued doubles are exact),
    // because the raw join is ~54k rows either way
    def digest(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
          sum(col("dv")).as("sd"))
        .collect().map(_.toSeq).toSet
    assert(digest(hybrid) == digest(plain), "branch split changed the join")
    // the plant put the hot key in the broadcast branch and the tail in
    // the shuffle branch — both must carry rows for the test to mean much
    val hotRows = fact.filter(col("k") === 0L).count()
    assert(hotRows >= 1000L && hotRows < fact.count(),
      "plant failed: hot/cold branches not both populated")
  }

  test("hot branch is broadcast-hash, cold branch still shuffle-joins") {
    val (fact, dim) = planted()
    withAutoBroadcastOff {
      val hybrid = Skew.hybridSkewJoin(fact, dim, "k", "dk",
        hotThreshold = 1000L)
      val plan = hybrid.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"hot branch did not broadcast:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"cold branch lost its shuffle join:\n$plan")
    }
  }

  test("hot rows never enter an exchange: shuffle volume drops to the tail") {
    // AQE's OptimizeSkewedJoin SPLITS the plain join's hot partition
    // across tasks, but every hot row is still written to and read from
    // the exchange — so the honest evidence is TOTAL shuffle-read volume,
    // which AQE cannot reduce and the hybrid split does.
    val (fact, dim) = planted()
    withAutoBroadcastOff {
      val n = fact.count()
      val plain = fact.join(dim, col("k") === col("dk"))
      val plainReads = ShuffleCount.taskShuffleReads(spark) {
        plain.queryExecution.toRdd.count()
      }
      assert(plainReads.nonEmpty, "listener saw no plain-join tasks")
      val plainTotal = plainReads.sum
      assert(plainTotal >= (n * 0.9).toLong,
        s"plant failed: plain join shuffled $plainTotal of $n rows")

      val hybrid = Skew.hybridSkewJoin(fact, dim, "k", "dk",
        hotThreshold = 1000L)
      val hybridReads = ShuffleCount.taskShuffleReads(spark) {
        hybrid.queryExecution.toRdd.count()
      }
      assert(hybridReads.nonEmpty, "listener saw no hybrid-join tasks")
      val hybridTotal = hybridReads.sum
      // the hot key's ~90% of rows joined map-side; what shuffles is the
      // skew-free tail plus the detection partials (|keys| rows/partition)
      assert(hybridTotal <= plainTotal / 4,
        s"hybrid still shuffled $hybridTotal rows vs plain $plainTotal")
    }
  }

  test("knownHot skips detection and gives the same rows") {
    val (fact, dim) = planted()
    val detected = Skew.hybridSkewJoin(fact, dim, "k", "dk",
      hotThreshold = 1000L)
    val known = Skew.hybridSkewJoin(fact, dim, "k", "dk",
      hotThreshold = 1000L, knownHot = Some(Seq(0L)))
    assert(rows(detected.groupBy(col("k")).agg(count(lit(1)).as("n"))) ==
           rows(known.groupBy(col("k")).agg(count(lit(1)).as("n"))))
  }

  test("empty hot set degrades to the plain join; maxHot fails loudly") {
    val (fact, dim) = planted()
    val none = Skew.hybridSkewJoin(fact, dim, "k", "dk",
      hotThreshold = Long.MaxValue)
    assert(none.count() == fact.join(dim, col("k") === col("dk")).count())
    val ex = intercept[IllegalArgumentException] {
      Skew.hybridSkewJoin(fact, dim, "k", "dk",
        hotThreshold = 1L, maxHot = 3)
    }
    assert(ex.getMessage.contains("maxHot") ||
      ex.getMessage.contains("hotThreshold"), ex.getMessage)
  }

  test("overflowToCold: overflow keys degrade to the shuffle branch, result stays exact") {
    // the misestimated-threshold case the loud-fail refuses: more keys
    // pass the threshold than maxHot allows. With overflowToCold the
    // heaviest maxHot keys stay hot, the rest join through the ordinary
    // exchange — and the union must STILL equal the plain join, because
    // any hot subset partitions the fact by key.
    val (fact, dim) = planted()
    val capped = Skew.hybridSkewJoin(fact, dim, "k", "dk",
      hotThreshold = 1L, maxHot = 3, overflowToCold = true)
    val plain = fact.join(dim, col("k") === col("dk"))
    assert(rows(capped.groupBy(col("k")).agg(count(lit(1)).as("n"))) ==
           rows(plain.groupBy(col("k")).agg(count(lit(1)).as("n"))))
  }

  private def withAutoBroadcastOff[A](body: => A): A = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try body finally spark.conf.set(key, prev)
  }
}
