package graft

import graft.operators.Skew
import graft.Tables.t
import org.apache.spark.sql.functions._

/** Scale-posture mechanics that need real evidence, not scaladoc claims:
  * bucketed co-located joins (no shuffle at join time) and salted
  * aggregation (exactness under skew).
  */
class ScaleSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("bucketed tables join without an exchange (co-located join)") {
    // tables land in the default spark-warehouse dir (gitignored)
    val o = t(spark, dir, "orders")
    val c = t(spark, dir, "customer")
    o.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("orders_b")
    c.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("customer_b")
    val joined = spark.table("orders_b")
      .join(spark.table("customer_b"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey")).agg(count(lit(1)).as("n"))
    joined.queryExecution.toRdd.count()
    val plan = joined.queryExecution.executedPlan.toString
    // both sides pre-bucketed on the join key → no shuffle before the join
    val exchangesBeforeJoin = plan.split("SortMergeJoin|ShuffledHashJoin").head
    assert(!exchangesBeforeJoin.contains("Exchange hashpartitioning"),
      "bucketed join still shuffled:\n" + plan)
    // cross-check result vs plain join
    val expected = o.join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey")).agg(count(lit(1)).as("n"))
    assert(rows(joined) === rows(expected))
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")
  }

  test("salted sum/count is exact vs direct aggregation") {
    val li = t(spark, dir, "lineitem")
    val direct = li.groupBy(col("l_returnflag").as("k"))
      .agg(sum(col("l_quantity")).as("sum_v"), count(lit(1)).as("n"))
    val salted = Skew.saltedSumCount(li, col("l_returnflag"), col("l_quantity"))
    // doubles: compare sums via rounding (salting changes add order)
    val d = direct.collect().map(r => r.getString(0) -> ((math.rint(r.getDouble(1) * 100) / 100), r.getLong(2))).toMap
    val s = salted.collect().map(r => r.getString(0) -> ((math.rint(r.getDouble(1) * 100) / 100), r.getLong(2))).toMap
    assert(d === s)
  }

  test("bucket pruning: a point lookup on the bucket key reads ONE bucket") {
    t(spark, dir, "orders").write.bucketBy(8, "o_custkey")
      .mode("overwrite").saveAsTable("orders_bp")
    // without this, the planner falls back to a plain (non-bucketed) scan
    // for filter-only queries and pruning never engages
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val q = spark.table("orders_bp").filter(col("o_custkey") === 42L)
      q.queryExecution.toRdd.count()
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount: 1 out of 8"),
        "bucket pruning did not engage:\n" + plan)
      assert(rows(q.orderBy("o_orderkey")) ===
        rows(t(spark, dir, "orders").filter(col("o_custkey") === 42L)
          .orderBy("o_orderkey")))
    } finally {
      spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
      spark.sql("DROP TABLE IF EXISTS orders_bp")
    }
  }

  test("order-independent aggregates survive an adversarial repartitioning") {
    // the exactness claims (dsum fixed-point, e6/e9 per-row quantization)
    // promise partition-layout independence, not just same-plan
    // determinism — so force a hostile layout and diff against default
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    for (name <- Seq("q1_agg", "g16_incremental_agg", "m2_lang_centroid", "g13_stats")) {
      val fn = SparkEntry.queries(name)
      val base = fn(spark, dir).collect().map(_.toSeq).toSeq
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      try {
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        val jittered = fn(spark, dir).collect().map(_.toSeq).toSeq
        assert(jittered === base, s"$name changed under repartitioning")
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
  }

  test("AQE skew join: a hot key splits into subpartitions at runtime, result unchanged") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 1 key carries 100k rows, 99 keys carry 100 each; thresholds tuned
    // down so local-scale data trips the same splitter production uses
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") // force SMJ so skew handling engages
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val left = spark.range(0, 109900)
        .select(when($"id" < 100000, 0L).otherwise(($"id" - 100000) % 99 + 1).as("k"),
          $"id".as("v"))
      val right = spark.range(0, 100).select($"id".as("k"), ($"id" * 10).as("w"))
      val joined = left.join(right, "k")
      assert(joined.queryExecution.toRdd.count() === 109900) // finalize AQE
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), "AQE did not mark the skewed join:\n" + p)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salted distinct-count is exact vs countDistinct") {
    val o = t(spark, dir, "orders")
    val direct = o.groupBy(col("o_orderstatus").as("k"))
      .agg(countDistinct(col("o_custkey")).as("n_distinct"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedDistinctCount(o, col("o_orderstatus"), col("o_custkey"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(direct === salted)
  }

  test("ScaleBench corpus scaler: zero cross-copy shingle overlap, stopwords preserved") {
    // the scaling curves' validity rests on two properties of the
    // copy-tagged corpus: copies are FRESH document populations (no
    // cross-copy near-dup pairs manufactured by replication), and the
    // p1 quality gate sees the same stopword-ratio distribution at
    // every factor — pin both so a tag-injection edit can't silently
    // bend the curves
    import org.apache.spark.sql.functions._
    val base = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents").limit(60)
    val scaled = ScaleBench.scaledDocs(spark, base, 2)
      .select(col("doc_id"), col("text")).localCheckpoint()
    assert(scaled.count() === 120)
    val sh = graft.ext.Dedup.shingles(scaled)
      .withColumn("copy", (col("doc_id") / 1000000L).cast("long"))
    val crossCopy = sh.groupBy(col("shingle"))
      .agg(countDistinct(col("copy")).as("nc"))
      .filter(col("nc") > 1)
    assert(crossCopy.count() === 0,
      "copy tags leaked: shingles shared across copies would manufacture " +
        "x-factor^2 duplicate pairs and bend the scaling curves")
    // stopword hit counts are invariant under tagging (gate realism)
    val hitsBase = base.select(sum(graft.ext.TextAnalysis.hits(col("text"),
      graft.ext.TextAnalysis.enPat))).first().getLong(0)
    val hitsScaled = scaled.select(sum(graft.ext.TextAnalysis.hits(col("text"),
      graft.ext.TextAnalysis.enPat))).first().getLong(0)
    assert(hitsScaled === 2 * hitsBase,
      "tag injection changed stopword statistics — the quality gate would " +
        "behave differently across factors")
  }

  test("ScaleBench embedding scaler: copy 0 untouched, rotations norm-preserving and distinct") {
    // the ANN curves' validity rests on copies being fresh vector
    // populations with the SAME per-copy geometry: copy 0 must be the
    // base corpus bit-for-bit (query vectors keep their ids and values),
    // every copy must preserve norms/dim (rotation, not noise), and
    // rotated copies must not equal their base vector (no literal clones
    // handing the index free recall)
    import org.apache.spark.sql.functions._
    val base = graft.Tables.t(spark, "/root/testdata/sf0.001", "embeddings").limit(50)
    val scaled = ScaleBench.scaledEmbeddings(spark, base, 3).localCheckpoint()
    assert(scaled.count() === 150)
    // ids stay DENSE 0..f·n-1 — the stride centroid init's table contract
    assert(scaled.agg(min(col("vec_id")), max(col("vec_id")),
        countDistinct(col("vec_id"))).first().toSeq === Seq(0L, 149L, 150L),
      "scaled ids not dense 0..f*n-1 — ivfCentroids' stride init would starve")
    // copy 0 = base, bit-for-bit
    val copy0 = scaled.filter(col("vec_id") < 50L)
    assert(copy0.exceptAll(base).count() === 0 &&
      base.exceptAll(copy0).count() === 0,
      "copy 0 drifted from the base corpus — query ids/values must survive scaling")
    // rotation preserves the element multiset (hence norm and dim) ...
    val badNorm = scaled
      .withColumn("copy", (col("vec_id") / 50L).cast("long"))
      .withColumn("base_id", pmod(col("vec_id"), lit(50L)))
      .withColumn("sorted", array_sort(col("embedding")))
      .groupBy(col("base_id"))
      .agg(countDistinct(col("sorted")).as("nd"), count(lit(1)).as("nc"))
      .filter(col("nd") =!= 1)
    assert(badNorm.count() === 0,
      "a copy changed its vector's element multiset — scaler must rotate, not perturb")
    // ... while every k>0 copy differs from the base vector (fresh direction)
    val clones = scaled.filter(col("vec_id") >= 50L)
      .withColumn("base_id", pmod(col("vec_id"), lit(50L)))
      .join(base.select(col("vec_id").as("base_id"),
        col("embedding").as("base_emb")), Seq("base_id"))
      .filter(col("embedding") === col("base_emb"))
    assert(clones.count() === 0,
      "a rotated copy equals its base vector — clones would hand the index free recall")
  }
}
