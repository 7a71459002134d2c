package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** Micro-bench for the IVF assignment stage: the round-6 map-only
  * broadcast-array argmax vs the round-5 crossJoin(×nlist)+window shape it
  * replaced. The corpus is the sf embeddings replicated `factor`× (vector
  * CONTENT does not matter for assignment cost — only row count × nlist ×
  * dim arithmetic and the shuffle structure do), cached so both shapes
  * read the same in-memory input.
  *
  * Prints one JSON line per shape with best-of-2 wall seconds — the
  * numbers quoted in PERF.md §IVF-assignment.
  *
  * "sweep" mode (PERF.md §assignment-budget, r13 verdict item 7):
  * assignment cost vs nlist at the chosen corpus size — the exact flat
  * argmax is O(n·nlist·dim) multiplies, so at large nlist this term IS
  * the epoch-build budget. Per nlist the sweep measures the exact path,
  * the two-level coarse-pruned path (√nlist groups, 3/8 probed —
  * `Similarity.ivfTrainedAssignPruned`), the speedup, and the
  * exact-vs-pruned agreement fraction. Run at two factors for the
  * (n, nlist) surface.
  *
  * Usage: runMain graft.AssignBench [sfDir] [factor]
  *        runMain graft.AssignBench [sfDir] [factor] sweep [nlists...]
  */
object AssignBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(1000)
    val sweepMode = args.contains("sweep")
    val sweepNlists = args.dropWhile(_ != "sweep").drop(1).map(_.toInt) match {
      case e if e.isEmpty => Seq(64, 256, 1024, 4096)
      case xs => xs.toSeq
    }
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = Tables.t(spark, dir, "embeddings")
    val emb = base.crossJoin(spark.range(factor.toLong).select(col("id")))
      .select((col("vec_id") * factor + col("id")).as("vec_id"), col("embedding"))
      .repartition(32)
      .cache()
    val n = emb.count() // materialize the cache before timing

    if (sweepMode) {
      def num(v: Double, p: Int): String = Fmt.num(v, p)
      def bestOf2(mk: => DataFrame): Double =
        (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          mk.queryExecution.toRdd.count()
          (System.nanoTime() - t0) / 1e9
        }.min
      for (nlist <- sweepNlists) {
        // stride "centroids" re-used as the ce6 table: assignment cost
        // depends only on n × nlist × dim arithmetic, not on centroid
        // quality, and stride init is O(1 scan) at any nlist (a Lloyd
        // train at nlist=4096 would dominate the sweep's wall)
        val cents = Similarity.ivfCentroids(emb, nlist)
          .select(col("centroid_id"), expr(
            "transform(centroid, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT))")
            .as("ce6"))
          .localCheckpoint()
        val g = math.max(1, math.floor(math.sqrt(
          cents.count().toDouble)).toInt)
        val c = math.max(2, g / 8)
        // the group table is the train-once handle (once per epoch);
        // its build cost is index-parameter-sized and reported separately
        val tg0 = System.nanoTime()
        val grouped = Similarity.ivfSuperGroups(cents, g).localCheckpoint()
        val groupBuildSec = (System.nanoTime() - tg0) / 1e9
        def prunedDf = Similarity.ivfTrainedAssignPruned(emb, cents,
          grouped = Some(grouped))
        // warm both paths (codegen compile + broadcast build)
        Similarity.ivfTrainedAssign(emb, cents).queryExecution.toRdd.count()
        prunedDf.queryExecution.toRdd.count()
        val tExact = bestOf2(Similarity.ivfTrainedAssign(emb, cents))
        val tPruned = bestOf2(prunedDf)
        val exact = Similarity.ivfTrainedAssign(emb, cents)
          .select(col("vec_id"), col("centroid_id").as("ce"))
        val pruned = prunedDf
          .select(col("vec_id"), col("centroid_id").as("cp"))
        val agree = exact.join(pruned, "vec_id")
          .agg(avg(when(col("ce") === col("cp"), 1.0).otherwise(0.0)))
          .head().getDouble(0)
        println(s"""{"metric":"assign_budget","n_vectors":$n,""" +
          s""""nlist":$nlist,"groups":$g,"probe":$c,""" +
          s""""exact_sec":${num(tExact, 3)},"pruned_sec":${num(tPruned, 3)},""" +
          s""""group_build_sec":${num(groupBuildSec, 3)},""" +
          s""""speedup":${num(tExact / tPruned, 2)},""" +
          s""""agreement":${num(agree, 4)}}""")
      }
      spark.stop()
      return
    }

    val cents = Similarity.ivfCentroids(base, 16).localCheckpoint()

    // The r5 shape, kept HERE only as the measurement baseline: expand
    // every vector ×nlist against the broadcast centroid table, argmax
    // via row_number over a vec_id-partitioned window — one full shuffle
    // of n×nlist scored rows.
    def r5Assign(embeddings: DataFrame, centroids: DataFrame): DataFrame = {
      val scored = embeddings.crossJoin(broadcast(centroids))
        .withColumn("sim_e9",
          Similarity.cosineE9(Similarity.cosine("embedding", "centroid")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("vec_id"))
        .orderBy(col("sim_e9").desc, col("centroid_id").asc)
      scored.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
        .select(col("vec_id"), col("embedding"), col("centroid_id"))
    }

    def bestOf2(mk: => DataFrame): Double =
      (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        mk.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }.min

    // warm all paths once (codegen compile, broadcast build)
    r5Assign(emb, cents).queryExecution.toRdd.count()
    Similarity.ivfAssignHof(emb, cents).queryExecution.toRdd.count()
    Similarity.ivfAssign(emb, cents).queryExecution.toRdd.count()

    val tOld = bestOf2(r5Assign(emb, cents))
    // the intermediate map-only HOF form (kept as the spec baseline):
    // same plan shape as the shipped path but transform+array_max is
    // CodegenFallback — this row is what justified the native expression
    val tHof = bestOf2(Similarity.ivfAssignHof(emb, cents))
    val tNew = bestOf2(Similarity.ivfAssign(emb, cents))
    // Locale.ROOT keeps the JSON valid on comma-decimal default locales
    // (the f interpolator is locale-sensitive)
    def num(v: Double, p: Int): String = Fmt.num(v, p)
    println(s"""{"metric":"ivf_assign","n_vectors":$n,"nlist":16,"r5_crossjoin_window_sec":${num(tOld, 3)},"maponly_hof_sec":${num(tHof, 3)},"r6_native_sec":${num(tNew, 3)},"speedup_vs_r5":${num(tOld / tNew, 2)},"speedup_vs_hof":${num(tHof / tNew, 2)}}""")
    spark.stop()
  }
}
