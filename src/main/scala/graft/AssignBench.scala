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
  * Usage: runMain graft.AssignBench [sfDir] [factor]
  */
object AssignBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(1000)
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
