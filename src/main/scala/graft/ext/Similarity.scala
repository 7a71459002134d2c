package graft.ext

import graft.{Q, QModule}
import graft.Tables.t
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (extension tier;
  * Array[Float] 64-dim vectors, FIXTURES.md §B).
  *
  * Cosine is computed by an in-order higher-order-function fold with every
  * element cast to double *before* multiplying — the fold order is the list
  * order in both Spark and DuckDB, so results are bit-identical and
  * hash-comparable (no UDF, stays in the optimized expression path).
  *
  * Scale posture: brute-force top-k is one map stage + TakeOrderedAndProject
  * (no shuffle of the vectors); the pairwise variant self-joins only for
  * oracle-sized data — at 100 TB the LSH-bucketed path replaces it: random
  * hyperplane signatures → one shuffle on (bucket), candidates only within
  * buckets (~linear), exact re-rank inside each bucket.
  */
object Similarity {

  /** In-order fold sum of a double-array SQL expression (reference
    * semantics for the native expression below; kept for documentation
    * and spec cross-checks). */
  private def foldSum(arrExpr: String): String =
    s"aggregate($arrExpr, CAST(0 AS DOUBLE), (acc, v) -> acc + v)"

  /** HOF-fold dot product — semantically identical to vecDot but
    * CodegenFallback (interpreted per element); used only as the
    * cross-check baseline in SimilarityExprSpec. */
  def dotHof(a: String, b: String): Column = expr(foldSum(
    s"zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE))"))

  /** dot(a, b): native codegen'd expression, double accumulation in
    * element order (graft.functions.FloatVectorDot). */
  def dot(a: String, b: String): Column =
    graft.functions.VectorFunctions.vecDot(col(a), col(b))

  def norm(a: String): Column = sqrt(dot(a, a))

  def cosine(a: String, b: String): Column = dot(a, b) / norm(a) / norm(b)

  /** Cosine in integer nano-units: the two engines' fold sums can differ in
    * the last ulp (~1e-16), so hash-compared outputs carry
    * floor(cosine·1e9 + 0.5) instead of the raw double. */
  def cosineE9(c: Column): Column = floor(c * 1e9 + 0.5).cast("long")

  /** Brute-force cosine top-k against one query vector. */
  def topK(embeddings: DataFrame, queryVecId: Long, k: Int): DataFrame =
    embeddings.as("e")
      .crossJoin(broadcast(embeddings.filter(col("vec_id") === queryVecId)
        .select(col("embedding").as("q"))))
      .filter(col("vec_id") =!= queryVecId)
      .select(col("vec_id"), cosine("embedding", "q").as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
      .limit(k)
      .select(col("vec_id"), cosineE9(col("cosine")).as("cosine_e9"))

  // --- LSH-bucketed ANN (the 100 TB path) --------------------------------

  /** Deterministic ±1 hyperplane weights (LCG seeded per plane/dim). */
  def planeWeights(planes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(planes, dim) { (p, d) =>
      val x = (p * 1315423911L + d * 2654435761L + 97531L) * 6364136223846793005L + 1442695040888963407L
      if (((x >>> 33) & 1L) == 1L) 1.0 else -1.0
    }

  /** Random-hyperplane signature bucket (int of `planes` sign bits). */
  def lshBucket(embCol: String, planes: Int = 12, dim: Int = 64): Column = {
    val ws = planeWeights(planes, dim)
    val bits = (0 until planes).map { p =>
      val arr = ws(p).mkString("array(", ",", ")")
      when(expr(foldSum(s"zip_with($embCol, $arr, (x, w) -> CAST(x AS DOUBLE) * w)")) >= 0,
        lit(1 << p)).otherwise(lit(0))
    }
    bits.reduce(_ + _)
  }

  // --- IVF-style ANN (coarse quantizer + probed lists) -------------------

  /** Deterministic coarse centroids: every (n/nlist)-th vector by vec_id —
    * a seedless, reproducible stand-in for k-means (at 100 TB you train
    * centroids once offline; assignment below is the scale path). */
  def ivfCentroids(embeddings: DataFrame, nlist: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("vec_id"))
    embeddings
      .withColumn("rn", row_number().over(w) - 1)
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .filter(col("rn") % greatest(floor(col("n") / nlist), lit(1)) === 0)
      .limit(nlist)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid"))
  }

  /** Assign each vector to its nearest centroid (broadcast centroid table;
    * one map-side argmax per vector — no shuffle of the vectors). */
  def ivfAssign(embeddings: DataFrame, centroids: DataFrame): DataFrame = {
    val scored = embeddings.crossJoin(broadcast(centroids))
      .withColumn("sim", cosine("embedding", "centroid"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id"))
      .orderBy(col("sim").desc, col("centroid_id").asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("vec_id"), col("embedding"), col("centroid_id"))
  }

  /** IVF ANN: rank centroids against the query, probe the top `nprobe`
    * inverted lists, exact re-rank inside them. */
  def ivfTopK(embeddings: DataFrame, queryVecId: Long, k: Int,
              nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val centroids = ivfCentroids(embeddings, nlist)
    val assigned = ivfAssign(embeddings, centroids)
    val q = embeddings.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("q"))
    val probed = centroids.crossJoin(broadcast(q))
      .withColumn("sim", cosine("centroid", "q"))
      .orderBy(col("sim").desc, col("centroid_id").asc)
      .limit(nprobe)
      .select(col("centroid_id"))
    assigned.join(broadcast(probed), Seq("centroid_id"))
      .crossJoin(broadcast(q))
      .filter(col("vec_id") =!= queryVecId)
      .select(col("vec_id"), cosine("embedding", "q").as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
      .limit(k)
  }

  /** ANN: probe the query's LSH bucket only, exact re-rank inside it. */
  def annTopK(embeddings: DataFrame, queryVecId: Long, k: Int): DataFrame = {
    val bucketed = embeddings.withColumn("bucket", lshBucket("embedding"))
    val qb = bucketed.filter(col("vec_id") === queryVecId)
      .select(col("bucket").as("qbucket"), col("embedding").as("q"))
    bucketed.join(broadcast(qb), col("bucket") === col("qbucket"))
      .filter(col("vec_id") =!= queryVecId)
      .select(col("vec_id"), cosine("embedding", "q").as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
      .limit(k)
  }
}

object SimilarityQueries extends QModule {
  import Similarity._

  private val duckCosine =
    """list_sum(list_transform(list_zip(a.embedding, b.embedding),
      |                        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
      | / sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      | / sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))""".stripMargin

  def qs: Seq[Q] = Seq(
    // Brute-force cosine top-10 for query vector 0 (the exact baseline).
    Q("sim_topk_cosine", (s, dir) =>
      topK(t(s, dir, "embeddings"), 0L, 10),
      sql = Some(s"""
      SELECT vec_id, CAST(floor(cosine * 1e9 + 0.5) AS BIGINT) AS cosine_e9 FROM (
        SELECT b.vec_id, $duckCosine AS cosine
        FROM embeddings b
        CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) a(embedding)
        WHERE b.vec_id <> 0
        ORDER BY cosine DESC, b.vec_id ASC LIMIT 10) t
    """), headline = true),

    // Pairwise near-dup by cosine threshold (embedding-cosine dedup).
    Q("dedup_embedding_cosine", (s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      e.as("x").join(e.as("y"), col("x.vec_id") < col("y.vec_id"))
        .select(col("x.vec_id").as("vec_i"), col("y.vec_id").as("vec_j"),
          (dot("x.embedding", "y.embedding")
            / norm("x.embedding") / norm("y.embedding")).as("cosine"))
        .filter($"cosine" >= 0.4)
        .select($"vec_i", $"vec_j", cosineE9($"cosine").as("cosine_e9"))
        .orderBy($"vec_i", $"vec_j")
    }, sql = Some(s"""
      SELECT vec_i, vec_j, CAST(floor(cosine * 1e9 + 0.5) AS BIGINT) AS cosine_e9 FROM (
        SELECT a.vec_id AS vec_i, b.vec_id AS vec_j, $duckCosine AS cosine
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id) t
      WHERE cosine >= 0.4
      ORDER BY vec_i, vec_j
    """)),

    // ANN via random-hyperplane LSH bucket probe — engine-specific bucketing
    // → rows-only for the driver; SimilaritySpec checks bucket containment
    // and ordering against the brute-force baseline.
    Q("sim_ann_lsh", (s, dir) =>
      annTopK(t(s, dir, "embeddings"), 0L, 10)),

    // ANN via IVF coarse quantizer (nlist lists, nprobe probed) —
    // engine-specific index → rows-only; recall spec in ExtensionSpec.
    Q("sim_ann_ivf", (s, dir) =>
      ivfTopK(t(s, dir, "embeddings"), 0L, 10)),

    // Cross-modal join: text table ⋈ vector table on the shared id, per
    // language: doc count, total chars, Σ‖v‖² in micro-units (per-row fold
    // rounded to ints BEFORE summing → order-independent, drift-immune).
    Q("m1_crossmodal_join", (s, dir) => {
      import s.implicits._
      val norm2e6 = floor(dot("embedding", "embedding") * 1e6 + 0.5).cast("long")
      t(s, dir, "documents")
        .join(t(s, dir, "embeddings"), $"doc_id" === $"vec_id")
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("total_chars"),
             sum(norm2e6).as("sum_norm2_e6"))
        .orderBy($"lang")
    }, sql = Some("""
      SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
             CAST(SUM(CAST(floor(list_sum(list_transform(embedding,
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
               AS sum_norm2_e6
      FROM documents JOIN embeddings ON doc_id = vec_id
      GROUP BY lang ORDER BY lang
    """))
  )
}
