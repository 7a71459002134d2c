package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** Stage profile of pqEncode (dev harness — the measurement behind the
  * vector tier's `spread` guard, PERF.md §ANN): on a WELL-PARTITIONED
  * 128k corpus the full encode is ~1.8 s at local[32], vs 37 s when the
  * corpus inherits a single parquet file's partitioning — the per-row
  * compute is heavy enough that partition count is the parallelism
  * ceiling. */
object EncodeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = Tables.t(spark, "/root/testdata/sf0.1", "embeddings")
    // ×64 well-partitioned corpus (distinct ids per copy)
    val emb = (0 until 64).map(i => base.withColumn("vec_id",
        col("vec_id") * 64 + i)).reduce(_ union _)
      .repartition(32).localCheckpoint()
    val n = emb.count()
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag n=$r wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val cb = Similarity.pqCodebooks(emb).localCheckpoint()
    time("normed-only")(Similarity.pqNormedProbe(emb).queryExecution.toRdd.count())
    time("encode-no-ckpt")(Similarity.pqEncode(emb, cb).queryExecution.toRdd.count())
    time("encode+ckpt")(Similarity.pqEncode(emb, cb).localCheckpoint().count())
    println(s"[probe] n=$n")
    spark.stop()
  }
}
