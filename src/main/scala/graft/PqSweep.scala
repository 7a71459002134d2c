package graft

import org.apache.spark.sql.SparkSession

import graft.ext.Similarity

/** Scratch parameter sweep for PQ geometry (dev harness). */
object PqSweep {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.t(spark, dir, "embeddings").cache()
    emb.count()
    val k = 10
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("vec_id").collect().map(_.getLong(0)).toSet
    val truths = (0L until 20L).map(q => q -> ids(Similarity.topK(emb, q, k))).toMap
    for ((m, ksub, iters) <- Seq((8, 16, 2), (8, 16, 3), (8, 32, 2), (16, 16, 2), (16, 32, 2), (4, 64, 2))) {
      val cb = Similarity.pqCodebooks(emb, m, ksub, iters)
      val codes = Similarity.pqEncode(emb, cb, m).localCheckpoint()
      for (refine <- Seq(4, 8)) {
        val rec = (0L until 20L).map { q =>
          ids(Similarity.pqTopK(emb, q, k, m, ksub, refine,
            Some(cb), Some(codes))).intersect(truths(q)).size / 10.0
        }.sum / 20
        println(f"[pqsweep] m=$m ksub=$ksub iters=$iters refine=$refine recall=$rec%.3f")
      }
    }
    spark.stop()
  }
}
