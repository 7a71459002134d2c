package graft

import org.apache.spark.sql.SparkSession

import graft.ext.Similarity

/** ANN quality harness: recall@k of the two approximate indexes (multi-probe
  * LSH, IVF) against the exact brute-force top-k, averaged over a sample of
  * query vectors. Prints one JSON line per SF dir argument — the numbers
  * quoted in PERF.md §ANN.
  *
  * Usage: runMain graft.Recall [sfDir ...]   (default: the three testdata SFs)
  */
object Recall {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val k = 10
    val nQueries = 20
    for (dir <- dirs) {
      val emb = Tables.t(spark, dir, "embeddings").cache()
      val n = emb.count()
      // train the k-means index ONCE per corpus (the centroids param's
      // purpose) instead of re-running the Lloyd iteration per query;
      // ivfTrainedCentroids returns it already localCheckpoint'd
      val cent = Similarity.ivfTrainedCentroids(emb)
      // PQ handles likewise train/encode once (pqEncode is the index build)
      val cb = Similarity.pqCodebooks(emb)
      val codes = Similarity.pqEncode(emb, cb).localCheckpoint()
      // the composed index additionally needs the materialized assignment
      val assigned = Similarity.ivfTrainedAssign(emb, cent).localCheckpoint()
      def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
        df.select("vec_id").collect().map(_.getLong(0)).toSet
      val recalls = (0L until nQueries.toLong).map { q =>
        val truth = ids(Similarity.topK(emb, q, k))
        val lsh = ids(Similarity.annTopK(emb, q, k)).intersect(truth).size / truth.size.toDouble
        val ivf = ids(Similarity.ivfTopK(emb, q, k)).intersect(truth).size / truth.size.toDouble
        val ivfK = ids(Similarity.ivfTrainedTopK(emb, q, k, centroids = Some(cent)))
          .intersect(truth).size / truth.size.toDouble
        // the r6-verdict multi-probe comparison: 6 query-ranked lists + 2
        // neighbors of the best list, vs plain top-8 by query dot as the
        // honest control (same scan fraction, 8/16 lists each)
        val ivfMp = ids(Similarity.ivfTrainedTopK(emb, q, k,
            neighborProbes = 2, centroids = Some(cent)))
          .intersect(truth).size / truth.size.toDouble
        val ivfP8 = ids(Similarity.ivfTrainedTopK(emb, q, k, nprobe = 8,
            centroids = Some(cent)))
          .intersect(truth).size / truth.size.toDouble
        // PQ-ADC at a refine=4 control and the shipped refine=8: the gap
        // between them is the residual code-quantization error the refine
        // margin absorbs
        val pq4 = ids(Similarity.pqTopK(emb, q, k, refine = 4,
            codebooks = Some(cb), codes = Some(codes)))
          .intersect(truth).size / truth.size.toDouble
        val pq8 = ids(Similarity.pqTopK(emb, q, k, refine = 8,
            codebooks = Some(cb), codes = Some(codes)))
          .intersect(truth).size / truth.size.toDouble
        // composed IVF×PQ: probe-pruned ADC scan — its recall is bounded
        // above by BOTH parents (IVF's probed lists, PQ's code resolution)
        val ivfpq = ids(Similarity.ivfPqTopK(emb, q, k,
            centroids = Some(cent), assigned = Some(assigned),
            codebooks = Some(cb), codes = Some(codes)))
          .intersect(truth).size / truth.size.toDouble
        (lsh, ivf, ivfK, ivfMp, ivfP8, pq4, pq8, ivfpq)
      }
      val lshAvg = recalls.map(_._1).sum / nQueries
      val ivfAvg = recalls.map(_._2).sum / nQueries
      val ivfKAvg = recalls.map(_._3).sum / nQueries
      val ivfMpAvg = recalls.map(_._4).sum / nQueries
      val ivfP8Avg = recalls.map(_._5).sum / nQueries
      val pq4Avg = recalls.map(_._6).sum / nQueries
      val pq8Avg = recalls.map(_._7).sum / nQueries
      val ivfpqAvg = recalls.map(_._8).sum / nQueries
      emb.unpersist()
      // Fmt.num: JSON stays valid on comma-decimal default locales
      def r3(v: Double): String = Fmt.num(v, 3)
      println(s"""{"metric":"recall@$k","sf":"$dir","n_vectors":$n,"n_queries":$nQueries,"lsh":${r3(lshAvg)},"ivf":${r3(ivfAvg)},"ivf_kmeans":${r3(ivfKAvg)},"ivf_kmeans_mp6p2":${r3(ivfMpAvg)},"ivf_kmeans_p8":${r3(ivfP8Avg)},"pq_adc_r4":${r3(pq4Avg)},"pq_adc_r8":${r3(pq8Avg)},"ivfpq":${r3(ivfpqAvg)}}""")
    }
    spark.stop()
  }
}
