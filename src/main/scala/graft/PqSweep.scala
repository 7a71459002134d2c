package graft

import org.apache.spark.sql.SparkSession

import graft.ext.Similarity

/** Scratch parameter sweep for PQ geometry (dev harness).
  *
  * Second mode: `runMain graft.PqSweep <dir> ivfpq` — the COMPOSED
  * IVF×PQ index's recall@10-vs-nprobe curve at the derived nlist, with
  * one-time train/encode wall-times and per-query scan wall-time (the
  * PERF.md §ANN composed-posture table). */
object PqSweep {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val mode = if (args.length > 1) args(1) else "geometry"
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
    if (mode == "ivfpq") {
      // composed-index posture at the derived nlist: recall@10 and scan
      // wall-time as nprobe sweeps from cheap to probe-everything, with
      // the one-time index-build (train / assign / train+encode) costs
      // stated separately — at 100 TB those amortize over every query
      val n = emb.count()
      val nlist = Similarity.autoNlist(n)
      def timed[A](f: => A): (A, Double) = {
        val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
      }
      val (cent, tTrain) = timed {
        val c = Similarity.ivfTrainedCentroids(emb, nlist); c.count(); c
      }
      val (assigned, tAssign) = timed {
        val a = Similarity.ivfTrainedAssign(emb, cent).localCheckpoint()
        a.count(); a
      }
      val (codes, tEncode) = timed {
        val cb = Similarity.pqCodebooks(emb)
        val e = Similarity.pqEncode(emb, cb).localCheckpoint(); e.count()
        (cb, e)
      }
      println(f"[ivfpq] n=$n nlist=$nlist derived_nprobe=${Similarity.autoNprobe(nlist)} " +
        f"train=$tTrain%.1fs assign=$tAssign%.1fs pq_train_encode=$tEncode%.1fs")
      for (np <- Seq(4, 8, Similarity.autoNprobe(nlist), 24, 32, nlist).distinct.sorted) {
        // warm-up query amortizes codegen for this plan shape
        Similarity.ivfPqTopK(emb, 0L, k, nlist, np,
          centroids = Some(cent), assigned = Some(assigned),
          codebooks = Some(codes._1), codes = Some(codes._2)).collect()
        val (recSum, secSum) = (0L until 20L).foldLeft((0.0, 0.0)) {
          case ((r, s), q) =>
            val (got, sec) = timed(ids(Similarity.ivfPqTopK(emb, q, k, nlist, np,
              centroids = Some(cent), assigned = Some(assigned),
              codebooks = Some(codes._1), codes = Some(codes._2))))
            (r + got.intersect(truths(q)).size / 10.0, s + sec)
        }
        println(f"[ivfpq] nprobe=$np%2d recall=${recSum / 20}%.3f s_per_query=${secSum / 20}%.3f")
      }
      spark.stop(); return
    }
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
