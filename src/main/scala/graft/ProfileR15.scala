package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-15 optimization profiler: times the INTERNAL stages of the
  * heaviest headline queries (p1/p3/gr1/dedup_clusters) in isolation so
  * optimization effort lands where the seconds are. Pure measurement
  * main — never on any query path. Each stage is forced with the noop
  * sink (guide §1.4) or, for eager loop stages, by the loop itself.
  */
object ProfileR15 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val what = if (args.length > 1) args.drop(1).toSet else Set("p1", "gr1", "clusters")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // per-job wall time with the active stage label, so stage-level time
    // maps back to operators
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        jobStart.put(j.jobId, (System.nanoTime(), desc)); ()
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(jobStart.remove(j.jobId)).foreach { case (t0, desc) =>
          println(f"[job] ${j.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%7.3f s  $desc")
        }
      }
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val wall = (for {a <- i.completionTime; b <- i.submissionTime} yield (a - b) / 1e3)
          .getOrElse(-1.0)
        println(f"[stage] ${i.stageId}%4d $wall%7.3f s tasks=${i.numTasks}%3d  " +
          i.name.take(110))
      }
    })

    var pass = 0
    def time[A](label: String)(f: => A): A = {
      spark.sparkContext.setJobDescription(s"p$pass $label")
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] pass$pass $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      spark.sparkContext.setJobDescription(null)
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = Tables.t(spark, sfDir, "documents")

    for (p <- 0 to 1) {
    pass = p
    if (what("p1")) {
      // warm the scan
      noop(docs)
      // Stage 1: quality gate (tokenize+regex scan, median, localCheckpoint)
      val gated = time("p1.qualityGate (ckpt forced)") {
        ext.CorpusPipeline.qualityGate(docs)
      }
      // Stage 2: shingles + posting lists + pairs
      val pairs = ext.Dedup.jaccardPairs(gated.select(col("doc_id"), col("text")))
      time("p1.jaccardPairs -> noop") { noop(pairs) }
      // Stage 3: cluster loop (eager counts inside)
      val clusters = time("p1.dupClusters loop") { ext.Dedup.dupClusters(pairs) }
      // Stage 4: anti-join survivors + packShards + sort
      val drop = clusters.filter(col("rep_id") =!= col("doc_id")).select(col("doc_id"))
      val uniq = gated.join(drop, Seq("doc_id"), "left_anti")
      val out = ext.TextAnalysis.packShards(
        uniq.select(col("doc_id"), col("lang"), col("n_tok")), budget = 2000)
        .orderBy(col("doc_id"))
      time("p1.tail (anti+pack+sort) -> noop") { noop(out) }

      // sub-probe: the tokenize/regex scan alone (no median join)
      import ext.TextAnalysis.{enPat, hits, tokens}
      val scan = Tables.spread(docs)
        .withColumn("n_tok", size(tokens(col("text"))))
        .select(col("doc_id"), col("lang"), col("n_tok"),
          (hits(col("text"), enPat).cast("double") / col("n_tok")).as("r"))
      time("probe: tokenize+hits scan -> noop") { noop(scan) }
      val sh = ext.Dedup.shingles(gated.select(col("doc_id"), col("text")))
      time("probe: shingles explode -> noop") { noop(sh) }
      val posting = sh.groupBy(col("shingle"))
        .agg(collect_list(col("doc_id")).as("ds"))
        .filter(size(col("ds")).between(2, 10))
      time("probe: posting lists -> noop") { noop(posting) }
    }

    if (what("theta")) {
      import spark.implicits._
      import graft.functions.SketchFunctions._
      val li = Tables.t(spark, sfDir, "lineitem")
      val sup = Tables.t(spark, sfDir, "supplier")
      noop(li)
      for (thr <- Seq("128", "4096", "128", "4096")) {
        spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", thr)
        val j = li.join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
        val cells = j.groupBy($"s_nationkey", quarter($"l_shipdate").as("qtr"))
          .agg(thetaSketchAgg($"l_partkey").as("sk"))
        val perNation = cells.groupBy($"s_nationkey")
          .agg(round(thetaEstimate(thetaUnionAgg($"sk"))).cast("long").as("approx"))
        time(s"theta rollup thr=$thr") { noop(perNation) }
      }
      spark.conf.unset("spark.sql.objectHashAggregate.sortBased.fallbackThreshold")
    }

    if (what("regex")) {
      import ext.TextAnalysis.{enPat, hits, tokens}
      noop(docs)
      val spreadDocs = docs.repartition(32)
      for (_ <- 1 to 3) {
        time("regex A: size(regexp_extract_all)") {
          noop(spreadDocs.select(col("doc_id"),
            (hits(col("text"), enPat).cast("double") /
              size(tokens(col("text")))).as("r")))
        }
        time("regex B: regexp_count") {
          noop(spreadDocs.select(col("doc_id"),
            (regexp_count(lower(col("text")), lit(enPat)).cast("double") /
              (regexp_count(trim(col("text")), lit("\\s+")) + 1)).as("r")))
        }
        time("regex C: count via split-size only") {
          noop(spreadDocs.select(col("doc_id"),
            (regexp_count(lower(col("text")), lit(enPat)).cast("double") /
              size(tokens(col("text")))).as("r")))
        }
      }
    }

    if (what("gr1")) {
      import spark.implicits._
      val li = Tables.t(spark, sfDir, "lineitem")
      noop(li.select($"l_partkey", $"l_suppkey"))
      val pairs = li
        .select(($"l_partkey" * 2).as("p"), ($"l_suppkey" * 2 + 1).as("sp"))
        .distinct()
      val edges0 = pairs.select($"p".as("src"), $"sp".as("dst"))
        .unionAll(pairs.select($"sp".as("src"), $"p".as("dst")))
      time("gr1.edges distinct+union -> noop") { noop(edges0) }
      val out = time("gr1.pagerank 3 iters (pins+loop)") {
        operators.Graph.pagerankFixedPoint(edges0, iters = 3).orderBy($"node")
      }
      time("gr1.final iter + sort -> noop") { noop(out) }
    }

    if (what("clusters")) {
      noop(docs)
      val pairs = ext.Dedup.jaccardPairs(docs)
      time("clusters.jaccardPairs -> noop") { noop(pairs) }
      val cl = time("clusters.dupClusters loop") { ext.Dedup.dupClusters(pairs) }
      time("clusters.tail -> noop") { noop(cl.orderBy(col("doc_id"))) }
    }
    }

    spark.stop()
  }
}
