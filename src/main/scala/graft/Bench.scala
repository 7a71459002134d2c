package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline query suite on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":...,"value":N,"unit":"sec","queries":{...}}.
  *
  * Each query is forced with `queryExecution.toRdd.count()` — that executes
  * the exact optimized physical plan. (A plain `df.count()` would let
  * Catalyst prune the aggregate expressions out from under the count and
  * under-measure the real work.)
  *
  * Regression guard: `BENCH_BASELINE.json` pins the round-2 per-query
  * numbers; when the bench runs at the baseline's SF, any query > 1.5× its
  * pinned time is reported in a `"regressions"` key of the output line
  * (empty object = no regressions).
  */
object Bench {

  /** (sf, per-query seconds) from BENCH_BASELINE.json, if present. */
  private def baseline(): Option[(String, Map[String, Double])] =
    try {
      val txt = scala.io.Source.fromFile("BENCH_BASELINE.json").mkString
      val sf = """"sf"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(txt).get.group(1)
      val qs = """"(\w+)"\s*:\s*([0-9]+\.[0-9]+)""".r.findAllMatchIn(txt)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
      Some((sf, qs))
    } catch { case _: Throwable => None }
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    val suite = {
      val hs = SparkEntry.all.filter(_.headline)
      if (hs.nonEmpty) hs else SparkEntry.all
    }
    def force(q: Q): Unit =
      try q.fn(spark, sfDir).queryExecution.toRdd.count()
      catch { case _: Throwable => () }
    // one warm-up pass amortizes codegen + parquet footer reads
    suite.foreach(force)
    val results = suite.map { q =>
      val t0 = System.nanoTime()
      force(q)
      q.name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.4f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val regs = baseline() match {
      case Some((bSf, bQs)) if bSf == sfDir =>
        results.collect {
          case (k, v) if bQs.get(k).exists(b => v > 1.5 * b) =>
            f""""$k":{"now":$v%.4f,"baseline":${bQs(k)}%.4f}"""
        }.mkString("{", ",", "}")
      case _ => "{}"
    }
    println(f"""{"metric":"total","value":$total%.4f,"unit":"sec","queries":$qs,"regressions":$regs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
