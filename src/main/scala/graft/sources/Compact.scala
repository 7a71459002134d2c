package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Small-files compaction — the table-maintenance pass every streaming or
  * micro-batch ingest needs (each trigger writes a file; a day of
  * 1-minute triggers is 1440 tiny files whose per-file open/footer cost
  * dominates the scan).
  *
  * Rewrite = one range-partitioned shuffle clustered on `clusterCols` +
  * a size-capped write:
  *   - `repartitionByRange` gives each output file a DISJOINT key range,
  *     so downstream point/range reads can skip whole files on parquet
  *     footer min/max (file-level pruning, asserted in IoSpec);
  *   - `maxRecordsPerFile` caps file size without a second shuffle.
  * At 100 TB you compact per partition-directory (the unit of ingest),
  * never the whole table; this helper takes the directory as its unit.
  */
object Compact {

  def compact(spark: SparkSession, inDir: String, outDir: String,
              nFiles: Int, clusterCols: Seq[String],
              maxRecordsPerFile: Long = 0L): DataFrame = {
    val df = spark.read.parquet(inDir)
    val clustered =
      if (clusterCols.nonEmpty)
        df.repartitionByRange(nFiles, clusterCols.map(col): _*)
      else df.coalesce(nFiles)
    val writer = clustered.write.mode("overwrite")
    (if (maxRecordsPerFile > 0)
       writer.option("maxRecordsPerFile", maxRecordsPerFile)
     else writer).parquet(outDir)
    spark.read.parquet(outDir)
  }
}
