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

  /** Morton (Z-order) code of two NON-NEGATIVE integer columns: the low
    * `bits` bits of each, interleaved (a even positions, b odd). Built
    * from shift/mask column arithmetic — codegen'd, no UDF. Keys ≥ 2^bits
    * have their high bits ignored (distant keys alias into the same
    * curve position and file bounding boxes quietly widen), so `bits`
    * must cover the key domain — zorder() below derives it from the
    * actual column maxima rather than trusting a fixed default. */
  def mortonCode(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
                 bits: Int = 16): org.apache.spark.sql.Column =
    (0 until bits).map { i =>
      import org.apache.spark.sql.functions.{lit, shiftleft, shiftright}
      shiftleft(shiftright(a.cast("long"), i) % 2, 2 * i) +
        shiftleft(shiftright(b.cast("long"), i) % 2, 2 * i + 1)
    }.reduce(_ + _)

  /** Z-order compaction: range-partition on the Morton code of TWO key
    * columns, so each output file covers a small rectangle in (a, b)
    * space — point/range predicates on EITHER column skip most files on
    * parquet footer min/max, which single-column range clustering only
    * achieves for its one sort key. The standard multi-dimensional
    * data-skipping layout (Delta/Iceberg OPTIMIZE ZORDER) expressed as
    * plain column arithmetic + one shuffle. */
  def zorder(spark: SparkSession, inDir: String, outDir: String,
             nFiles: Int, colA: String, colB: String,
             bits: Int = 0): DataFrame = {
    val df = spark.read.parquet(inDir)
    // bits <= 0 → derive from the data: enough bits for max(a, b), so no
    // key's high bits are silently dropped at larger scale factors (one
    // tiny scalar agg against a maintenance pass's full shuffle)
    val useBits =
      if (bits > 0) bits
      else {
        import org.apache.spark.sql.functions.{greatest, max}
        val m = df.agg(max(greatest(col(colA).cast("long"), col(colB).cast("long"))))
          .collect()(0).getLong(0)
        math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(math.max(m, 1L)))
      }
    df.withColumn("__z", mortonCode(col(colA), col(colB), useBits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)
    spark.read.parquet(outDir)
  }
}
