package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{call_function, col}

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
    * curve position and file bounding boxes quietly widen), so inputs
    * must already fit in `bits` — zorder() below guarantees that by
    * NORMALIZING each key into [0, 2^bits - 1] against its measured
    * min/max (normalize-then-interleave), rather than widening `bits`
    * to the raw domain. */
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
    * plain column arithmetic + one shuffle.
    *
    * Each key is linearly NORMALIZED to its own [min, max] domain before
    * interleaving (`bits` of resolution each, default 16). Interleaving
    * RAW values is wrong the moment the two domains differ widely: the
    * wider key's high bits dominate every significant Morton position
    * (the narrow key's interleaved high bits are constant zero), so the
    * "z-order" silently degenerates to single-key clustering on the wide
    * key — ScaleBench's layout mode measured exactly that (custkey
    * 64/64 files hit vs orderkey 1/64 on a 15k-vs-1.6e9 domain pair)
    * before normalization, the same reason production OPTIMIZE ZORDER
    * implementations interleave range-bucket ids, never raw values. */
  def zorder(spark: SparkSession, inDir: String, outDir: String,
             nFiles: Int, colA: String, colB: String,
             bits: Int = 16): DataFrame = {
    import org.apache.spark.sql.functions.{lit, max, min}
    val df = spark.read.parquet(inDir)
    val r = df.agg(min(col(colA).cast("long")), max(col(colA).cast("long")),
                   min(col(colB).cast("long")), max(col(colB).cast("long")))
      .collect()(0)
    val (aLo, aHi, bLo, bHi) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val scale = (1L << bits) - 1
    // integer `div`, same as s11's SQL form: the normalized value is a
    // bucket id in [0, scale], computed in exact long arithmetic (no
    // double division + downstream cast-truncation, whose rounding could
    // in principle disagree with integer div near representation limits)
    def norm(c: org.apache.spark.sql.Column, lo: Long, hi: Long) =
      call_function("div",
        (c.cast("long") - lit(lo)) * lit(scale), lit(math.max(hi - lo, 1L)))
    df.withColumn("__z", mortonCode(norm(col(colA), aLo, aHi),
        norm(col(colB), bLo, bHi), bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)
    spark.read.parquet(outDir)
  }
}
