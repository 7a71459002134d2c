package graft.sources

import graft.{Q, QModule}
import graft.Tables.{dsum, t}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed-table layout: the PERSISTED co-location contract.
  *
  * Every repeated fact⋈fact join in the engine so far pays its shuffle at
  * query time (SMJ exchanges both sides on the key; broadcast only
  * rescues dim-sized sides). Bucketing moves that cost to write time: the
  * table is hash-partitioned into a fixed number of buckets on the join
  * key ONCE, the bucket id is recorded in the catalog, and every later
  * join or aggregation on that key reads both sides already co-located —
  * the planner drops the Exchange entirely (asserted by
  * BucketedJoinSpec). At 100 TB this is the difference between
  * re-shuffling the fact table on every nightly join and never shuffling
  * it again; it is the same contract Hive bucketing / Iceberg bucket
  * transforms carry, expressed through Spark's native `bucketBy`.
  *
  * Two layout details matter for the plan:
  *   - both sides must agree on the bucket COUNT (Spark only elides the
  *     exchange when the join key covers the bucket key and the counts
  *     are compatible);
  *   - `repartition(buckets, key)` before the write uses the same
  *     Murmur3-pmod placement as the bucket spec, so each task holds
  *     exactly one bucket's rows → ONE FILE PER BUCKET. The per-bucket
  *     `sortBy` gives the parquet files sorted runs (tighter page
  *     min/max, better RLE); note Spark 3+ still re-sorts locally below
  *     the SMJ by default — honoring the sorted-scan metadata is gated
  *     behind `spark.sql.legacy.bucketedTableScan.outputOrdering`
  *     because with multiple files per bucket the merge-read can cost
  *     more than the sort. The re-sort is per-partition and shuffle-free;
  *     the Exchange elision is the scale win, and is what
  *     BucketedJoinSpec pins.
  *
  * The reference keeps its facts in MySQL InnoDB, where the co-location
  * analogue is the clustered primary-key index (DataWarehouse_Group10
  * warehouse DDL); here the layout is columnar, distributed, and
  * catalog-declared.
  */
object Bucketed {

  /** Write `df` as an external bucketed parquet table (one file per
    * bucket, per-bucket sorted on the key); no-op if `table` is already
    * in the session catalog. Returns the table name.
    *
    * Concurrency-safe across JVMs sharing java.io.tmpdir (e.g. Verify and
    * Bench both hitting k9 first-use): the data is written under a
    * process-unique staging path and RENAMED into place atomically, so a
    * concurrent reader of the final path never observes a partial layout
    * and a concurrent writer never has its files deleted out from under
    * it. A pre-existing complete layout (left by another process or a
    * previous session) is ADOPTED by registering an external bucketed
    * table over it via DDL — bucket metadata lives in the catalog, not
    * the files, so the CLUSTERED BY declaration restores the
    * exchange-elision contract without rewriting a byte. */
  def ensureBucketed(df: DataFrame, table: String, path: String,
                     key: String, buckets: Int): String = {
    val s = df.sparkSession
    if (s.catalog.tableExists(table)) return table
    val dir = new java.io.File(path)
    // adoption is FINGERPRINT-gated, not just completeness-gated: a
    // layout written under a different bucket count would make Spark
    // trust wrong filename bucket ids and the exchange-elided SMJ would
    // co-locate wrong rows (silently wrong results, not an error); a
    // different schema/key/row count means different data entirely. The
    // fingerprint file is written into the stage AFTER the data, so its
    // presence at the final path implies a complete layout.
    val fingerprint =
      s"v2 buckets=$buckets key=$key n=${df.count()} schema=${df.schema.toDDL}"
    def metaOk: Boolean = {
      val f = new java.io.File(dir, "_GRAFT_BUCKETS")
      f.exists() && java.nio.file.Files.readString(
        f.toPath, java.nio.charset.StandardCharsets.UTF_8) == fingerprint
    }
    def adopt(): Unit = s.sql(
      s"""CREATE TABLE $table (${df.schema.toDDL}) USING parquet
         |CLUSTERED BY ($key) SORTED BY ($key) INTO $buckets BUCKETS
         |LOCATION '$path'""".stripMargin)
    if (metaOk) { adopt(); return table }
    // stage under a path unique to this JVM, then rename into place
    val pid = ProcessHandle.current().pid()
    val stage = new java.io.File(s"$path.stage.$pid")
    val stageTable = s"${table}_stage_$pid"
    org.apache.commons.io.FileUtils.deleteQuietly(stage)
    df.repartition(buckets, col(key))
      .write.format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .option("path", stage.getPath)
      .saveAsTable(stageTable)
    s.sql(s"DROP TABLE $stageTable") // external: catalog entry only, files stay
    java.nio.file.Files.writeString(
      new java.io.File(stage, "_GRAFT_BUCKETS").toPath, fingerprint,
      java.nio.charset.StandardCharsets.UTF_8)
    // swap-in, racing builders tolerated: rename FIRST (fails while any
    // dir exists at the path); only delete a layout that still flunks
    // the fingerprint at that moment — a matching one another process
    // just renamed in is adopted, never deleted
    if (!stage.renameTo(dir)) {
      if (!metaOk) {
        org.apache.commons.io.FileUtils.deleteQuietly(dir)
        if (!stage.renameTo(dir))
          require(metaOk,
            s"bucketed layout rename failed and no matching winner at $path")
      }
    }
    org.apache.commons.io.FileUtils.deleteQuietly(stage)
    adopt()
    table
  }

  /** Bucketed twins of (lineitem, orders) for `dir`, keyed on the order
    * key with a shared bucket count; created on first use per session. */
  def ensureOrderTables(s: SparkSession, dir: String,
                        buckets: Int = 8): (String, String) = {
    val safe = dir.replaceAll("[^A-Za-z0-9]", "_")
    val tmp = System.getProperty("java.io.tmpdir")
    val li = ensureBucketed(t(s, dir, "lineitem"), s"graft_k9_lineitem$safe",
      s"$tmp/graft_k9_lineitem$safe", "l_orderkey", buckets)
    val ord = ensureBucketed(t(s, dir, "orders"), s"graft_k9_orders$safe",
      s"$tmp/graft_k9_orders$safe", "o_orderkey", buckets)
    (li, ord)
  }

  /** The co-located join itself: lineitem ⋈ orders on the shared bucket
    * key. The merge hint pins SMJ (a broadcast would bypass the layout at
    * toy SF and hide the plan being demonstrated); with both sides
    * bucketed the join subtree has ZERO exchanges — only a local,
    * shuffle-free per-bucket sort remains (see the layout note above). */
  def bucketedOrderRevenue(s: SparkSession, dir: String): DataFrame = {
    val (li, ord) = ensureOrderTables(s, dir)
    s.table(li).hint("merge")
      .join(s.table(ord), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
          .as("revenue"))
      .orderBy(col("o_orderpriority"))
  }
}

/** K9: bucketed write → shuffle-free join, oracled. The DuckDB oracle
  * recomputes the same join from the ORIGINAL parquet, so the round-trip
  * through the bucketed layout (hash placement, per-bucket sort, catalog
  * re-read) must be content-lossless to hash-match. */
object BucketedQueries extends QModule {
  def qs: Seq[Q] = Seq(
    Q("k9_bucketed_join", (s, dir) => Bucketed.bucketedOrderRevenue(s, dir),
      sql = Some("""
      SELECT o_orderpriority, COUNT(*) AS n_lines,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority ORDER BY o_orderpriority
    """))
  )
}
