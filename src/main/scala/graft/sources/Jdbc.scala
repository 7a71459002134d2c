package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.jdbc.JdbcDialects

/** JDBC parity-mode source/sink — the reference runs against MySQL
  * (reads: CsvLoader.java:28-47 via JDBC url; writes: ETLMain.java:195-220
  * batched INSERTs). The canonical store here is parquet (SURVEY §2.1 S3 /
  * §2.2 K2 declare JDBC the parity option), so this is a thin, explicit
  * adapter over `spark.read.jdbc` / `DataFrameWriter.jdbc`, not a storage
  * engine.
  *
  * Scale posture: a JDBC endpoint is one database server — at 100 TB it is
  * an edge surface (dim import / mart export), never the fact store.
  * - Reads: the single-connection form is only for dimension-sized tables;
  *   anything bigger must use `readRanged`, which fans the scan out to
  *   `numPartitions` parallel range queries (`WHERE partCol BETWEEN …`),
  *   each its own connection — Spark's standard JDBC parallelism contract.
  * - Writes: one connection per partition, so the writer caps parallelism
  *   via `coalesce(connections)` (a server tolerates tens of connections,
  *   not a cluster's thousands) and batches rows per round-trip
  *   (`batchsize`). Coalesce, not repartition: no shuffle, the cap only
  *   narrows the final stage.
  */
object Jdbc {

  private def props(extra: (String, String)*): Properties = {
    val p = new Properties()
    extra.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }

  /** Whole-table read on ONE connection — dimension-sized tables only. */
  def read(spark: SparkSession, url: String, table: String): DataFrame =
    spark.read.jdbc(url, table, props())

  /** Pushdown read: `query` runs server-side, only its result crosses the
    * wire (the reference's point lookups, CsvLoader.java:33-40 shape). */
  def readQuery(spark: SparkSession, url: String, query: String): DataFrame =
    spark.read.jdbc(url, s"($query) q", props())

  /** Parallel ranged read — the scale path. `numPartitions` range-disjoint
    * queries over `partCol` run concurrently, one connection each. */
  def readRanged(spark: SparkSession, url: String, table: String,
                 partCol: String, lower: Long, upper: Long,
                 numPartitions: Int): DataFrame =
    spark.read.jdbc(url, table, partCol, lower, upper, numPartitions, props())

  /** Append `df` into `table`, capped at `connections` concurrent writers,
    * `batchsize` rows per INSERT round-trip. */
  def write(df: DataFrame, url: String, table: String,
            mode: SaveMode = SaveMode.Append,
            connections: Int = 8, batchsize: Int = 1000): Unit =
    df.coalesce(connections)
      .write.mode(mode)
      .option("batchsize", batchsize.toString)
      .jdbc(url, table, props())

  /** Idempotent JDBC upsert: read back the target's key projection, append
    * only absent keys (the reference's preload-keys-then-skip loop,
    * ETLMain.java:235-255, as one anti-join — K3 over a JDBC sink). */
  def writeNew(df: DataFrame, url: String, table: String,
               keys: Seq[String], connections: Int = 8): Unit = {
    // Spark's JDBC writer creates case-preserved (quoted) column names, so
    // the key projection must quote through the url's dialect to hit them.
    val quote = JdbcDialects.get(url).quoteIdentifier _
    val existing = readQuery(df.sparkSession, url,
      s"SELECT ${keys.map(quote).mkString(", ")} FROM $table")
      .toDF(keys: _*) // un-quote the readback names for the anti-join
    write(Upsert.newRows(existing, df, keys), url, table,
      connections = connections)
  }
}
