package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Readers for the driver-generated testdata tables (TESTDATA.md) plus
  * column helpers shared by the query inventory.
  *
  * Scale posture: every reader is a plain parquet scan — Catalyst pushes
  * filters/projections into the scan, so callers never pre-materialize.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  // --- oracle-parity numeric helpers -------------------------------------
  // Double sums are order-dependent; a distributed Spark sum and DuckDB's
  // serial sum would differ in the last bits and break hash comparison.
  // Sum in exact decimal (order-independent), then emit double. The oracle
  // SQL uses the same CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE) shape.
  //
  // IMPORTANT: the cast scale must be >= the expression's intrinsic decimal
  // precision (sum of its factors' scales). Testdata money/rate columns are
  // 2-decimal values + binary noise, so a 3-factor product is 6-decimal:
  // quantizing it at scale 4 lands on exact .xxxx50 halves ~1% of rows,
  // where Spark (HALF_UP) and DuckDB (binary) round differently. At the
  // intrinsic scale the value sits near an integer grid point and both
  // engines agree deterministically.

  /** Order-independent sum of a double column, emitted as double. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Order-independent mean of a double column, emitted as double. */
  def davg(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double") / count(lit(1))
}
