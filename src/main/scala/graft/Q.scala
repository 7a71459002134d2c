package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query of the engine's public surface.
  *
  * @param name     stable identifier; keys `SparkEntry.queries` (and, when
  *                 `sql` is present, `SparkEntry.oracleSql`). Names carry the
  *                 SURVEY.md §2 operator id they exercise (e.g. `g1_`, `w2_`).
  * @param fn       Spark implementation: (session, testdata dir) => result.
  *                 Column names MUST match the oracle's aliases exactly.
  * @param sql      equivalent ANSI SQL runnable by DuckDB over the same
  *                 parquet tables; None for ops whose semantics are not
  *                 SQL-expressible (approximate / randomized / streaming),
  *                 which fall back to the driver's rows-only check.
  * @param headline included in the Bench headline suite.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    sql: Option[String] = None,
    headline: Boolean = false)

/** A module contributing queries to the engine surface. */
trait QModule {
  def qs: Seq[Q]
}
