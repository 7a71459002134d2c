package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The engine surface is assembled from QModules; each Q carries its Spark
  * implementation and (when SQL-expressible) its DuckDB oracle.
  */
object SparkEntry {

  /** All query modules, in SURVEY §7.1 build order. */
  def modules: Seq[QModule] = Seq(
    operators.Relational,
    operators.Joins,
    operators.Aggregations,
    operators.Windows,
    operators.Scalars,
    operators.SetOps,
    operators.Reshape,
    operators.Analytics,
    operators.Graph,
    operators.Functions,
    sources.UpsertQueries,
    sources.HtmlQueries,
    sources.CsvQueries,
    sources.BucketedQueries,
    ext.TextAnalysis,
    ext.DedupQueries,
    ext.SimilarityQueries,
    ext.CorpusPipelineQueries,
    streaming.EventQueries
  )

  def all: Seq[Q] = modules.flatMap(_.qs)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case Q(n, _, Some(sql), _) => n -> sql.trim }.toMap
}
