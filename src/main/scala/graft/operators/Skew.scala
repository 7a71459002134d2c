package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers (SURVEY §4.2 "salting only if a real skew shows
  * up"; builder-brief scale posture: "salting for skew, AQE for runtime
  * re-plan").
  *
  * AQE's skew-join handling (on by default) covers joins; these helpers
  * cover the aggregation side, where one hot key would otherwise pin a
  * whole partition on one task.
  */
object Skew {

  /** Two-phase salted aggregation: count/sum-like aggregates over a skewed
    * key. Phase 1 aggregates (key, salt) — spreading a hot key over
    * `saltBuckets` tasks — phase 2 merges the partials per key. Exact for
    * decomposable aggregates (sum/count/min/max).
    *
    * At 100 TB: phase-1 partials are tiny regardless of skew, so the
    * phase-2 shuffle moves `saltBuckets` rows per key, not the raw rows.
    */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
                     saltBuckets: Int = 16): DataFrame = {
    val salt = pmod(spark_partition_id() + monotonically_increasing_id(),
      lit(saltBuckets))
    df.select(key.as("k"), value.as("v"), salt.as("salt"))
      .groupBy(col("k"), col("salt"))
      .agg(sum(col("v")).as("partial_sum"), count(lit(1)).as("partial_n"))
      .groupBy(col("k"))
      .agg(sum(col("partial_sum")).as("sum_v"), sum(col("partial_n")).as("n"))
  }

  /** Salted distinct-count: phase 1 dedupes (key, salt, value) locally,
    * phase 2 merges per-salt distincts. Exact because `value` determines
    * its salt (hash, not random). */
  def saltedDistinctCount(df: DataFrame, key: Column, value: Column,
                          saltBuckets: Int = 16): DataFrame =
    df.select(key.as("k"), value.as("v"),
        pmod(hash(value), lit(saltBuckets)).as("salt"))
      .groupBy(col("k"), col("salt"))
      .agg(countDistinct(col("v")).as("partial"))
      .groupBy(col("k"))
      .agg(sum(col("partial")).as("n_distinct"))
}
