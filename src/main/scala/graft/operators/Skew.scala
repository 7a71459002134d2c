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

  /** Hybrid skew JOIN: hot keys never enter the exchange.
    *
    * AQE's OptimizeSkewedJoin splits an oversized shuffle partition into
    * several tasks, but every hot row is still written to and read from the
    * shuffle. This operator removes the hot rows from the exchange
    * entirely: fact keys whose frequency reaches `hotThreshold` join
    * map-side against a broadcast of the dim slice restricted to those
    * keys, while the (now skew-free) remainder takes the ordinary shuffle
    * join. The union of the two branches equals the plain inner join
    * `fact ⋈ dim` for ANY threshold — the threshold only moves rows
    * between branches, so correctness is oracle-checkable against the
    * plain SQL join (j12).
    *
    * Detection is one partially-aggregated count of the fact keys (map-side
    * combine ⇒ the detection shuffle moves |distinct key| partial rows, not
    * the raw fact). A caller that already knows its hot keys (yesterday's
    * stats, a domain blocklist) passes `knownHot` and skips the scan. The
    * hot set is hard-capped at `maxHot` rows — loud fail beyond, because an
    * unbounded broadcast slice is the exact OOM this operator exists to
    * avoid; `overflowToCold = true` instead keeps the HEAVIEST `maxHot`
    * keys hot and degrades the rest to the shuffle branch (exact for any
    * subset — the branches partition the fact by key — and the broadcast
    * stays bounded even when the threshold was misestimated).
    *
    * At 100 TB: the cold branch's post-split key histogram is bounded by
    * `hotThreshold`, so no shuffle partition exceeds threshold × row-width
    * regardless of how pathological the original skew was; the hot branch
    * is map-only (no exchange on either input — the dim slice is ≤ maxHot
    * rows by construction).
    */
  def hybridSkewJoin(fact: DataFrame, dim: DataFrame,
                     factKey: String, dimKey: String,
                     hotThreshold: Long,
                     maxHot: Int = 10000,
                     knownHot: Option[Seq[Any]] = None,
                     overflowToCold: Boolean = false): DataFrame = {
    val hot: Seq[Any] = knownHot.getOrElse {
      val counted = fact.groupBy(col(factKey)).agg(count(lit(1)).as("c"))
        .filter(col("c") >= hotThreshold && col(factKey).isNotNull)
      if (overflowToCold) {
        // A misestimated threshold must not fail the job: ANY subset of
        // keys is an exact split (the branches partition the fact), so
        // keep the HEAVIEST maxHot keys hot — they carry the skew the
        // operator exists to remove — and let the overflow degrade to
        // the shuffle branch, where AQE skew-splitting still applies.
        // Deterministic tie-break so replays pick the same set.
        counted.orderBy(col("c").desc, col(factKey).asc)
          .limit(maxHot).collect().map(_.get(0)).toSeq
      } else {
        val rows = counted.limit(maxHot + 1).collect()
        require(rows.length <= maxHot,
          s"hybridSkewJoin: more than $maxHot keys at frequency >= " +
            s"$hotThreshold — raise hotThreshold or maxHot, or pass " +
            "overflowToCold=true to keep only the heaviest maxHot keys " +
            "hot (a broadcast slice this wide defeats the purpose)")
        rows.map(_.get(0)).toSeq
      }
    }
    if (hot.isEmpty) fact.join(dim, col(factKey) === col(dimKey))
    else {
      // Null fact keys can never match an inner equi-join, so it is exact
      // to let the cold filter drop them with the hot ones excluded.
      val hotJoin = fact.filter(col(factKey).isin(hot: _*))
        .join(broadcast(dim.filter(col(dimKey).isin(hot: _*))),
          col(factKey) === col(dimKey))
      val coldJoin = fact.filter(!col(factKey).isin(hot: _*))
        .join(dim, col(factKey) === col(dimKey))
      hotJoin.unionByName(coldJoin)
    }
  }
}
