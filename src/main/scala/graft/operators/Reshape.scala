package graft.operators

import graft.{Q, QModule}
import graft.Tables.{dsum, t}
import org.apache.spark.sql.functions._

/** Reshaping operators: pivot / unpivot / grouping sets / deterministic
  * sampling. The reference has none of these (its one "reshape" is the
  * frontend table transpose in TableComponent.jsx); they complete the
  * relational surface a warehouse user expects.
  *
  * Scale posture: pivot with an EXPLICIT value list is one hash aggregate
  * (no extra pass to discover values — at 100 TB value discovery is its own
  * job); unpivot is a map-side generate (no shuffle); sampling is a
  * deterministic predicate, never `rand()` (reproducible across retries
  * and engines — a failed task re-samples identically).
  */
object Reshape extends QModule {

  def qs: Seq[Q] = Seq(
    // R1: pivot orders count by priority across status rows. The value list
    // is explicit so Spark skips the distinct-values discovery pass.
    Q("r1_pivot", (s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .groupBy($"o_orderstatus")
        .pivot("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .agg(count(lit(1)))
        .na.fill(0L) // absent combos: match the oracle's COUNT FILTER = 0
        .orderBy($"o_orderstatus")
    }, sql = Some("""
      SELECT o_orderstatus,
             COUNT(*) FILTER (o_orderpriority = '1-URGENT') AS "1-URGENT",
             COUNT(*) FILTER (o_orderpriority = '2-HIGH') AS "2-HIGH",
             COUNT(*) FILTER (o_orderpriority = '3-MEDIUM') AS "3-MEDIUM",
             COUNT(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS "4-NOT SPECIFIED",
             COUNT(*) FILTER (o_orderpriority = '5-LOW') AS "5-LOW"
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """)),

    // R2: unpivot (melt) part metrics to long form — map-side generate.
    Q("r2_unpivot", (s, dir) => {
      import s.implicits._
      t(s, dir, "part")
        .select($"p_partkey", $"p_size".cast("double").as("p_size"),
          $"p_retailprice")
        .unpivot(Array($"p_partkey"), Array($"p_size", $"p_retailprice"),
          "metric", "value")
        .orderBy($"p_partkey", $"metric")
    }, sql = Some("""
      SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
      UNION ALL
      SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value FROM part
      ORDER BY p_partkey, metric
    """)),

    // R3: grouping sets — the general form of g8's rollup / g9's cube
    // (two one-dimension sets + grand total, no cross combination).
    Q("r3_grouping_sets", (s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .groupingSets(
          Seq(Seq($"o_orderstatus"), Seq($"o_orderpriority"), Seq()),
          $"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("sum_price"))
        .orderBy($"o_orderstatus".asc_nulls_first,
          $"o_orderpriority".asc_nulls_first)
    }, sql = Some("""
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
    """)),

    // R4: deterministic hash sample (~5%) — md5-keyed predicate, not
    // rand(): reproducible across engines, retries, and partitionings.
    // (A computed md5 can't prune parquet row groups, so it evaluates
    // post-scan; determinism, not pushdown, is the win over rand().)
    Q("r4_hash_sample", (s, dir) => {
      import s.implicits._
      val slot = conv(substring(md5($"o_orderkey".cast("string")
        .cast("binary")), 1, 8), 16, 10).cast("long") % 100
      t(s, dir, "orders")
        .filter(slot < 5)
        .agg(count(lit(1)).as("n_sample"),
          dsum($"o_totalprice").as("sum_price"),
          min($"o_orderkey").as("min_key"), max($"o_orderkey").as("max_key"))
    }, sql = Some("""
      SELECT COUNT(*) AS n_sample,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
             MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
      FROM orders
      WHERE ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT % 100 < 5
    """)),

    // R5: deterministic STRATIFIED sample — per-language rates (downsample
    // the dominant language, keep the tail: the training-mix rebalancing
    // move). Same md5-slot predicate as r4 with the rate a per-row CASE on
    // the stratum: still one map-side filter, no shuffle, no per-stratum
    // passes, reproducible across engines/retries/partitionings.
    Q("r5_stratified_sample", (s, dir) => {
      import s.implicits._
      val slot = conv(substring(md5($"doc_id".cast("string")
        .cast("binary")), 1, 8), 16, 10).cast("long") % 100
      val rate = when($"lang" === "en", 5).otherwise(20)
      t(s, dir, "documents")
        .filter(slot < rate)
        .select($"doc_id", $"lang")
        .orderBy($"doc_id")
    }, sql = Some("""
      SELECT doc_id, lang FROM documents
      WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
            < CASE WHEN lang = 'en' THEN 5 ELSE 20 END
      ORDER BY doc_id
    """)),

    // R6: fixed-size per-stratum sample (k=3 per priority class) — the
    // "exactly k examples per group" need a rate-based sample (r5) can't
    // meet. Rank = md5 of the key: deterministic across engines, retries,
    // partitionings — a seedless reservoir. The rank<=k filter compiles to
    // WindowGroupLimit: each partition keeps only its top-k BEFORE the
    // shuffle, so state is O(groups·k), never a global sort.
    Q("r6_reservoir_per_group", (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"o_orderpriority")
        .orderBy(md5($"o_orderkey".cast("string").cast("binary")), $"o_orderkey")
      t(s, dir, "orders")
        .withColumn("rk", row_number().over(w)).filter($"rk" <= 3)
        .select($"o_orderpriority", $"rk", $"o_orderkey", $"o_totalprice")
        .orderBy($"o_orderpriority", $"rk")
    }, sql = Some("""
      SELECT o_orderpriority, rk, o_orderkey, o_totalprice FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_orderpriority
                 ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey) AS rk
        FROM orders) t
      WHERE rk <= 3 ORDER BY o_orderpriority, rk
    """))
  )
}
