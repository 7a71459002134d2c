package graft.operators

import graft.{Q, QModule, Tables}
import graft.Tables.{davg, dsum, t}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Core relational operator inventory (SURVEY.md §2.1–§2.3, §2.8) expressed
  * over the driver testdata tables, one DuckDB-oracled query per operator.
  *
  * Reference semantics being re-expressed (citations are reference files):
  *  - S3 full scan: load_warehouse/src/main/java/ETLMain.java:195-220
  *  - S4 filtered scan: transform_staging/.../LotteryTransform.java:113-114
  *  - S5 point lookup: crawl_data/.../LotteryCrawler.java:115-137
  *  - S7 existence probe: StagingDW/.../StagingController.java:41-67
  *  - F2-F8 predicates: LotteryTransform.java:113-152, CsvLoader.java:39
  */
object Relational extends QModule {

  /** Year-partitioned copy of `orders`, materialized once per sfDir under
    * the JVM temp dir (the K2 partitionBy write path proven in IoSpec) —
    * the warehouse layout a 100 TB fact table would actually use. Reads
    * through this get PARTITION pruning: a year predicate eliminates
    * whole directories at planning time (no footer even opened), which
    * at scale is the difference between scanning one year and ten. */
  def ordersByYear(s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    val safe = dir.replaceAll("[^A-Za-z0-9.]", "_")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_part_$safe/orders_by_year"
    if (!new java.io.File(path).exists())
      t(s, dir, "orders")
        .withColumn("o_year", year(col("o_orderdate")))
        .write.mode("ignore").partitionBy("o_year").parquet(path)
    s.read.parquet(path)
  }

  /** Materialized year dimension over the orders fact (the reference's
    * dim_date recompute pattern in miniature): one row per order year with
    * its volume share of the whole table, written once beside the
    * partitioned fact layout. A share filter on THIS table is what makes
    * dynamic partition pruning fire in s10 — the dim is a plain
    * scan + literal filter, which Catalyst's DPP rule recognizes as a
    * selective build side (a filter buried under the aggregation that
    * derives the dim would not be). */
  def yearDim(s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    val safe = dir.replaceAll("[^A-Za-z0-9.]", "_")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_part_$safe/dim_year"
    if (!new java.io.File(path).exists()) {
      val perYear = t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("d_year"))
        .agg(count(lit(1)).as("yr_n"))
      val total = perYear.agg(sum(col("yr_n")).as("tot"))
      perYear.crossJoin(broadcast(total))
        .select(col("d_year"), col("yr_n"),
          (col("yr_n") / col("tot")).as("yr_share"))
        .write.mode("ignore").parquet(path)
    }
    s.read.parquet(path)
  }

  def qs: Seq[Q] = Seq(
    // Flagship: TPC-H Q1-shaped wide aggregation — full scan, hash agg,
    // map-side partial aggregation, 6 aggregates in one pass.
    Q("q1_agg", (s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .filter($"l_shipdate" < lit("2001-01-01").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          dsum($"l_quantity").as("sum_qty"),
          dsum($"l_extendedprice").as("sum_base_price"),
          dsum($"l_extendedprice" * (lit(1) - $"l_discount"), 4).as("sum_disc_price"),
          dsum($"l_extendedprice" * (lit(1) - $"l_discount") * (lit(1) + $"l_tax"), 6).as("sum_charge"),
          davg($"l_quantity").as("avg_qty"),
          davg($"l_discount", 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }, sql = Some("""
      SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_disc,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate < TIMESTAMP '2001-01-01'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus
    """), headline = true),

    // S3: full-table scan (ETLMain.java:195-220's SELECT *), small dim.
    Q("s3_full_scan", (s, dir) => {
      import s.implicits._
      t(s, dir, "region").orderBy($"r_regionkey")
    }, sql = Some("SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey")),

    // S4+F2: filtered scan with projection — the reference's central
    // `WHERE prize = 'Giải Bảy'` filter shape; predicate+pruning must reach
    // the parquet scan (checked in PlanHygieneSpec).
    Q("s4_filtered_scan", (s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .filter($"o_orderstatus" === "F" && $"o_totalprice" > 100000.0)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
        .orderBy($"o_orderkey")
    }, sql = Some("""
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      WHERE o_orderstatus = 'F' AND o_totalprice > 100000.0
      ORDER BY o_orderkey
    """)),

    // S5: key-lookup point query (config_source WHERE source_id = ?).
    Q("s5_point_lookup", (s, dir) => {
      import s.implicits._
      t(s, dir, "nation").filter($"n_nationkey" === 7)
        .select($"n_nationkey", $"n_name", $"n_regionkey")
    }, sql = Some(
      "SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_nationkey = 7")),

    // S7: existence probe — ORDER BY ... LIMIT 1 over a predicate
    // (StagingController.java:41-44 gating pattern).
    Q("s7_exists_probe", (s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .filter($"o_orderstatus" === "F")
        .orderBy($"o_orderdate".desc, $"o_orderkey".desc)
        .select($"o_orderkey")
        .limit(1)
    }, sql = Some("""
      SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
      ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1
    """)),

    // S9 (scale posture): partition-pruned scan over the year-partitioned
    // fact layout — the year predicate is a PARTITION filter (directory
    // elimination at planning time), not a data filter; PlanHygieneSpec
    // asserts the scan reads only the 1997 partition's files. The oracle
    // replays the predicate over the flat table: same rows by
    // construction, so the layout step is proven value-neutral too.
    Q("s9_partition_pruned_scan", (s, dir) => {
      import s.implicits._
      Relational.ordersByYear(s, dir)
        .filter($"o_year" === 1997)
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n_orders"), max($"o_orderkey").as("max_orderkey"))
        .orderBy($"o_orderstatus")
    }, sql = Some("""
      SELECT o_orderstatus, COUNT(*) AS n_orders, MAX(o_orderkey) AS max_orderkey
      FROM orders WHERE year(o_orderdate) = 1997
      GROUP BY o_orderstatus ORDER BY o_orderstatus
    """)),

    // S10 (scale posture): DYNAMIC partition pruning — the year predicate
    // lives on a joined dimension, not the fact, so planning-time pruning
    // can't see it; Catalyst's DPP rule turns the broadcast dim into a
    // runtime partition filter (dynamicpruningexpression in the scan,
    // asserted in PlanHygieneSpec) and the fact still reads ONE year
    // directory of seven. THE star-schema scan pattern at 100 TB: date-dim
    // filters prune fact partitions without ever materializing the
    // unfiltered fact. The dim here is the distinct-years table derived
    // from orders (this schema has no separate date dim), filtered like
    // any dim would be.
    // The dim filter must sit on a NON-join attribute (here: the year's
    // order volume vs 10% of total, integer-exact at every SF): an
    // equality/modulo filter on the join key itself would constant-fold
    // into a STATIC partition filter via constraint propagation and DPP
    // would never fire (good pruning, wrong demonstration).
    Q("s10_dpp_join", (s, dir) => {
      import s.implicits._
      val fact = Relational.ordersByYear(s, dir)
      // yr_share >= 0.1 is a literal comparison over the materialized dim
      // (0.145 for full years vs 0.083 for partial 2001 at every SF — the
      // boundary is never close, and the share was computed as ONE
      // long/long→double IEEE division, identical cross-engine)
      val dimYear = Relational.yearDim(s, dir)
        .filter($"yr_share" >= 0.1)
        .select($"d_year")
      fact.join(broadcast(dimYear), $"o_year" === $"d_year")
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n_orders"), max($"o_orderkey").as("max_orderkey"))
        .orderBy($"o_orderstatus")
    }, sql = Some("""
      WITH per_year AS (
        SELECT year(o_orderdate) AS d_year, COUNT(*) AS yr_n
        FROM orders GROUP BY 1),
      dim AS (
        SELECT d_year FROM per_year
        WHERE CAST(yr_n AS DOUBLE) / (SELECT SUM(yr_n) FROM per_year) >= 0.1)
      SELECT o_orderstatus, COUNT(*) AS n_orders, MAX(o_orderkey) AS max_orderkey
      FROM orders JOIN dim ON year(o_orderdate) = d_year
      GROUP BY o_orderstatus ORDER BY o_orderstatus
    """)),

    // Z-order (Morton) layout: NORMALIZE each dimension to its [min,max]
    // domain at 16-bit resolution, interleave, then range-bucket on the
    // code. The output is the pruning property itself: within each
    // z-bucket BOTH dimensions' min..max spans are ~sqrt(global) — so
    // after `repartitionByRange(zval).sortWithinPartitions(zval)` +
    // parquet write, a range predicate on EITHER l_partkey OR l_suppkey
    // skips most row groups on footer min/max alone. This is the
    // write-side layout step (Delta/Iceberg OPTIMIZE ZORDER) a 100 TB
    // table needs when two filter columns compete for the sort order.
    // Normalization is load-bearing, not cosmetic: these domains differ
    // ~20× (partkey vs suppkey), and interleaving RAW values lets the
    // wide key's high bits own every significant Morton position —
    // ScaleBench's layout mode measured exactly that degeneration in
    // Compact.zorder (64/64 files hit on the narrow key) before the
    // same fix. Bounds are one tiny scalar agg broadcast back over the
    // scan; the z-value stays 32 codegen'd shift/mask terms, map-only.
    Q("s11_zorder_layout", (s, dir) => {
      import s.implicits._
      val bounds = t(s, dir, "lineitem").agg(
        min($"l_partkey").as("pklo"), max($"l_partkey").as("pkhi"),
        min($"l_suppkey").as("sklo"), max($"l_suppkey").as("skhi"))
      val zval = (0 until 16).map { i =>
        shiftleft(shiftright($"pn", i).bitwiseAND(1), 2 * i) +
          shiftleft(shiftright($"sn", i).bitwiseAND(1), 2 * i + 1)
      }.reduce(_ + _)
      t(s, dir, "lineitem")
        .select($"l_partkey", $"l_suppkey")
        .crossJoin(broadcast(bounds))
        .withColumn("pn", expr(
          "(l_partkey - pklo) * 65535 div greatest(pkhi - pklo, 1)"))
        .withColumn("sn", expr(
          "(l_suppkey - sklo) * 65535 div greatest(skhi - sklo, 1)"))
        .select($"l_partkey", $"l_suppkey", zval.as("zval"))
        .withColumn("z_bucket", expr("zval div 67108864")) // 2^26 → 64 cells
        .groupBy($"z_bucket")
        .agg(count(lit(1)).as("n"),
          min($"l_partkey").as("pk_min"), max($"l_partkey").as("pk_max"),
          min($"l_suppkey").as("sk_min"), max($"l_suppkey").as("sk_max"))
        .orderBy($"z_bucket")
    }, sql = Some(s"""
      WITH b AS (
        SELECT MIN(l_partkey) AS pklo, MAX(l_partkey) AS pkhi,
               MIN(l_suppkey) AS sklo, MAX(l_suppkey) AS skhi FROM lineitem),
      nrm AS (
        SELECT l_partkey, l_suppkey,
               (l_partkey - pklo) * 65535 // GREATEST(pkhi - pklo, 1) AS pn,
               (l_suppkey - sklo) * 65535 // GREATEST(skhi - sklo, 1) AS sn
        FROM lineitem, b),
      -- zval as one ROW-LOCAL 32-term expression (no unnest-regroup: the
      -- earlier GROUP BY (l_orderkey, l_linenumber, ...) form assumed
      -- that key unique, and the synthetic sf0.001 lineitem violates it —
      -- a duplicate full key collapsed two rows and desynced one bucket
      -- count from the per-row Spark side)
      z AS (
        SELECT l_partkey, l_suppkey,
               ${(0 until 16).map(i =>
                   s"(((pn >> $i) & 1) << ${2 * i}) + (((sn >> $i) & 1) << ${2 * i + 1})")
                 .mkString(" + ")} AS zval
        FROM nrm)
      SELECT zval // 67108864 AS z_bucket, COUNT(*) AS n,
             MIN(l_partkey) AS pk_min, MAX(l_partkey) AS pk_max,
             MIN(l_suppkey) AS sk_min, MAX(l_suppkey) AS sk_max
      FROM z GROUP BY 1 ORDER BY z_bucket
    """)),

    // F3/F5/F6: row-validity + null-guard + cast-quarantine in one pass —
    // the CsvLoader.java:39 / LotteryTransform.java:127-152 pattern: parse,
    // quarantine unparseable rows by cast-null, keep the good ones.
    Q("f6_cast_quarantine", (s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .withColumn("k", get_json_object($"props", "$.k").cast("int"))
        .filter($"k".isNotNull && $"user_id".isNotNull)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_valid"), dsum($"k".cast("double"), 0).as("sum_k"))
        .orderBy($"event_type")
    }, sql = Some("""
      SELECT event_type, COUNT(*) AS n_valid,
             CAST(SUM(CAST(CAST(json_extract_string(props, '$.k') AS INT) AS DECIMAL(18,0))) AS DOUBLE) AS sum_k
      FROM events
      WHERE TRY_CAST(json_extract_string(props, '$.k') AS INT) IS NOT NULL
        AND user_id IS NOT NULL
      GROUP BY event_type ORDER BY event_type
    """)),

    // F8: date-validity predicate (reject "future" rows relative to a gate
    // date — crawler's draw-time gate, LotteryCrawler.java:96-112).
    Q("f8_date_guard", (s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .filter($"o_orderdate" <= lit("1996-12-31").cast("timestamp"))
        .agg(count(lit(1)).as("n_past"),
             max($"o_orderdate").cast("date").cast("string").as("max_date"))
    }, sql = Some("""
      SELECT COUNT(*) AS n_past,
             CAST(CAST(MAX(o_orderdate) AS DATE) AS VARCHAR) AS max_date
      FROM orders WHERE o_orderdate <= TIMESTAMP '1996-12-31'
    """)),

    // The spark.sql(...) entry path: ONE ANSI SQL text (TPC-H Q6 shape —
    // the classic pushdown showcase) runs verbatim through both
    // spark.sql over a temp view AND the DuckDB oracle. Catalyst plans it
    // identically to the DataFrame API (same parquet scan with
    // PushedFilters on shipdate/discount/quantity), demonstrating the SQL
    // surface costs nothing over the typed one.
    Q("sql_q6_revenue", (s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(q6Sql)
    }, sql = Some(q6Sql)),

    // NOT IN vs NOT EXISTS three-valued logic — the classic SQL
    // correctness trap, ONE text verbatim in spark.sql AND DuckDB: a
    // NULL in the NOT IN subquery makes the predicate UNKNOWN for every
    // row (count 0), while the null-free variant counts normally. Proves
    // the engine's null semantics match ANSI exactly, not just happy-path.
    Q("sql_notin_3vl", (s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql(notIn3vlSql)
    }, sql = Some(notIn3vlSql)),

    // Correlated scalar subquery — ONE text verbatim in both engines;
    // Catalyst decorrelates it to a left outer aggregate join (no
    // per-row re-execution), which is exactly what a 100 TB plan needs.
    Q("sql_corr_scalar", (s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql(corrScalarSql)
    }, sql = Some(corrScalarSql)),

    // LATERAL subquery with per-row ORDER BY + LIMIT — the "top-N per
    // outer row" SQL idiom, ONE text verbatim in both engines. Catalyst
    // decorrelates the lateral (DecorrelateInnerQuery) into a
    // rank-filtered Window over an equi-join — verified no nested loop,
    // no cartesian — which is the identical execution shape the typed
    // w5_rank_per_group declares; the point is that the SQL surface's
    // most per-row-looking construct still lands on the set-based plan a
    // 100 TB run needs. Zero-order customers drop on both engines (inner
    // lateral).
    Q("sql_lateral_topn", (s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("customer")
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql(lateralTopnSql)
    }, sql = Some(lateralTopnSql)),

    // Recursive CTE (Spark 4.1 + DuckDB, same text): the w9 gap-fill
    // date spine generated by RECURSION instead of sequence()/
    // generate_series — the portable form when neither generator exists.
    Q("sql_recursive_spine", (s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql(recursiveSpineSql)
    }, sql = Some(recursiveSpineSql)),

    // TPC-H Q21 shape: double-correlated EXISTS + NOT EXISTS on the same
    // fact table, ONE text verbatim in both engines (see q21Sql scaladoc
    // for the decorrelation story).
    Q("sql_q21_sole_supplier", (s, dir) => {
      t(s, dir, "supplier").createOrReplaceTempView("supplier")
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql(q21Sql)
    }, sql = Some(q21Sql)),

    // F9: data-quality audit — constraint violations AS DATA (the
    // "expectations" gate a warehouse runs before publishing a load):
    // key uniqueness, value sanity, null guards, and referential
    // integrity fact→dim, one row per rule. Shape at scale: the three
    // orders-local rules share ONE scan/aggregation (stack unpivots the
    // counts); each referential rule is a single anti-join whose build
    // side is only the key projection. All-zero output is the expected
    // steady state — the query proves the machinery, the oracle proves
    // the counts.
    Q("f9_dq_audit", (s, dir) => {
      import s.implicits._
      val o = t(s, dir, "orders")
      val local = o.agg(
          (count(lit(1)) - countDistinct($"o_orderkey")).as("dup_orderkey"),
          sum(when($"o_totalprice" <= 0, 1L).otherwise(0L)).as("nonpos_price"),
          sum(when($"o_orderdate".isNull, 1L).otherwise(0L)).as("null_orderdate"))
        .select(expr(
          """stack(3, 'dup_orderkey', dup_orderkey,
                      'nonpos_price', nonpos_price,
                      'null_orderdate', null_orderdate) AS (rule, n_violations)"""))
      val orphanLine = t(s, dir, "lineitem")
        .join(o.select($"o_orderkey"), $"l_orderkey" === $"o_orderkey", "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .select(lit("orphan_lineitem").as("rule"), $"n_violations")
      val orphanCust = o
        .join(t(s, dir, "customer").select($"c_custkey"),
          $"o_custkey" === $"c_custkey", "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .select(lit("orphan_order_cust").as("rule"), $"n_violations")
      local.unionByName(orphanLine).unionByName(orphanCust).orderBy($"rule")
    }, sql = Some("""
      SELECT rule, n_violations FROM (
        SELECT 'dup_orderkey' AS rule,
               CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_violations
        FROM orders
        UNION ALL
        SELECT 'nonpos_price',
               CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'null_orderdate',
               CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'orphan_lineitem', CAST(COUNT(*) AS BIGINT)
        FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
        UNION ALL
        SELECT 'orphan_order_cust', CAST(COUNT(*) AS BIGINT)
        FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
      ) t ORDER BY rule
    """))
  )

  /** Shared verbatim: correlated scalar subquery, decorrelated by the
    * optimizer into an aggregate join. */
  private val lateralTopnSql = """
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c,
         LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                  ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 2) t
    WHERE c.c_custkey < 200
    ORDER BY c.c_custkey ASC, t.o_totalprice DESC, t.o_orderkey ASC
  """

  private val corrScalarSql = """
    SELECT o_orderkey, o_totalprice,
           (SELECT MAX(o2.o_totalprice) FROM orders o2
            WHERE o2.o_custkey = o.o_custkey) AS cust_max
    FROM orders o
    WHERE o_orderkey < 20
    ORDER BY o_orderkey
  """

  /** Shared verbatim: recursive date spine + left join (gap-filled daily
    * counts for Jan 1997). */
  private val recursiveSpineSql = """
    WITH RECURSIVE d(day) AS (
      SELECT DATE '1997-01-01'
      UNION ALL
      SELECT day + INTERVAL 1 DAY FROM d WHERE day < DATE '1997-01-31')
    SELECT CAST(d.day AS VARCHAR(10)) AS d, COUNT(o_orderkey) AS n_orders
    FROM d LEFT JOIN orders ON CAST(o_orderdate AS DATE) = d.day
    GROUP BY d.day
    ORDER BY d
  """

  /** Shared verbatim between Spark SQL and DuckDB: a NULL in the NOT IN
    * list poisons the predicate to UNKNOWN for every probe row. */
  private val notIn3vlSql = """
    SELECT
      (SELECT COUNT(*) FROM orders
       WHERE o_orderstatus NOT IN (SELECT nullif(o_orderstatus, 'P') FROM orders))
        AS n_notin_with_null,
      (SELECT COUNT(*) FROM orders
       WHERE o_orderstatus NOT IN (SELECT o_orderstatus FROM orders
                                   WHERE o_orderstatus <> 'P'))
        AS n_notin_no_null
  """

  /** Shared verbatim between Spark SQL and DuckDB: ANSI subset, decimal
    * sums for order-independence (the dsum contract in SQL form). */
  private val q6Sql = """
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) >= DATE '1994-01-01'
      AND CAST(l_shipdate AS DATE) < DATE '1995-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
  """

  /** TPC-H Q21 shape adapted to the available columns (no receipt/commit
    * dates): suppliers who were the SOLE returned-item supplier on a
    * finished multi-supplier order — correlated EXISTS and NOT EXISTS
    * against the same fact, the double-correlation decorrelation test.
    * Catalyst plans the pair as one left-semi and one left-anti hash
    * join on l_orderkey with the supplier inequality as a residual —
    * no per-row subquery re-execution at any scale. */
  private val q21Sql = """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
  """
}
