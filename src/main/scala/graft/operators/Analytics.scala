package graft.operators

import graft.{Q, QModule}
import graft.Tables.{dsum, t}
import org.apache.spark.sql.functions._

/** Multi-join analytical queries (TPC-H Q3/Q5/Q10 shapes) — the "everything
  * at once" tier the reference never reaches: selective dimension filters,
  * fact-to-fact joins, aggregation over the join result, top-k on the
  * aggregate.
  *
  * Scale posture: filters land on the dimension side *before* the join
  * (Catalyst pushes them into the scans). Only fixed-cardinality dims
  * (nation=25, region=5) carry an explicit `broadcast()` hint; customer
  * and supplier GROW with the dataset (TPC-H scaling), so hinting them
  * would force an impossible broadcast at 100 TB — AQE decides for them
  * at runtime and still picks broadcast when the filtered side is small.
  */
object Analytics extends QModule {

  def qs: Seq[Q] = Seq(
    // Q3 shape: revenue of urgent BUILDING-segment orders not yet shipped.
    Q("q3_shipping_priority", (s, dir) => {
      import s.implicits._
      val cust = t(s, dir, "customer").filter($"c_mktsegment" === "BUILDING")
        .select($"c_custkey")
      val ord = t(s, dir, "orders")
        .filter($"o_orderdate" < lit("1998-01-01").cast("timestamp"))
        .select($"o_orderkey", $"o_custkey", $"o_orderdate")
      val li = t(s, dir, "lineitem")
        .filter($"l_shipdate" > lit("1998-01-01").cast("timestamp"))
        .select($"l_orderkey", $"l_extendedprice", $"l_discount")
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(cust, $"o_custkey" === $"c_custkey")
        .groupBy($"l_orderkey", $"o_orderdate")
        .agg(dsum($"l_extendedprice" * (lit(1) - $"l_discount"), 4).as("revenue"))
        .select($"l_orderkey",
          $"o_orderdate".cast("date").cast("string").as("order_date"), $"revenue")
        .orderBy($"revenue".desc, $"l_orderkey".asc)
        .limit(10)
    }, sql = Some("""
      SELECT l_orderkey, CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-01-01'
        AND l_shipdate > TIMESTAMP '1998-01-01'
      GROUP BY l_orderkey, o_orderdate
      ORDER BY revenue DESC, l_orderkey ASC LIMIT 10
    """), headline = true),

    // Q5 shape: local-supplier revenue per nation (6-way join: lineitem ⋈
    // orders ⋈ customer ⋈ supplier ⋈ nation ⋈ region, c/s nation equality).
    Q("q5_local_supplier_volume", (s, dir) => {
      import s.implicits._
      val nat = t(s, dir, "nation")
      val reg = t(s, dir, "region").filter($"r_name" === "ASIA")
      val natInRegion = nat.join(broadcast(reg), $"n_regionkey" === $"r_regionkey")
        .select($"n_nationkey", $"n_name")
      val cust = t(s, dir, "customer").select($"c_custkey", $"c_nationkey")
      val sup = t(s, dir, "supplier").select($"s_suppkey", $"s_nationkey")
      val ord = t(s, dir, "orders")
        .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
                $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
        .select($"o_orderkey", $"o_custkey")
      val li = t(s, dir, "lineitem")
        .select($"l_orderkey", $"l_suppkey", $"l_extendedprice", $"l_discount")
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(cust, $"o_custkey" === $"c_custkey")
        .join(sup,
          $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
        .join(broadcast(natInRegion), $"s_nationkey" === $"n_nationkey")
        .groupBy($"n_name")
        .agg(dsum($"l_extendedprice" * (lit(1) - $"l_discount"), 4).as("revenue"))
        .orderBy($"revenue".desc, $"n_name".asc)
    }, sql = Some("""
      SELECT n_name,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY n_name ORDER BY revenue DESC, n_name ASC
    """), headline = true),

    // Q10 shape: top customers by returned-item revenue.
    Q("q10_returned_items", (s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem").filter($"l_returnflag" === "R")
        .select($"l_orderkey", $"l_extendedprice", $"l_discount")
      val ord = t(s, dir, "orders")
        .filter($"o_orderdate" >= lit("1997-01-01").cast("timestamp") &&
                $"o_orderdate" < lit("1998-01-01").cast("timestamp"))
        .select($"o_orderkey", $"o_custkey")
      val cust = t(s, dir, "customer")
        .select($"c_custkey", $"c_name", $"c_nationkey", $"c_acctbal")
      val nat = t(s, dir, "nation").select($"n_nationkey", $"n_name")
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(cust, $"o_custkey" === $"c_custkey")
        .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
        .groupBy($"c_custkey", $"c_name", $"n_name", $"c_acctbal")
        .agg(dsum($"l_extendedprice" * (lit(1) - $"l_discount"), 4).as("revenue"))
        .orderBy($"revenue".desc, $"c_custkey".asc)
        .limit(20)
    }, sql = Some("""
      SELECT c_custkey, c_name, n_name, c_acctbal,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
      GROUP BY c_custkey, c_name, n_name, c_acctbal
      ORDER BY revenue DESC, c_custkey ASC LIMIT 20
    """), headline = true),

    // Q4 shape: correlated EXISTS — orders (in a quarter) that have at
    // least one returned line, counted per priority. The EXISTS compiles
    // to a LEFT SEMI hash join (probe side never duplicates), then one
    // hash agg over 5 groups.
    Q("q4_exists_returned", (s, dir) => {
      import s.implicits._
      val ord = t(s, dir, "orders")
        .filter($"o_orderdate" >= lit("1997-01-01").cast("timestamp") &&
                $"o_orderdate" < lit("1997-04-01").cast("timestamp"))
      val returned = t(s, dir, "lineitem")
        .filter($"l_returnflag" === "R").select($"l_orderkey")
      ord.join(returned, $"o_orderkey" === $"l_orderkey", "left_semi")
        .groupBy($"o_orderpriority").agg(count(lit(1)).as("order_count"))
        .orderBy($"o_orderpriority")
    }, sql = Some("""
      SELECT o_orderpriority, COUNT(*) AS order_count
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate < TIMESTAMP '1997-04-01'
        AND EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      GROUP BY o_orderpriority ORDER BY o_orderpriority
    """)),

    // Q12 shape: two-way conditional counting after a fact-fact join —
    // per return flag, how many 1996-shipped lines belong to high- vs
    // low-priority orders. One join keyed on orderkey, one 3-group agg;
    // the CASE counts are longs (exact cross-engine).
    Q("q12_priority_class", (s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem")
        .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
                $"l_shipdate" < lit("1997-01-01").cast("timestamp"))
        .select($"l_orderkey", $"l_returnflag")
      val high = $"o_orderpriority".isin("1-URGENT", "2-HIGH")
      li.join(t(s, dir, "orders").select($"o_orderkey", $"o_orderpriority"),
          $"l_orderkey" === $"o_orderkey")
        .groupBy($"l_returnflag")
        .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
             sum(when(!high, 1L).otherwise(0L)).as("low_line_count"))
        .orderBy($"l_returnflag")
    }, sql = Some("""
      SELECT l_returnflag,
             CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                           THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_returnflag ORDER BY l_returnflag
    """)),

    // Q14 shape: ratio of two order-independent fixed-point sums over the
    // same joined scan (promo revenue share). The division is the single
    // final IEEE op, so the percentage hashes identically. part SCALES
    // with the dataset → no broadcast hint, AQE decides (policy c657512).
    Q("q14_promo_revenue", (s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem")
        .filter($"l_shipdate" >= lit("1995-09-01").cast("timestamp") &&
                $"l_shipdate" < lit("1995-10-01").cast("timestamp"))
        .select($"l_partkey", $"l_extendedprice", $"l_discount")
      val rev = $"l_extendedprice" * (lit(1) - $"l_discount")
      li.join(t(s, dir, "part").select($"p_partkey", $"p_type"),
          $"l_partkey" === $"p_partkey")
        .agg(dsum(when($"p_type" === "PROMO", rev).otherwise(0), 4).as("promo_revenue"),
             dsum(rev, 4).as("total_revenue"))
        .select((lit(100.0) * $"promo_revenue" / $"total_revenue").as("promo_pct"),
          $"promo_revenue", $"total_revenue")
    }, sql = Some("""
      WITH r AS (
        SELECT CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END AS DECIMAL(18,4))) AS DOUBLE) AS promo_revenue,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1995-09-01'
          AND l_shipdate < TIMESTAMP '1995-10-01')
      SELECT 100.0 * promo_revenue / total_revenue AS promo_pct,
             promo_revenue, total_revenue
      FROM r
    """)),

    // Q19 shape: disjunctive (OR'd) multi-column join predicates — the
    // optimizer stress case: the common `l_partkey = p_partkey` conjunct
    // must still drive a hash join, with the OR branches evaluated as a
    // residual filter, never a nested-loop over the disjunction.
    Q("q19_disjunctive", (s, dir) => {
      import s.implicits._
      val branch1 = $"p_brand" === "Brand#1" && $"p_size".between(1, 15) &&
        $"l_quantity" >= 10
      val branch2 = $"p_brand" === "Brand#3" && $"p_size".between(16, 40) &&
        $"l_quantity" < 10
      t(s, dir, "lineitem")
        .join(t(s, dir, "part"), $"l_partkey" === $"p_partkey")
        .filter(branch1 || branch2)
        .agg(count(lit(1)).as("n_lines"),
          dsum($"l_extendedprice" * (lit(1) - $"l_discount"), 4).as("revenue"))
    }, sql = Some("""
      SELECT COUNT(*) AS n_lines,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 10)
         OR (p_brand = 'Brand#3' AND p_size BETWEEN 16 AND 40 AND l_quantity < 10)
    """)),

    // FILTER-clause aggregation with DISTINCT — conditional distinct
    // counting without self-joins or CASE-to-NULL tricks.
    Q("g18_filtered_distinct", (s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .groupBy($"o_orderstatus")
        .agg(
          countDistinct($"o_custkey").as("n_cust"),
          expr("count(DISTINCT o_custkey) FILTER (WHERE o_totalprice > 200000)")
            .as("n_big_cust"),
          expr("count(*) FILTER (WHERE o_totalprice > 200000)").as("n_big_orders"))
        .orderBy($"o_orderstatus")
    }, sql = Some("""
      SELECT o_orderstatus,
             COUNT(DISTINCT o_custkey) AS n_cust,
             COUNT(DISTINCT o_custkey) FILTER (WHERE o_totalprice > 200000) AS n_big_cust,
             COUNT(*) FILTER (WHERE o_totalprice > 200000) AS n_big_orders
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """)),

    // Q22 shape: global-aggregate threshold (scalar subquery → broadcast
    // one row) + NOT EXISTS (anti-join). The average is derived from an
    // exact decimal sum and ONE division (g13 pattern), so the filter
    // boundary is the same double in both engines.
    Q("q22_rich_inactive", (s, dir) => {
      import s.implicits._
      val cust = t(s, dir, "customer")
      val thresh = cust.filter($"c_acctbal" > 0)
        .agg((sum($"c_acctbal".cast(org.apache.spark.sql.types.DecimalType(18, 2))).cast("double") /
          count(lit(1))).as("avg_bal"))
      cust.crossJoin(broadcast(thresh))
        .filter($"c_acctbal" > $"avg_bal")
        .join(t(s, dir, "orders").select($"o_custkey"),
          $"c_custkey" === $"o_custkey", "left_anti")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_rich_inactive"),
          dsum($"c_acctbal").as("total_bal"))
        .orderBy($"c_mktsegment")
    }, sql = Some("""
      SELECT c_mktsegment, COUNT(*) AS n_rich_inactive,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
      FROM customer
      WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                                / COUNT(*)
                         FROM customer WHERE c_acctbal > 0)
        AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      GROUP BY c_mktsegment ORDER BY c_mktsegment
    """)),

    // Q7 shape: bilateral nation-pair shipping volume — both nation dims
    // are pre-filtered to the pair BEFORE their joins (two tiny broadcast
    // dims prune suppliers/customers at the scan edge), then the
    // same-nation combinations drop in a residual filter and revenue
    // groups by (supp_nation, cust_nation, year).
    Q("q7_nation_volume", (s, dir) => {
      import s.implicits._
      val pair = Seq("NATION_1", "NATION_2")
      val natS = broadcast(t(s, dir, "nation").filter($"n_name".isin(pair: _*))
        .select($"n_nationkey".as("sn_key"), $"n_name".as("supp_nation")))
      val natC = broadcast(t(s, dir, "nation").filter($"n_name".isin(pair: _*))
        .select($"n_nationkey".as("cn_key"), $"n_name".as("cust_nation")))
      val sup = t(s, dir, "supplier").select($"s_suppkey", $"s_nationkey")
        .join(natS, $"s_nationkey" === $"sn_key")
      val cust = t(s, dir, "customer").select($"c_custkey", $"c_nationkey")
        .join(natC, $"c_nationkey" === $"cn_key")
      val ord = t(s, dir, "orders").select($"o_orderkey", $"o_custkey")
      t(s, dir, "lineitem")
        .filter($"l_shipdate" >= lit("1995-01-01").cast("timestamp") &&
                $"l_shipdate" < lit("1997-01-01").cast("timestamp"))
        .select($"l_orderkey", $"l_suppkey", $"l_shipdate",
          $"l_extendedprice", $"l_discount")
        .join(ord, $"l_orderkey" === $"o_orderkey")
        .join(cust, $"o_custkey" === $"c_custkey")
        .join(sup, $"l_suppkey" === $"s_suppkey")
        .filter($"supp_nation" =!= $"cust_nation")
        .withColumn("l_year", year($"l_shipdate"))
        .groupBy($"supp_nation", $"cust_nation", $"l_year")
        .agg(dsum($"l_extendedprice" * (lit(1) - $"l_discount"), 4).as("revenue"))
        .orderBy($"supp_nation", $"cust_nation", $"l_year")
    }, sql = Some("""
      SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
             year(l_shipdate) AS l_year,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      WHERE sn.n_name IN ('NATION_1', 'NATION_2')
        AND cn.n_name IN ('NATION_1', 'NATION_2')
        AND sn.n_name <> cn.n_name
        AND l_shipdate >= TIMESTAMP '1995-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """)),

    // Q8 shape: market share — one nation's revenue share of a region's
    // orders per year. ONE pass computes both numerator and denominator
    // as conditional sums over the same joined scan (the q14 pattern);
    // the share is a single final IEEE division, so it hashes exactly.
    Q("q8_market_share", (s, dir) => {
      import s.implicits._
      val region = broadcast(
        t(s, dir, "nation")
          .join(broadcast(t(s, dir, "region").filter($"r_name" === "AMERICA")),
            $"n_regionkey" === $"r_regionkey")
          .select($"n_nationkey".as("rn_key")))
      val cust = t(s, dir, "customer").select($"c_custkey", $"c_nationkey")
        .join(region, $"c_nationkey" === $"rn_key")
        .select($"c_custkey")
      val sup = t(s, dir, "supplier").select($"s_suppkey", $"s_nationkey")
        .join(broadcast(t(s, dir, "nation").select($"n_nationkey", $"n_name")),
          $"s_nationkey" === $"n_nationkey")
        .select($"s_suppkey", ($"n_name" === "NATION_1").as("is_target"))
      val ord = t(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", year($"o_orderdate").as("o_year"))
      val rev = $"l_extendedprice" * (lit(1) - $"l_discount")
      t(s, dir, "lineitem")
        .select($"l_orderkey", $"l_suppkey", $"l_extendedprice", $"l_discount")
        .join(ord, $"l_orderkey" === $"o_orderkey")
        .join(cust, $"o_custkey" === $"c_custkey")
        .join(sup, $"l_suppkey" === $"s_suppkey")
        .groupBy($"o_year")
        .agg(dsum(when($"is_target", rev).otherwise(0), 4).as("target_rev"),
          dsum(rev, 4).as("total_rev"))
        .select($"o_year", ($"target_rev" / $"total_rev").as("mkt_share"),
          $"target_rev", $"total_rev")
        .orderBy($"o_year")
    }, sql = Some("""
      WITH r AS (
        SELECT year(o_orderdate) AS o_year,
               CAST(SUM(CAST(CASE WHEN sn.n_name = 'NATION_1'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END AS DECIMAL(18,4))) AS DOUBLE) AS target_rev,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS total_rev
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region ON cn.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE r_name = 'AMERICA'
        GROUP BY 1)
      SELECT o_year, target_rev / total_rev AS mkt_share, target_rev, total_rev
      FROM r ORDER BY o_year
    """)),

    // Q13 shape: order-count distribution — LEFT OUTER join so
    // zero-order customers keep a 0 bucket, count(o_orderkey) (nulls
    // don't count), then a second aggregation over the first. Two
    // shuffles, both on keys that scale with data — no windows.
    Q("q13_order_distribution", (s, dir) => {
      import s.implicits._
      val ord = t(s, dir, "orders")
        .filter($"o_orderpriority" =!= "1-URGENT")
        .select($"o_orderkey", $"o_custkey")
      t(s, dir, "customer").select($"c_custkey")
        .join(ord, $"c_custkey" === $"o_custkey", "left_outer")
        .groupBy($"c_custkey")
        .agg(count($"o_orderkey").as("c_count"))
        .groupBy($"c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy($"custdist".desc, $"c_count".desc)
    }, sql = Some("""
      SELECT c_count, COUNT(*) AS custdist
      FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer
        LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey) t
      GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """)),

    // Q17 shape: per-group average as a join threshold — lineitems of one
    // brand's parts below 20% of their part's average quantity. The
    // per-part averages come from ONE pre-aggregation of the same
    // filtered join (exact decimal sum / count → one IEEE division, so
    // the 0.2·avg boundary is the same double in both engines), re-joined
    // by partkey; never a correlated per-row subquery.
    Q("q17_small_qty_revenue", (s, dir) => {
      import s.implicits._
      val brandLi = t(s, dir, "lineitem")
        .join(t(s, dir, "part").filter($"p_brand" === "Brand#2")
          .select($"p_partkey"), $"l_partkey" === $"p_partkey")
        .select($"l_partkey", $"l_quantity", $"l_extendedprice")
      val avgQ = brandLi.groupBy($"l_partkey")
        .agg((sum($"l_quantity".cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double") / count(lit(1))).as("avg_qty"))
        .select($"l_partkey".as("t_partkey"), (lit(0.2) * $"avg_qty").as("thresh"))
      brandLi.join(avgQ, $"l_partkey" === $"t_partkey")
        .filter($"l_quantity" < $"thresh")
        .agg((dsum($"l_extendedprice") / 7.0).as("avg_yearly"),
          count(lit(1)).as("n_small_lines"))
    }, sql = Some("""
      WITH brand_li AS (
        SELECT l_partkey, l_quantity, l_extendedprice
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand = 'Brand#2'),
      avg_q AS (
        SELECT l_partkey,
               0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)) AS thresh
        FROM brand_li GROUP BY l_partkey)
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
             COUNT(*) AS n_small_lines
      FROM brand_li JOIN avg_q USING (l_partkey)
      WHERE l_quantity < thresh
    """)),

    // Q18 shape: HAVING over a pre-aggregated subquery, then join the
    // qualifying keys back to the dimensions. The heavy agg runs FIRST
    // and only survivors join — never the reverse order.
    Q("q18_big_orders", (s, dir) => {
      import s.implicits._
      val big = t(s, dir, "lineitem")
        .groupBy($"l_orderkey")
        .agg(dsum($"l_quantity").as("sum_qty"))
        .filter($"sum_qty" > 300)
      t(s, dir, "orders").select($"o_orderkey", $"o_custkey", $"o_totalprice")
        .join(big, $"o_orderkey" === $"l_orderkey")
        .join(t(s, dir, "customer").select($"c_custkey"),
          $"o_custkey" === $"c_custkey")
        .select($"c_custkey", $"o_orderkey", $"o_totalprice", $"sum_qty")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
        .limit(20)
    }, sql = Some("""
      SELECT c_custkey, o_orderkey, o_totalprice, sum_qty
      FROM orders
      JOIN (SELECT l_orderkey,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 300) big
        ON o_orderkey = big.l_orderkey
      JOIN customer ON o_custkey = c_custkey
      ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20
    """)),

    // Q2 shape: correlated-MIN subquery — for each part, the minimum
    // observed supply price, then only (part, supplier) offers AT that
    // minimum survive, decorated with supplier/nation details. There is
    // no partsupp table in this schema, so the "catalog" is derived
    // deterministically: min l_extendedprice per (l_partkey, l_suppkey)
    // (reference Q2 semantics over the data we have). The correlated
    // subquery decorrelates into a min() WINDOW over p_partkey on the
    // SAME offers pass — one lineitem scan total (the agg+join-back form
    // scanned the fact twice), never a per-row probe; the window key is
    // the part key (cardinality grows with data, no hot stratum), and
    // min() is exact over doubles so the equality filter is engine-stable.
    Q("q2_min_cost_supplier", (s, dir) => {
      import s.implicits._
      val regionNat = broadcast(
        t(s, dir, "nation")
          .join(broadcast(t(s, dir, "region").filter($"r_name" === "EUROPE")),
            $"n_regionkey" === $"r_regionkey")
          .select($"n_nationkey", $"n_name"))
      val sup = t(s, dir, "supplier")
        .join(regionNat, $"s_nationkey" === $"n_nationkey")
        .select($"s_suppkey", $"s_name", $"s_acctbal", $"n_name")
      val parts = t(s, dir, "part")
        .filter($"p_size" <= 15 && $"p_type" === "LARGE")
        .select($"p_partkey", $"p_brand")
      val offers = t(s, dir, "lineitem")
        .groupBy($"l_partkey", $"l_suppkey")
        .agg(min($"l_extendedprice").as("ps_cost"))
        .join(parts, $"l_partkey" === $"p_partkey")
        .join(sup, $"l_suppkey" === $"s_suppkey")
      val wMin = org.apache.spark.sql.expressions.Window.partitionBy($"p_partkey")
      offers
        .withColumn("min_cost", min($"ps_cost").over(wMin))
        .filter($"ps_cost" === $"min_cost")
        .select($"s_acctbal", $"s_name", $"n_name", $"p_partkey", $"p_brand",
          $"ps_cost")
        .orderBy($"s_acctbal".desc, $"n_name", $"s_name", $"p_partkey")
        .limit(100)
    }, sql = Some("""
      WITH offers AS (
        SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS ps_cost
        FROM lineitem GROUP BY 1, 2),
      eu AS (
        SELECT s_suppkey, s_name, s_acctbal, n_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'),
      cand AS (
        SELECT p_partkey, p_brand, s_suppkey, s_name, s_acctbal, n_name, ps_cost
        FROM offers
        JOIN part ON l_partkey = p_partkey
        JOIN eu ON l_suppkey = s_suppkey
        WHERE p_size <= 15 AND p_type = 'LARGE')
      SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, ps_cost
      FROM cand c
      WHERE ps_cost = (SELECT MIN(ps_cost) FROM cand m
                       WHERE m.p_partkey = c.p_partkey)
      ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
    """)),

    // Q9 shape: product-line profit by (nation, year) — a name-substring
    // part filter prunes lineitem FIRST (the join to the filtered part
    // set is the selective edge; AQE broadcasts the ~10% part subset),
    // then supplier→nation attributes the revenue. No partsupp/supplycost
    // in this schema, so profit = discounted revenue (same group/join
    // topology as reference Q9).
    Q("q9_product_profit", (s, dir) => {
      import s.implicits._
      val redParts = t(s, dir, "part")
        .filter($"p_name".startsWith("red "))
        .select($"p_partkey")
      val supNat = t(s, dir, "supplier").select($"s_suppkey", $"s_nationkey")
        .join(broadcast(t(s, dir, "nation").select($"n_nationkey", $"n_name")),
          $"s_nationkey" === $"n_nationkey")
        .select($"s_suppkey", $"n_name")
      t(s, dir, "lineitem")
        .select($"l_partkey", $"l_suppkey", $"l_shipdate",
          $"l_extendedprice", $"l_discount")
        .join(redParts, $"l_partkey" === $"p_partkey")
        .join(supNat, $"l_suppkey" === $"s_suppkey")
        .groupBy($"n_name".as("nation"), year($"l_shipdate").as("o_year"))
        .agg(dsum($"l_extendedprice" * (lit(1) - $"l_discount"), 4).as("profit"))
        .orderBy($"nation", $"o_year".desc)
    }, sql = Some("""
      SELECT n_name AS nation, year(l_shipdate) AS o_year,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS profit
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE 'red %'
      GROUP BY 1, 2 ORDER BY nation, o_year DESC
    """)),

    // Q11 shape: per-group value with a HAVING threshold that is a
    // fraction of the GLOBAL total (scalar subquery). Both the per-part
    // values and the one-row total come from the SAME filtered join via
    // exact decimal sums — the total is NOT a re-sum of per-part doubles
    // (order-dependent) but an independent exact aggregate, so the
    // 0.001·total boundary is the same double in both engines. The total
    // broadcasts as one row; no second scan shuffle.
    Q("q11_important_value", (s, dir) => {
      import s.implicits._
      val natSup = t(s, dir, "supplier").select($"s_suppkey", $"s_nationkey")
        .join(broadcast(t(s, dir, "nation").filter($"n_name" === "NATION_1")),
          $"s_nationkey" === $"n_nationkey")
        .select($"s_suppkey")
      val joined = t(s, dir, "lineitem")
        .select($"l_partkey", $"l_suppkey", $"l_extendedprice")
        .join(natSup, $"l_suppkey" === $"s_suppkey")
      val perPart = joined.groupBy($"l_partkey")
        .agg(dsum($"l_extendedprice").as("part_value"))
      val total = joined.agg((dsum($"l_extendedprice") * 0.001).as("thresh"))
      perPart.crossJoin(broadcast(total))
        .filter($"part_value" > $"thresh")
        .select($"l_partkey", $"part_value")
        .orderBy($"part_value".desc, $"l_partkey")
    }, sql = Some("""
      WITH joined AS (
        SELECT l_partkey, l_extendedprice
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_1')
      SELECT l_partkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS part_value
      FROM joined
      GROUP BY l_partkey
      HAVING CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) >
             (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) * 0.001
              FROM joined)
      ORDER BY part_value DESC, l_partkey
    """)),

    // Q15 shape: argmax with ties — quarterly revenue per supplier, keep
    // the supplier(s) AT the maximum. rank()=1 over the per-supplier
    // aggregate keeps every tied max (max_by would drop ties) and plans
    // as WindowGroupLimit: each task forwards only its local rank-1 row
    // to the single-partition window, so the global step sees #partitions
    // rows — and the rev aggregate is computed ONCE (the scalar-subquery
    // formulation scanned the fact twice; AQE did not reuse the exchange
    // across the two branches). Revenue is an exact decimal sum, so the
    // tie comparison is engine-stable.
    Q("q15_top_supplier", (s, dir) => {
      import s.implicits._
      val rev = t(s, dir, "lineitem")
        .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
                $"l_shipdate" < lit("1997-04-01").cast("timestamp"))
        .groupBy($"l_suppkey")
        .agg(dsum($"l_extendedprice" * (lit(1) - $"l_discount"), 4)
          .as("total_revenue"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy($"total_revenue".desc)
      rev.withColumn("rk", rank().over(w)).filter($"rk" === 1).drop("rk")
        .join(t(s, dir, "supplier"), $"l_suppkey" === $"s_suppkey")
        .select($"s_suppkey", $"s_name", $"total_revenue")
        .orderBy($"s_suppkey")
    }, sql = Some("""
      WITH revenue AS (
        SELECT l_suppkey,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey)
      SELECT s_suppkey, s_name, total_revenue
      FROM revenue JOIN supplier ON l_suppkey = s_suppkey
      WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
      ORDER BY s_suppkey
    """)),

    // Q16 shape: distinct-supplier counts per part attribute triple, with
    // a NOT-IN exclusion subquery (suppliers with negative balances — the
    // "complaints" analog). The exclusion is a broadcast-able left_anti
    // on the supplier key; countDistinct shuffles once on the grouping
    // triple with the supplier key as the distinct column.
    Q("q16_supplier_cnt", (s, dir) => {
      import s.implicits._
      val parts = t(s, dir, "part")
        .filter($"p_brand" =!= "Brand#5" && $"p_type" =!= "PROMO" &&
                $"p_size".isin(1, 9, 15, 21, 28, 35, 42, 49))
        .select($"p_partkey", $"p_brand", $"p_type", $"p_size")
      val badSup = t(s, dir, "supplier").filter($"s_acctbal" < 0)
        .select($"s_suppkey")
      t(s, dir, "lineitem").select($"l_partkey", $"l_suppkey")
        .join(parts, $"l_partkey" === $"p_partkey")
        .join(badSup, $"l_suppkey" === $"s_suppkey", "left_anti")
        .groupBy($"p_brand", $"p_type", $"p_size")
        .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
        .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type", $"p_size")
    }, sql = Some("""
      SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
        AND p_size IN (1, 9, 15, 21, 28, 35, 42, 49)
        AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      GROUP BY 1, 2, 3
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """)),

    // Q20 shape: correlated half-of-total threshold + nested IN chains —
    // suppliers in one nation whose 1997 shipments of 'red '-named parts
    // exceed half of their all-years shipments of that part. BOTH sums
    // come from ONE conditional aggregation over the same scan (no
    // correlated re-probe); 0.5·total is a power-of-two multiple of an
    // exact decimal-sum double, so the comparison is engine-stable. The
    // qualifying (supplier, part) set then semi-joins the supplier dim.
    Q("q20_half_shipped", (s, dir) => {
      import s.implicits._
      val redParts = t(s, dir, "part")
        .filter($"p_name".startsWith("red "))
        .select($"p_partkey")
      val qty = t(s, dir, "lineitem")
        .select($"l_partkey", $"l_suppkey", $"l_quantity", $"l_shipdate")
        .join(redParts, $"l_partkey" === $"p_partkey")
        .groupBy($"l_suppkey", $"l_partkey")
        .agg(
          dsum(when(year($"l_shipdate") === 1997, $"l_quantity").otherwise(0))
            .as("qty_1997"),
          dsum($"l_quantity").as("qty_all"))
        .filter($"qty_1997" > $"qty_all" * 0.5)
        .select($"l_suppkey").distinct()
      t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation").filter($"n_name" === "NATION_2")),
          $"s_nationkey" === $"n_nationkey")
        .join(qty, $"s_suppkey" === $"l_suppkey", "left_semi")
        .select($"s_suppkey", $"s_name")
        .orderBy($"s_suppkey")
    }, sql = Some("""
      WITH qual AS (
        SELECT l_suppkey
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE 'red %'
        GROUP BY l_suppkey, l_partkey
        HAVING CAST(SUM(CAST(CASE WHEN year(l_shipdate) = 1997 THEN l_quantity
                                  ELSE 0 END AS DECIMAL(18,2))) AS DOUBLE) >
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) * 0.5)
      SELECT s_suppkey, s_name
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_2'
        AND s_suppkey IN (SELECT l_suppkey FROM qual)
      ORDER BY s_suppkey
    """)),

    // Q6 shape: the pure filtered scan-aggregate (forecast revenue
    // change) — no join at all; the whole query is predicate pushdown +
    // one map-side-combinable sum. DataFrame twin of the SQL-surface
    // `sql_q6_revenue` (Relational.scala), with the decimal-sum pattern
    // made explicit. The discount band is compared against
    // exactly-representable doubles (0.05/0.07 have no decimal dust at
    // the stored values' precision) and the revenue product runs through
    // the fixed-point decimal sum, so the single output row hashes
    // identically. At 100 TB this is the scan-floor query: its cost IS
    // the pruned column I/O (three columns reach the scan, ReadSchema-
    // pinned by the F1 projection discipline).
    Q("q6_forecast_revenue", (s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
                $"l_shipdate" < lit("1998-01-01").cast("timestamp") &&
                $"l_discount" >= 0.05 && $"l_discount" <= 0.07 &&
                $"l_quantity" < 24)
        .agg(dsum($"l_extendedprice" * $"l_discount", 4).as("revenue"))
    }, sql = Some("""
      SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4)))
                  AS DOUBLE) AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
        AND l_discount >= 0.05 AND l_discount <= 0.07
        AND l_quantity < 24
    """)),

    // Q21 shape: suppliers who kept orders waiting — the hardest TPC-H
    // correlation pattern: one EXISTS and one NOT EXISTS, both
    // correlated to the SAME fact table the outer row comes from.
    // Complement of `sql_q21_sole_supplier` (Relational.scala), which
    // runs the correlation as ONE SQL text through Catalyst's
    // decorrelation; this is the DataFrame-API form where the plan
    // discipline is EXPLICIT — dimension prune first, then semi/anti.
    // Adapted to this schema's columns the way q4 adapts: "late" is a
    // returned line (l_returnflag = 'R'; no commit/receipt dates in the
    // testdata contract). A supplier "kept order o waiting" if their
    // line in finalized order o is late, o has lines from ANOTHER
    // supplier (it was a multi-supplier order), and NO other supplier's
    // line in o is late — the blame is unshared. Plan shape: the EXISTS
    // compiles to LEFT SEMI and the NOT EXISTS to LEFT ANTI, both
    // equi-keyed on the order key with the inequality as the join
    // residual — no correlated re-execution, three shuffles total, and
    // the 25-row nation dim broadcasts under the supplier probe. The
    // count is over late LINES (canonical q21 semantics), tie-broken by
    // name for the LIMIT.
    Q("q21_waiting_supplier", (s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem").select($"l_orderkey", $"l_suppkey",
        $"l_returnflag")
      val late = li.filter($"l_returnflag" === "R")
        .select($"l_orderkey", $"l_suppkey")
      // prune FIRST: only the target nation's suppliers' late lines in
      // finalized orders enter the semi/anti correlation joins — at
      // 100 TB that is 1/|nations| of the late lines on the probe side
      // before the two expensive order-key joins run
      val natSupp = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation").filter($"n_name" === "NATION_7")),
          $"s_nationkey" === $"n_nationkey")
        .select($"s_suppkey", $"s_name")
      val l1 = late
        .join(t(s, dir, "orders").filter($"o_orderstatus" === "F")
          .select($"o_orderkey"), $"l_orderkey" === $"o_orderkey")
        .join(natSupp, $"l_suppkey" === $"s_suppkey")
        .select($"l_orderkey", $"l_suppkey", $"s_name")
      val others = li.select($"l_orderkey".as("o2_orderkey"),
        $"l_suppkey".as("o2_suppkey"))
      val lateOthers = late.select($"l_orderkey".as("o3_orderkey"),
        $"l_suppkey".as("o3_suppkey"))
      l1.join(others, $"l_orderkey" === $"o2_orderkey" &&
            $"l_suppkey" =!= $"o2_suppkey", "left_semi")
        .join(lateOthers, $"l_orderkey" === $"o3_orderkey" &&
            $"l_suppkey" =!= $"o3_suppkey", "left_anti")
        .groupBy($"s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy($"numwait".desc, $"s_name".asc)
        .limit(20)
    }, sql = Some("""
      SELECT s_name, COUNT(*) AS numwait
      FROM lineitem l1
      JOIN orders ON o_orderkey = l1.l_orderkey
      JOIN supplier ON s_suppkey = l1.l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      WHERE l1.l_returnflag = 'R'
        AND o_orderstatus = 'F'
        AND n_name = 'NATION_7'
        AND EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_returnflag = 'R')
      GROUP BY s_name
      ORDER BY numwait DESC, s_name ASC LIMIT 20
    """))
  )
}
