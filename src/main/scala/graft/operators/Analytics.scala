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
    """), headline = true)
  )
}
