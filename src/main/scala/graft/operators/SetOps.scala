package graft.operators

import graft.{Q, QModule}
import graft.Tables.t
import org.apache.spark.sql.functions._

/** Set operations, sorts, limits, top-k (SURVEY.md §2.8). The reference has
  * none of UNION/INTERSECT/EXCEPT (its anti-joins A1-A3 are the EXCEPT-like
  * pattern, covered in Joins); `ORDER BY ... LIMIT 1` probes are its only
  * sort+limit use (StagingController.java:43-48).
  *
  * Scale posture: top-k never global-sorts — Spark plans `orderBy.limit(k)`
  * as TakeOrderedAndProject (per-partition heap + driver merge of k rows).
  * INTERSECT/EXCEPT hash-partition both sides on the full row; fine for key
  * sets, but prefer semi/anti joins on narrow keys (as done here) at scale.
  */
object SetOps extends QModule {

  def qs: Seq[Q] = Seq(
    // UNION ALL of two filtered projections, re-aggregated.
    Q("set_union_all", (s, dir) => {
      import s.implicits._
      val o = t(s, dir, "orders")
      val hi = o.filter($"o_totalprice" > 300000.0)
        .select($"o_custkey", lit("high").as("bucket"))
      val lo = o.filter($"o_totalprice" < 10000.0)
        .select($"o_custkey", lit("low").as("bucket"))
      hi.unionByName(lo)
        .groupBy($"bucket").agg(count(lit(1)).as("n"),
          countDistinct($"o_custkey").as("n_customers"))
        .orderBy($"bucket")
    }, sql = Some("""
      SELECT bucket, COUNT(*) AS n, COUNT(DISTINCT o_custkey) AS n_customers
      FROM (
        SELECT o_custkey, 'high' AS bucket FROM orders WHERE o_totalprice > 300000.0
        UNION ALL
        SELECT o_custkey, 'low' AS bucket FROM orders WHERE o_totalprice < 10000.0) t
      GROUP BY bucket ORDER BY bucket
    """)),

    // INTERSECT: customers placing both F- and O-status orders.
    Q("set_intersect", (s, dir) => {
      import s.implicits._
      val o = t(s, dir, "orders")
      o.filter($"o_orderstatus" === "F").select($"o_custkey")
        .intersect(o.filter($"o_orderstatus" === "O").select($"o_custkey"))
        .agg(count(lit(1)).as("n"), min($"o_custkey").as("min_key"),
             max($"o_custkey").as("max_key"))
    }, sql = Some("""
      SELECT COUNT(*) AS n, MIN(o_custkey) AS min_key, MAX(o_custkey) AS max_key
      FROM (
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O') t
    """)),

    // EXCEPT: customers with F orders but no P orders.
    Q("set_except", (s, dir) => {
      import s.implicits._
      val o = t(s, dir, "orders")
      o.filter($"o_orderstatus" === "F").select($"o_custkey")
        .except(o.filter($"o_orderstatus" === "P").select($"o_custkey"))
        .agg(count(lit(1)).as("n"), min($"o_custkey").as("min_key"),
             max($"o_custkey").as("max_key"))
    }, sql = Some("""
      SELECT COUNT(*) AS n, MIN(o_custkey) AS min_key, MAX(o_custkey) AS max_key
      FROM (
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'P') t
    """)),

    // Bag-semantics set ops (INTERSECT ALL / EXCEPT ALL keep multiplicity).
    Q("set_intersect_all", (s, dir) => {
      import s.implicits._
      val o = t(s, dir, "orders")
      o.filter($"o_orderstatus" === "F").select($"o_custkey")
        .intersectAll(o.filter($"o_orderstatus" === "O").select($"o_custkey"))
        .groupBy($"o_custkey").agg(count(lit(1)).as("multiplicity"))
        .orderBy($"o_custkey")
    }, sql = Some("""
      SELECT o_custkey, COUNT(*) AS multiplicity FROM (
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        INTERSECT ALL
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O') t
      GROUP BY o_custkey ORDER BY o_custkey
    """)),

    // EXCEPT ALL: bag difference with multiplicity (the one set-op
    // variant the catalog lacked) — how many F-orders per customer
    // EXCEED their O-order count. Same execution shape as INTERSECT ALL:
    // one hash shuffle on the key with per-side counts.
    Q("set_except_all", (s, dir) => {
      import s.implicits._
      val o = t(s, dir, "orders")
      o.filter($"o_orderstatus" === "F").select($"o_custkey")
        .exceptAll(o.filter($"o_orderstatus" === "O").select($"o_custkey"))
        .groupBy($"o_custkey").agg(count(lit(1)).as("multiplicity"))
        .orderBy($"o_custkey")
    }, sql = Some("""
      SELECT o_custkey, COUNT(*) AS multiplicity FROM (
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        EXCEPT ALL
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O') t
      GROUP BY o_custkey ORDER BY o_custkey
    """)),

    // Top-k by measure (argmax family, MartRepository.java:14-27 writ large).
    Q("topk_orders", (s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
        .limit(10)
    }, sql = Some("""
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """)),

    // Multi-key sort with explicit direction mix (full determinism via the
    // trailing unique key), limited.
    Q("sort_multi_key", (s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .orderBy($"o_orderpriority".asc, $"o_orderdate".desc, $"o_orderkey".asc)
        .select($"o_orderpriority", $"o_orderdate".cast("date").cast("string").as("od"),
                $"o_orderkey")
        .limit(50)
    }, sql = Some("""
      SELECT o_orderpriority, CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS od, o_orderkey
      FROM orders
      ORDER BY o_orderpriority ASC, o_orderdate DESC, o_orderkey ASC LIMIT 50
    """))
  )
}
