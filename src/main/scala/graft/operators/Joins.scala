package graft.operators

import graft.{Q, QModule}
import graft.Tables.{dsum, t}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join inventory (SURVEY.md §2.4). The reference hand-rolls every join as a
  * HashMap/HashSet probe (J1 build ETLMain.java:329-339 probe :383-385; anti
  * joins A1-A3 ETLMain.java:235-255,291-327,348-356); here each is the
  * declarative Spark join so Catalyst picks broadcast-hash vs sort-merge.
  *
  * Scale posture (100 TB): only FIXED-cardinality dims (nation=25) carry an
  * explicit `broadcast()` hint — a 1000-executor cluster must never shuffle
  * the fact for a ≤MB dim, but supplier/customer grow with the dataset, so
  * their join strategy is left to AQE (broadcast when small, shuffle when
  * not). The
  * as-of and range joins are written in their *scalable* forms (union+window,
  * bucketed equi-join) instead of inequality joins, which Spark would execute
  * as broadcast-nested-loop at O(n·m).
  */
object Joins extends QModule {

  import org.apache.spark.sql.{Column, DataFrame}

  /** 30-min-gap user sessions as half-open microsecond intervals
    * [s_start, s_end) over (user_id, event_id, us) input — the e11
    * bounds convention (end = last event + gap). One shuffle on
    * user_id. */
  def sessionIntervalsUs(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    ev.withColumn("new_s", when(lag(col("us"), 1).over(w).isNull ||
        col("us") - lag(col("us"), 1).over(w) > 1800000000L, 1).otherwise(0))
      .withColumn("sid", sum(col("new_s")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("us")).as("s_start"),
           (max(col("us")) + 1800000000L).as("s_end"))
  }

  /** A 1h maintenance window every `cadence` micros across the event
    * span, [w_start, w_end) — the derived second interval set. */
  def maintenanceWindowsUs(ev: DataFrame, cadence: Long = 21600000000L,
                           len: Long = 3600000000L): DataFrame =
    ev.agg(min(col("us")).as("lo"), max(col("us")).as("hi"))
      .select(explode(expr(
        s"sequence(lo div $cadence * $cadence, hi, $cadence)")).as("w_start"))
      .withColumn("w_end", col("w_start") + len)

  /** Interval-overlap join, grid form (j11's algorithm): register each
    * interval in every `cell`-wide grid cell it touches, equi-join on
    * the cell, exact half-open residual filter, DISTINCT over pairs
    * sharing several cells. Shuffle-parallel in cells. */
  def intervalOverlapGrid(sessions: DataFrame, wins: DataFrame,
                          cell: Long = 21600000000L): DataFrame = {
    val sc = sessions.withColumn("cell", explode(expr(
      s"sequence(s_start div $cell, (s_end - 1) div $cell)")))
    val wc = wins.withColumn("cell", explode(expr(
      s"sequence(w_start div $cell, (w_end - 1) div $cell)")))
    sc.join(wc, Seq("cell"))
      .filter(col("s_start") < col("w_end") && col("w_start") < col("s_end"))
      .select(col("user_id"), col("s_start"), col("w_start"),
        (least(col("s_end"), col("w_end")) -
          greatest(col("s_start"), col("w_start"))).as("overlap_us"))
      .distinct()
  }

  /** The naive inequality-join baseline (plans as a nested-loop join —
    * ScaleBench's overlap mode measures what the grid form avoids). */
  def intervalOverlapNaive(sessions: DataFrame, wins: DataFrame): DataFrame =
    sessions.join(wins,
        col("s_start") < col("w_end") && col("w_start") < col("s_end"))
      .select(col("user_id"), col("s_start"), col("w_start"),
        (least(col("s_end"), col("w_end")) -
          greatest(col("s_start"), col("w_start"))).as("overlap_us"))

  /** Adaptive interval-overlap join, backed by the MEASURED crossover
    * (PERF.md §overlap): when either interval set's estimated size fits
    * the session's broadcast threshold, the inequality join is strictly
    * better — a shuffle-free codegen inner loop over the broadcast side
    * (0.22 vs 0.29 s at ×1, 9.9 vs 14.2 s even at ×64 locally). Beyond
    * the threshold the nested loop is structurally unavailable (the
    * build side cannot ship) and the grid form is the shape that scales.
    * Same result either way — the j11 oracle pins the grid arm, a spec
    * pins arm-equality and the dispatch. */
  def intervalOverlap(sessions: DataFrame, wins: DataFrame,
                      cell: Long = 21600000000L): DataFrame = {
    val raw = sessions.sparkSession.conf
      .get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    // "-1" disables broadcasting (and isn't a valid byte string)
    val thresh =
      try org.apache.spark.network.util.JavaUtils.byteStringAsBytes(raw)
      catch { case _: NumberFormatException => -1L }
    def fits(df: DataFrame): Boolean =
      thresh > 0 &&
        df.queryExecution.optimizedPlan.stats.sizeInBytes <= BigInt(thresh)
    if (fits(wins) || fits(sessions)) intervalOverlapNaive(sessions, wins)
    else intervalOverlapGrid(sessions, wins, cell)
  }

  def qs: Seq[Q] = Seq(
    // J1: surrogate-key lookup join, fact ⋈ small dims (broadcast-hash).
    // Reference shape: Map<number_value→number_key> probe per fact row.
    Q("j1_broadcast_dim_join", (s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem")
      val sup = t(s, dir, "supplier")
      val nat = t(s, dir, "nation")
      li.join(sup, $"l_suppkey" === $"s_suppkey")
        .join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
        .groupBy($"n_name")
        .agg(
          dsum($"l_extendedprice" * (lit(1) - $"l_discount"), 4).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy($"n_name")
    }, sql = Some("""
      SELECT n_name,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
             COUNT(*) AS n_items
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      GROUP BY n_name ORDER BY n_name
    """), headline = true),

    // Left-outer join preserving unmatched rows (absent in the reference;
    // part of the complete Dataset.join surface, SURVEY §2.4 last row).
    Q("j2_left_outer_join", (s, dir) => {
      import s.implicits._
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), $"c_custkey" === $"o_custkey", "left_outer")
        .groupBy($"c_custkey")
        .agg(count($"o_orderkey").as("n_orders"),
             dsum(coalesce($"o_totalprice", lit(0.0)), 2).as("spend"))
        .orderBy($"c_custkey")
    }, sql = Some("""
      SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
             CAST(SUM(CAST(COALESCE(o_totalprice, 0.0) AS DECIMAL(18,2))) AS DOUBLE) AS spend
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey ORDER BY c_custkey
    """)),

    // Left-semi join: EXISTS reduction (the reference's preloaded-HashSet
    // idempotence probes are semi-join shaped, ETLMain.java:348-356).
    Q("j3_semi_join", (s, dir) => {
      import s.implicits._
      val deepDisc = t(s, dir, "lineitem").filter($"l_discount" > 0.06)
      t(s, dir, "orders")
        .join(deepDisc, $"o_orderkey" === $"l_orderkey", "left_semi")
        .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("sum_price"))
    }, sql = Some("""
      SELECT COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM orders WHERE EXISTS (
        SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_discount > 0.06)
    """)),

    // A1-A3: left-anti join — the reference's "preload existing keys, skip
    // matches" dedupe/idempotence pattern (ETLMain.java:235-255,291-327).
    Q("a1_anti_join", (s, dir) => {
      import s.implicits._
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), $"c_custkey" === $"o_custkey", "left_anti")
        .agg(count(lit(1)).as("n_customers"),
             min($"c_custkey").as("min_key"), max($"c_custkey").as("max_key"))
    }, sql = Some("""
      SELECT COUNT(*) AS n_customers, MIN(c_custkey) AS min_key, MAX(c_custkey) AS max_key
      FROM customer WHERE NOT EXISTS (
        SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """)),

    // As-of join (extension; absent in reference): for each 'view' event,
    // the most recent 'purchase' at-or-before it by the same user.
    // Scalable form: union both sides tagged, one window pass with
    // last(ignoreNulls) — a single shuffle on user_id, no inequality join
    // (which would be a broadcast-nested-loop O(n·m) at 100 TB).
    // Tie-break: at equal ts, purchases sort before views and the larger
    // event_id wins (matches the oracle's arg_max on [ts, event_id]).
    Q("j4_asof_join", (s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events") // ts normalized to Long nanos (Tables.normalizeEventTs)
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"ts", lit(1).as("is_p"), $"event_id".as("p_event_id"))
      val views = ev.filter($"event_type" === "view")
        .select($"user_id", $"ts", lit(0).as("is_p"), $"event_id".as("p_event_id"))
      val w = Window.partitionBy($"user_id")
        .orderBy($"ts".asc, $"is_p".desc, $"p_event_id".asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      purchases.unionByName(views)
        .withColumn("matched_purchase",
          last(when($"is_p" === 1, $"p_event_id"), ignoreNulls = true).over(w))
        .filter($"is_p" === 0)
        .select($"p_event_id".as("view_event_id"), $"matched_purchase")
        .orderBy($"view_event_id")
    }, sql = Some("""
      SELECT v.event_id AS view_event_id,
             arg_max(p.event_id,
                     CAST(epoch_ns(p.ts) AS HUGEINT) * 1000000000000 + p.event_id)
               AS matched_purchase
      FROM events v
      LEFT JOIN events p ON p.user_id = v.user_id AND p.event_type = 'purchase'
                        AND p.ts <= v.ts
      WHERE v.event_type = 'view'
      GROUP BY v.event_id ORDER BY v.event_id
    """)),

    // J9: NEAREST as-of join — each view matches its closest purchase in
    // time, either direction, tie to the backward side (the j4 family's
    // missing variant; sensor/trade alignment wants nearest, not
    // last-before). Same single-shuffle union+window shape as j4 run in
    // both directions: one pass computes last-purchase-before and
    // first-purchase-after per view, then an integer-nanos distance
    // compare picks the side. Never an inequality join.
    Q("j9_asof_nearest", (s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events") // ts normalized to Long nanos (Tables.normalizeEventTs)
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"ts", lit(1).as("is_p"), $"event_id".as("p_event_id"))
      val views = ev.filter($"event_type" === "view")
        .select($"user_id", $"ts", lit(0).as("is_p"), $"event_id".as("p_event_id"))
      val wB = Window.partitionBy($"user_id")
        .orderBy($"ts".asc, $"is_p".desc, $"p_event_id".asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wF = Window.partitionBy($"user_id")
        .orderBy($"ts".asc, $"is_p".desc, $"p_event_id".asc)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val pStruct = when($"is_p" === 1, struct($"ts", $"p_event_id"))
      val pickB = col("b").isNotNull && (col("f").isNull ||
        ($"ts" - col("b.ts")) <= (col("f.ts") - $"ts"))
      purchases.unionByName(views)
        .withColumn("b", last(pStruct, ignoreNulls = true).over(wB))
        .withColumn("f", first(pStruct, ignoreNulls = true).over(wF))
        .filter($"is_p" === 0)
        .select($"p_event_id".as("view_event_id"),
          when(pickB, col("b.p_event_id")).otherwise(col("f.p_event_id"))
            .as("nearest_purchase"),
          when(pickB, lit("B")).when(col("f").isNotNull, lit("F"))
            .as("side"))
        .orderBy($"view_event_id")
    }, sql = Some("""
      WITH v AS (
        SELECT event_id, user_id, epoch_ns(ts) AS vts FROM events
        WHERE event_type = 'view'),
      b AS (
        SELECT v.event_id,
               arg_max(p.event_id,
                       CAST(epoch_ns(p.ts) AS HUGEINT) * 1000000000000 + p.event_id) AS b_id,
               MAX(epoch_ns(p.ts)) AS b_ts
        FROM v JOIN events p ON p.user_id = v.user_id
             AND p.event_type = 'purchase' AND epoch_ns(p.ts) <= v.vts
        GROUP BY v.event_id),
      f AS (
        SELECT v.event_id,
               arg_min(p.event_id,
                       CAST(epoch_ns(p.ts) AS HUGEINT) * 1000000000000 + p.event_id) AS f_id,
               MIN(epoch_ns(p.ts)) AS f_ts
        FROM v JOIN events p ON p.user_id = v.user_id
             AND p.event_type = 'purchase' AND epoch_ns(p.ts) > v.vts
        GROUP BY v.event_id)
      SELECT v.event_id AS view_event_id,
             CASE WHEN b_id IS NOT NULL
                   AND (f_id IS NULL OR (vts - b_ts) <= (f_ts - vts))
                  THEN b_id ELSE f_id END AS nearest_purchase,
             CASE WHEN b_id IS NOT NULL
                   AND (f_id IS NULL OR (vts - b_ts) <= (f_ts - vts))
                  THEN 'B' WHEN f_id IS NOT NULL THEN 'F' END AS side
      FROM v LEFT JOIN b USING (event_id) LEFT JOIN f USING (event_id)
      ORDER BY view_event_id
    """)),

    // Range join (extension): orders bucketed into uniform price bands.
    // Scalable form: uniform bands ⇒ band membership is a computed equi-key
    // (floor(price/width)); the general interval-join collapses to a
    // broadcast equi-join instead of a nested-loop range probe.
    Q("j5_range_join", (s, dir) => {
      import s.implicits._
      val bandW = 25000.0
      val bands = s.range(20).select(
        $"id".cast("int").as("band_id"),
        ($"id" * bandW).as("lo"),
        (($"id" + 1) * bandW).as("hi"))
      val bucketed = t(s, dir, "orders")
        .withColumn("band_id", floor($"o_totalprice" / bandW).cast("int"))
      bands.join(bucketed, Seq("band_id"), "left_outer")
        .groupBy($"lo")
        .agg(count($"o_orderkey").as("n_orders"),
             dsum(coalesce($"o_totalprice", lit(0.0))).as("band_value"))
        .orderBy($"lo")
    }, sql = Some("""
      WITH bands AS (
        -- lo must be DOUBLE to mirror Spark (DuckDB's g * 25000.0 is
        -- DECIMAL(25,1); exact here, but keep output types aligned)
        SELECT CAST(g * 25000.0 AS DOUBLE) AS lo,
               CAST((g + 1) * 25000.0 AS DOUBLE) AS hi
        FROM generate_series(0, 19) t(g))
      SELECT lo, COUNT(o_orderkey) AS n_orders,
             CAST(SUM(CAST(COALESCE(o_totalprice, 0.0) AS DECIMAL(18,2))) AS DOUBLE) AS band_value
      FROM bands LEFT JOIN orders ON o_totalprice >= lo AND o_totalprice < hi
      GROUP BY lo ORDER BY lo
    """)),

    // J8: fuzzy entity-resolution join — catalog records matched against
    // a dirtied variant (vowel-stripped names stand in for the typo'd /
    // normalized feed a real catalog merge sees). The scale discipline is
    // BLOCKING: an equi-join on a cheap canonical key (the same
    // vowel-stripped skeleton) brings only same-block pairs together, and
    // the expensive edit-distance verification runs per block — never an
    // all-pairs string comparison. One hash shuffle on the block key; a
    // skewed block would get the maxDf/maxBucket posting-list treatment
    // from the dedup tier.
    Q("j8_fuzzy_match", (s, dir) => {
      import s.implicits._
      val skeleton = (c: org.apache.spark.sql.Column) =>
        regexp_replace(lower(c), "[aeiou]", "")
      val clean = t(s, dir, "customer")
        .select($"c_custkey", $"c_name", skeleton($"c_name").as("blk"))
      val dirty = t(s, dir, "customer")
        .select($"c_custkey".as("d_key"), skeleton($"c_name").as("dirty_name"))
      clean.join(dirty, $"blk" === $"dirty_name")
        .withColumn("edit_dist", levenshtein(lower($"c_name"), $"dirty_name"))
        .filter($"edit_dist" <= 5)
        .agg(count(lit(1)).as("n_matched"),
          expr("count_if(c_custkey = d_key)").as("n_true_matches"),
          max($"edit_dist").as("max_dist"))
    }, sql = Some("""
      WITH clean AS (
        SELECT c_custkey, c_name,
               regexp_replace(lower(c_name), '[aeiou]', '', 'g') AS blk
        FROM customer),
      dirty AS (
        SELECT c_custkey AS d_key,
               regexp_replace(lower(c_name), '[aeiou]', '', 'g') AS dirty_name
        FROM customer)
      SELECT COUNT(*) AS n_matched,
             CAST(count_if(c_custkey = d_key) AS BIGINT) AS n_true_matches,
             MAX(levenshtein(lower(c_name), dirty_name)) AS max_dist
      FROM clean JOIN dirty ON blk = dirty_name
      WHERE levenshtein(lower(c_name), dirty_name) <= 5
    """)),

    // J10: bloom-pruned shuffle join (extension; see BloomPrune scaladoc
    // for the 100 TB rationale). The dim (selective customer slice) is
    // aggregated into a few-KB bloom filter; the fact (orders) is pruned
    // map-side BEFORE its exchange; the exact join then absorbs the false
    // positives, so the result — and hence the oracle — is identical to
    // the plain join. shuffle_hash hint models the at-scale shape where
    // the dim is too big to broadcast (else Catalyst would broadcast here
    // and the demo would be vacuous). BloomJoinSpec pins result identity
    // with the unpruned join, the no-false-negative invariant, the
    // pruning ratio, and filter-below-exchange plan placement.
    Q("j10_bloom_prune_join", (s, dir) => {
      import s.implicits._
      val dim = t(s, dir, "customer")
        .filter($"c_mktsegment" === "BUILDING" && $"c_acctbal" > 5000)
      val bloom = BloomPrune.bloomOf(dim, "c_custkey")
      val pruned = BloomPrune.prune(t(s, dir, "orders"), $"o_custkey", bloom)
      pruned.join(dim.hint("shuffle_hash"), $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
             dsum($"o_totalprice").as("sum_price"),
             countDistinct($"c_custkey").as("n_customers"))
        .orderBy($"c_mktsegment")
    }, sql = Some("""
      SELECT c_mktsegment, COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
             COUNT(DISTINCT c_custkey) AS n_customers
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 5000
      GROUP BY c_mktsegment ORDER BY c_mktsegment
    """)),

    // J11: interval-OVERLAP join — two interval SETS, find all
    // overlapping pairs (sessions × maintenance windows; the class j5's
    // point-in-band join doesn't cover). The scalable form is the grid
    // join: each interval registers in every 6h grid cell it touches
    // (sequence+explode — fan-out bounded by interval length / cell),
    // pairs meet on a cell EQUI-key, an exact half-open predicate
    // (s.start < w.end AND w.start < s.end) filters grid co-tenants that
    // don't truly overlap, and DISTINCT collapses pairs that share
    // several cells. Any overlapping pair shares the cell of any point
    // in its intersection, so the grid join loses nothing. Never an
    // inequality join: shuffle-parallel in the number of cells.
    // Intervals: user sessions (30-min-gap lag/gap reconstruction over
    // exact microseconds, the e11 bounds convention) × a derived 1h
    // maintenance window every 6h across the event span. The oracle
    // replays sessionization and joins by the explicit inequality.
    Q("j11_interval_overlap_join", (s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events") // ts normalized to Long nanos
        .select($"user_id", $"event_id", expr("ts div 1000").as("us"))
      intervalOverlapGrid(sessionIntervalsUs(ev), maintenanceWindowsUs(ev))
        .orderBy($"user_id", $"s_start", $"w_start")
    }, sql = Some("""
      WITH g AS (
        SELECT user_id, event_id, epoch_us(ts) AS us,
               CASE WHEN lag(ts) OVER w IS NULL THEN 1
                    WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w)
                         > CAST(1800 AS BIGINT) * 1000000 THEN 1
                    ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      s AS (
        SELECT user_id, us,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM g),
      sess AS (
        SELECT user_id, MIN(us) AS s_start,
               MAX(us) + CAST(1800 AS BIGINT) * 1000000 AS s_end
        FROM s GROUP BY user_id, sid),
      b AS (SELECT MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi FROM events),
      wins AS (
        SELECT CAST(x AS BIGINT) AS w_start,
               CAST(x + 3600000000 AS BIGINT) AS w_end
        FROM b, UNNEST(range(lo // 21600000000 * 21600000000, hi + 1,
                             21600000000)) t(x))
      SELECT user_id, s_start, w_start,
             LEAST(s_end, w_end) - GREATEST(s_start, w_start) AS overlap_us
      FROM sess JOIN wins ON s_start < w_end AND w_start < s_end
      ORDER BY user_id, s_start, w_start
    """)),

    // J12: hybrid skew join — hot keys (fact frequency >= 600; the
    // testdata's per-suppkey counts straddle that at every SF, so BOTH
    // branches carry rows) join map-side against a broadcast dim slice,
    // the skew-free remainder takes the ordinary shuffle join. Exact:
    // the branch split is a partition of the fact by key, so the union
    // equals the plain join the oracle runs — for any threshold.
    Q("j12_hybrid_skew_join", (s, dir) => {
      import s.implicits._
      Skew.hybridSkewJoin(t(s, dir, "lineitem"), t(s, dir, "supplier"),
          "l_suppkey", "s_suppkey", hotThreshold = 600L)
        .groupBy($"s_nationkey")
        .agg(
          dsum($"l_extendedprice" * (lit(1) - $"l_discount"), 4).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy($"s_nationkey")
    }, sql = Some("""
      SELECT s_nationkey,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
             COUNT(*) AS n_items
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY s_nationkey ORDER BY s_nationkey
    """)),

    // Cross join (small×small only — at scale a guarded operation).
    Q("j6_cross_join", (s, dir) => {
      import s.implicits._
      t(s, dir, "region").crossJoin(t(s, dir, "nation"))
        .select($"r_name", $"n_name")
        .orderBy($"r_name", $"n_name")
    }, sql = Some("""
      SELECT r_name, n_name FROM region CROSS JOIN nation
      ORDER BY r_name, n_name
    """))
  )
}
