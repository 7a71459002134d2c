package graft.operators

import graft.{Q, QModule}
import graft.Tables.t
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Window / ordered-stateful inventory (SURVEY.md §2.6).
  *
  * The reference's only ordered-stateful logic is one date-sorted driver loop
  * (W1 sort ETLMain.java:358-359; W2 per-key gap-days :394-397,412; W3
  * running last-value :412,419-429; W4 presentation row number
  * TableComponent.jsx:21-26). Each becomes a declarative Window; rank /
  * ntile / frame specs are the free extensions the reference lacks.
  *
  * Scale posture: every window partitions by a real key (custkey / brand),
  * so state is distributed — one shuffle on the partition key, per-partition
  * sort, no driver-side loop. The single global-order window (w4) is
  * restricted to a top-k, which Spark executes as per-partition top-k +
  * final merge (TakeOrderedAndProject), not a global sort.
  */
object Windows extends QModule {

  import org.apache.spark.sql.DataFrame

  /** The distributed exact trailing-RANGE-frame (w10b's algorithm) over
    * any (o_orderkey, o_orderpriority, cents) input: per-(priority, band)
    * distinct-value running prefixes, an equi-join for the in-band term,
    * and an as-of merge into the single neighbor band a width-`W` frame
    * can reach. Output (o_orderkey, o_orderpriority, cents, band_orders,
    * band_cents), unordered — bit-identical to
    *   COUNT(*)/SUM(cents) OVER (PARTITION BY priority ORDER BY cents
    *                             RANGE BETWEEN W PRECEDING AND CURRENT ROW).
    * Exposed for ScaleBench's frame-mode curves; the oracled w10b query
    * adds only the presentation sort. Requires cents >= 0. */
  def bandedTrailingFrame(o0: DataFrame, W: Long): DataFrame =
    bandedTrailingFrameBy(o0, W, "cents", "cents")
      .withColumnRenamed("frame_count", "band_orders")
      .withColumnRenamed("frame_sum", "band_cents")

  /** The generalized core: trailing frame of reach `W` over ORDER column
    * `ordC` (integer; band width = W, so the frame spans at most the own
    * band plus one neighbor), summing VALUE column `valC` — w10b uses
    * ordC = valC = cents; w11b orders by epoch-micros and sums cents.
    * Output (o_orderkey, o_orderpriority, <ordC>, frame_count,
    * frame_sum), unordered. */
  def bandedTrailingFrameBy(o0: DataFrame, W: Long,
                            ordC: String, valC: String): DataFrame = {
    val o = o0.withColumn("band", expr(s"$ordC div $W"))
    val wb = Window.partitionBy(col("o_orderpriority"), col("band"))
      .orderBy(col(ordC))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = o.groupBy(col("o_orderpriority"), col("band"), col(ordC))
      .agg(count(lit(1)).as("c"), sum(col(valC)).as("sc"))
      .withColumn("cum_c", sum(col("c")).over(wb))
      .withColumn("cum_s", sum(col("sc")).over(wb))
    val tot2 = cum.groupBy(col("o_orderpriority"), col("band"))
      .agg(max(col("cum_c")).as("tot_c"), max(col("cum_s")).as("tot_s"))
      .withColumnRenamed("band", "lb")
    val inBand = o.join(
      cum.select(col("o_orderpriority"), col("band"), col(ordC),
        col("cum_c"), col("cum_s")),
      Seq("o_orderpriority", "band", ordC))
    val cumRows = cum.select(col("o_orderpriority"), col("band").as("lb"),
      col(ordC).as("v"), lit(0).as("is_probe"),
      lit(null).cast("long").as("o_orderkey"),
      col("cum_c").as("bc"), col("cum_s").as("bs"))
    val probeRows = o.select(col("o_orderpriority"),
      (col("band") - 1).as("lb"), (col(ordC) - W - 1).as("v"),
      lit(1).as("is_probe"), col("o_orderkey"),
      lit(null).cast("long").as("bc"), lit(null).cast("long").as("bs"))
    val wU = Window.partitionBy(col("o_orderpriority"), col("lb"))
      .orderBy(col("v"), col("is_probe"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val below = cumRows.unionByName(probeRows)
      .withColumn("below_c", last(col("bc"), ignoreNulls = true).over(wU))
      .withColumn("below_s", last(col("bs"), ignoreNulls = true).over(wU))
      .filter(col("is_probe") === 1)
      .select(col("o_orderkey"), col("o_orderpriority"), col("lb"),
        col("below_c"), col("below_s"))
    val neigh = below.join(broadcast(tot2), Seq("o_orderpriority", "lb"), "left")
      .select(col("o_orderkey"), col("o_orderpriority"),
        (coalesce(col("tot_c"), lit(0L)) - coalesce(col("below_c"), lit(0L))).as("n_c"),
        (coalesce(col("tot_s"), lit(0L)) - coalesce(col("below_s"), lit(0L))).as("n_s"))
    inBand.join(neigh, Seq("o_orderkey", "o_orderpriority"))
      .select(col("o_orderkey"), col("o_orderpriority"), col(ordC),
        (col("cum_c") + col("n_c")).as("frame_count"),
        (col("cum_s") + col("n_s")).as("frame_sum"))
  }

  /** w10's single-window form over the same input — the per-stratum
    * baseline ScaleBench's frame mode measures against. */
  def windowedTrailingFrame(o: DataFrame, W: Long): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("cents"))
      .rangeBetween(-W, 0L)
    o.withColumn("band_orders", count(lit(1)).over(w))
      .withColumn("band_cents", sum(col("cents")).over(w))
  }

  /** w8b's algorithm over any (c_mktsegment, c_custkey, c_acctbal)
    * input: the top-k rank family from mergeable per-(segment, value)
    * counts — windows only over the distinct-value table, pruned at
    * drk<=k, broadcast back; fact rows never windowed or shuffled.
    * Exposed for ScaleBench's rank-mode curves. */
  def rankFamilyFromCounts(c: DataFrame, k: Int = 3): DataFrame = {
    val wseg = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc)
    val ranked = c.groupBy(col("c_mktsegment"), col("c_acctbal"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(
        wseg.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum(col("c")).over(
        Window.partitionBy(col("c_mktsegment"))))
      .withColumn("rnk", col("cum") - col("c") + 1)
      .withColumn("drk", row_number().over(wseg).cast("long"))
      .filter(col("drk") <= k)
    c.select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"))
      .join(broadcast(ranked), Seq("c_mktsegment", "c_acctbal"))
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
        col("rnk"), col("drk"),
        // n == 1: percent_rank defines 0.0 where (rnk-1)/(n-1) is 0/0
        // (PropertySpec's random single-row segments caught this)
        when(col("n") === 1, lit(0.0))
          .otherwise((col("rnk") - 1).cast("double") /
            (col("n") - 1).cast("double")).as("prk"),
        (col("cum").cast("double") / col("n").cast("double")).as("cd"))
  }

  /** The single-window baseline for the same top-k rank family
    * (w8's shape, minus the tie-broken extras). */
  def windowedRankFamily(c: DataFrame, k: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc)
    c.select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
      rank().over(w).cast("long").as("rnk"),
      dense_rank().over(w).cast("long").as("drk"),
      percent_rank().over(w).as("prk"), cume_dist().over(w).as("cd"))
      .filter(col("drk") <= k)
  }

  def qs: Seq[Q] = Seq(
    // W2: per-key lag → gap-days since previous order (the reference's
    // days_since_last, canonicalized to full-history per SURVEY §7.2).
    Q("w2_lag_gap_days", (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      t(s, dir, "orders")
        .withColumn("prev_date", lag($"o_orderdate", 1).over(w))
        .select($"o_orderkey",
          datediff($"o_orderdate".cast("date"), $"prev_date".cast("date"))
            .cast("long").as("days_since_prev"))
        .orderBy($"o_orderkey")
    }, sql = Some("""
      SELECT o_orderkey,
             date_diff('day',
               CAST(lag(o_orderdate) OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey) AS DATE),
               CAST(o_orderdate AS DATE)) AS days_since_prev
      FROM orders ORDER BY o_orderkey
    """), headline = true),

    // W3: running total per key (explicit ROWS frame). Decimal accumulation
    // for cross-engine determinism, emitted as double.
    Q("w3_running_sum", (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .select($"o_orderkey",
          sum($"o_totalprice".cast(DecimalType(18, 2))).over(w)
            .cast("double").as("running_spend"))
        .orderBy($"o_orderkey")
    }, sql = Some("""
      SELECT o_orderkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS running_spend
      FROM orders ORDER BY o_orderkey
    """)),

    // W4: global sequence number, top-k only (presentation STT analog).
    Q("w4_row_number_topk", (s, dir) => {
      import s.implicits._
      val w = Window.orderBy($"c_acctbal".desc, $"c_custkey".asc)
      t(s, dir, "customer")
        .select(row_number().over(w).as("stt"), $"c_custkey", $"c_acctbal")
        .filter($"stt" <= 100)
        .orderBy($"stt")
    }, sql = Some("""
      SELECT row_number() OVER (ORDER BY c_acctbal DESC, c_custkey ASC) AS stt,
             c_custkey, c_acctbal
      FROM customer ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 100
    """)),

    // Rank within group: top-3 parts per brand by retail price.
    // rank() is a pure function of the peer ordering, so ties are
    // deterministic; output order pinned by (brand, rank, partkey).
    Q("w5_rank_per_group", (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"p_brand").orderBy($"p_retailprice".desc)
      t(s, dir, "part")
        .withColumn("rnk", rank().over(w))
        .filter($"rnk" <= 3)
        .select($"p_brand", $"rnk", $"p_partkey", $"p_retailprice")
        .orderBy($"p_brand", $"rnk", $"p_partkey")
    }, sql = Some("""
      SELECT p_brand, rnk, p_partkey, p_retailprice FROM (
        SELECT p_brand, p_partkey, p_retailprice,
               rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS rnk
        FROM part) t
      WHERE rnk <= 3 ORDER BY p_brand, rnk, p_partkey
    """)),

    // ntile quartiles over a total (tie-broken) ordering, then aggregated
    // — EXACT and DISTRIBUTED. ntile(k) needs every row's global position,
    // but a global position does not need a global sort: range-repartition
    // on the (unique) ordering key, number rows WITHIN each range
    // partition, then add per-partition offsets from a prefix sum of the
    // tiny partition-count table (one row per partition — the same
    // two-level prefix-sum shape as the corpus shard packer). Global rank
    // = partition offset + local row_number; the bucket is then closed-
    // form arithmetic on (rank, n): first n%k buckets take n/k+1 rows.
    // Replaces the former single-partition ntile window (and the w6b
    // percentile-boundary substitute it needed): every stage here is
    // shuffle-parallel — a range exchange, keyed per-partition sorts,
    // and a broadcast of the offsets. (Catalyst cannot prove the
    // derived pid column is aligned with the physical range partitions,
    // so the pid-keyed window plans one additional hash exchange; the
    // escape hatch at extreme scale is mapPartitionsWithIndex /
    // zipWithIndex, which fuses pid + local position into the range
    // pass — kept declarative here since every exchange is keyed and
    // parallel either way.) The offsets prefix sum is computed by a
    // one-row aggregate + transform (O(parts²) slice-sums — parts is the
    // shuffle parallelism, so trivial; a second prefix level handles
    // extreme partition counts), NOT a window, so no single-partition
    // Window node exists anywhere in the plan (PlanHygieneSpec pins
    // this). percentile_disc boundary-broadcast coverage lives on in
    // g17b/t_length_clamp.
    Q("w6_ntile_quartiles", (s, dir) => {
      import s.implicits._
      val ranged = t(s, dir, "customer")
        .select($"c_acctbal", $"c_custkey")
        .repartitionByRange($"c_acctbal".asc, $"c_custkey".asc)
        .withColumn("pid", spark_partition_id())
      val offsets = ranged.groupBy($"pid").agg(count(lit(1)).as("cnt"))
        .agg(sort_array(collect_list(struct($"pid", $"cnt"))).as("a"))
        .select(explode(expr(
          """transform(a, (x, i) -> struct(
               x.pid AS pid,
               aggregate(slice(a, 1, i), 0L, (acc, y) -> acc + y.cnt) AS off,
               aggregate(a, 0L, (acc, y) -> acc + y.cnt) AS n))""")).as("o"))
        .select($"o.pid".as("pid"), $"o.off".as("off"), $"o.n".as("n"))
      val wLocal = Window.partitionBy($"pid")
        .orderBy($"c_acctbal".asc, $"c_custkey".asc)
      ranged
        .withColumn("rn", row_number().over(wLocal))
        .join(broadcast(offsets), "pid")
        .withColumn("grank", $"off" + $"rn")
        .withColumn("quartile", expr(
          """CAST(CASE WHEN grank <= (n % 4) * (n div 4 + 1)
                       THEN (grank - 1) div (n div 4 + 1) + 1
                       ELSE (n % 4) + (grank - 1 - (n % 4) * (n div 4 + 1))
                            div (n div 4) + 1
                  END AS INT)"""))
        .groupBy($"quartile")
        .agg(count(lit(1)).as("n"),
             sum($"c_acctbal".cast(DecimalType(18, 2))).cast("double").as("sum_bal"))
        .orderBy($"quartile")
    }, sql = Some("""
      SELECT quartile, COUNT(*) AS n,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
      FROM (SELECT ntile(4) OVER (ORDER BY c_acctbal ASC, c_custkey ASC) AS quartile,
                   c_acctbal FROM customer) t
      GROUP BY quartile ORDER BY quartile
    """)),

    // Sliding frame: 7-row moving average of daily order counts.
    // avg over ≤2^53 integers is exact in double regardless of order.
    Q("w7_moving_avg", (s, dir) => {
      import s.implicits._
      val daily = t(s, dir, "orders")
        .groupBy($"o_orderdate".cast("date").as("d"))
        .agg(count(lit(1)).as("n"))
      val w = Window.orderBy($"d").rowsBetween(-6, Window.currentRow)
      daily
        .select($"d".cast("string").as("order_date"), $"n",
          avg($"n").over(w).as("ma7"))
        .orderBy($"order_date")
    }, sql = Some("""
      SELECT CAST(d AS VARCHAR) AS order_date, n,
             AVG(n) OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS ma7
      FROM (SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n
            FROM orders GROUP BY 1) t
      ORDER BY order_date
    """)),

    // W12: WEIGHTED moving average with integer weights 16/8/4/2/1 over
    // the 5 most recent PRESENT dates (the EWMA-style smoother,
    // half-life one step). The kernel is ROW-based — on a series with
    // calendar gaps, compose with the w9 gap-fill first to make rows ==
    // days; TPC-H order dates are dense, so here they coincide. The
    // weighted sum is pure integer lag arithmetic and the single IEEE
    // divide by the constant 31 keeps it hash-exact, where a pow()-based
    // exponential decay would drift between libms. Emitted only once 5
    // rows of history exist, so every row uses the full kernel.
    Q("w12_wma5", (s, dir) => {
      import s.implicits._
      val daily = t(s, dir, "orders")
        .groupBy($"o_orderdate".cast("date").as("d"))
        .agg(count(lit(1)).as("n"))
      val w = Window.orderBy($"d")
      daily
        .select($"d".cast("string").as("order_date"), $"n",
          (lag($"n", 4).over(w) * 1 + lag($"n", 3).over(w) * 2 +
           lag($"n", 2).over(w) * 4 + lag($"n", 1).over(w) * 8 +
           $"n" * 16).as("wsum"),
          row_number().over(w).as("rn"))
        .filter($"rn" >= 5)
        .select($"order_date", $"n",
          floor($"wsum" * lit(1e6) / 31).cast("long").as("wma_e6"))
        .orderBy($"order_date")
    }, sql = Some("""
      WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n
        FROM orders GROUP BY 1),
      lagged AS (
        SELECT d, n,
               lag(n, 4) OVER (ORDER BY d) * 1 + lag(n, 3) OVER (ORDER BY d) * 2 +
               lag(n, 2) OVER (ORDER BY d) * 4 + lag(n, 1) OVER (ORDER BY d) * 8 +
               n * 16 AS wsum,
               row_number() OVER (ORDER BY d) AS rn
        FROM daily)
      SELECT CAST(d AS VARCHAR) AS order_date, n,
             CAST(floor(wsum * 1e6 / 31) AS BIGINT) AS wma_e6
      FROM lagged WHERE rn >= 5 ORDER BY order_date
    """)),

    // W8: the remaining rank-function family — dense_rank, percent_rank,
    // cume_dist, nth_value — per-segment, top-3 by dense rank.
    // percent_rank/cume_dist are single IEEE divisions of exact integers,
    // so they hash-match across engines (no float-fold drift).
    // SCALE NOTE (same caveat class as w6): percent_rank/cume_dist are
    // functions of the FULL partition, so the drk<=3 limit cannot push
    // below the window (contrast w4/w5/r6, where WindowGroupLimit keeps
    // k rows per task) and each of the ~5 segments sorts in one task.
    // Fine for function coverage; the 100-TB form is SHIPPED as w8b below
    // (rank positions from mergeable per-segment counts).
    Q("w8_rank_family", (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"c_mktsegment")
        .orderBy($"c_acctbal".desc, $"c_custkey".asc)
      val wFull = w.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      t(s, dir, "customer")
        .select($"c_mktsegment", $"c_custkey", $"c_acctbal",
          dense_rank().over(w).as("drk"),
          percent_rank().over(w).as("prk"),
          cume_dist().over(w).as("cd"),
          nth_value($"c_acctbal", 2).over(wFull).as("second_bal"))
        .filter($"drk" <= 3)
        .orderBy($"c_mktsegment", $"drk", $"c_custkey")
    }, sql = Some("""
      SELECT c_mktsegment, c_custkey, c_acctbal, drk, prk, cd, second_bal FROM (
        SELECT c_mktsegment, c_custkey, c_acctbal,
               dense_rank() OVER w AS drk,
               percent_rank() OVER w AS prk,
               cume_dist() OVER w AS cd,
               nth_value(c_acctbal, 2) OVER (PARTITION BY c_mktsegment
                 ORDER BY c_acctbal DESC, c_custkey ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_bal
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)) t
      WHERE drk <= 3 ORDER BY c_mktsegment, drk, c_custkey
    """)),

    // W8b: the SAME rank family with NO per-row window — the 100-TB form
    // of w8, retiring its scale note the way w6's two-pass ntile retired
    // w6b. rank / dense_rank / percent_rank / cume_dist over (PARTITION BY
    // segment ORDER BY value) are all functions of the per-(segment,value)
    // row COUNTS, which are mergeable: one map-side-combined hash agg
    // builds the distinct-value counts table, whose size is bounded by the
    // VALUE DOMAIN (≤1.1M distinct cents per segment for acctbal), not by
    // corpus rows — so the per-segment prefix window over it is safe at
    // any fact scale (and if the domain were unbounded, the w6 bucket-
    // offset trick applies at this level too). From the running count:
    //   rank       = cum - c + 1          (ties share the minimal position)
    //   dense_rank = position among distinct values
    //   percent_rank = (rank-1)/(n-1), cume_dist = cum/n  (exact-int IEEE
    //   divisions, hash-stable cross-engine)
    // The top-k limit prunes AT THE DISTINCT-VALUE LEVEL (drk<=3 keeps ≤3
    // rows per segment in the counts table) BEFORE touching fact rows —
    // the pushdown w8's full-partition functions structurally cannot do —
    // and the pruned table broadcasts, so fact rows are never shuffled or
    // sorted: one scan + one hash agg + a broadcast-hash join.
    Q("w8b_rank_from_counts", (s, dir) => {
      import s.implicits._
      rankFamilyFromCounts(t(s, dir, "customer")
        .select($"c_mktsegment", $"c_custkey", $"c_acctbal"))
        .orderBy($"c_mktsegment", $"c_acctbal".desc, $"c_custkey")
    }, sql = Some("""
      SELECT c_mktsegment, c_custkey, c_acctbal, rnk, drk, prk, cd FROM (
        SELECT c_mktsegment, c_custkey, c_acctbal,
               rank() OVER w AS rnk,
               dense_rank() OVER w AS drk,
               percent_rank() OVER w AS prk,
               cume_dist() OVER w AS cd
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC)) t
      WHERE drk <= 3 ORDER BY c_mktsegment, c_acctbal DESC, c_custkey
    """)),

    // W10: RANGE frame (value-based window, vs W7's ROWS frame): for each
    // order, the rolling sum of orders within the trailing $10k price band
    // of ITS OWN price, per priority class. Prices quantize to integer
    // cents first, so frame membership (a <= comparison on longs) and the
    // frame sum are exact in both engines — peers with equal cents get
    // identical frame results, making range semantics deterministic.
    // SCALE NOTE (w6 caveat class, also applies to w11): ~5 priority
    // strata each sort in one task. RANGE-frame semantics demo; the
    // 100-TB form is SHIPPED as w10b below (banded prefixes + as-of
    // merge, shuffle-parallel in the number of bands, identical result).
    Q("w10_range_frame", (s, dir) => {
      import s.implicits._
      val cents = floor($"o_totalprice" * 100 + 0.5).cast("long")
      val w = Window.partitionBy($"o_orderpriority").orderBy($"cents")
        .rangeBetween(-1000000L, 0L) // trailing $10k band, in cents
      t(s, dir, "orders")
        .select($"o_orderkey", $"o_orderpriority", cents.as("cents"))
        .withColumn("band_orders", count(lit(1)).over(w))
        .withColumn("band_cents", sum($"cents").over(w))
        .orderBy($"o_orderpriority", $"cents", $"o_orderkey")
    }, sql = Some("""
      SELECT o_orderkey, o_orderpriority, cents,
             COUNT(*) OVER w AS band_orders,
             CAST(SUM(cents) OVER w AS BIGINT) AS band_cents
      FROM (SELECT o_orderkey, o_orderpriority,
                   CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
            FROM orders) t
      WINDOW w AS (PARTITION BY o_orderpriority ORDER BY cents
                   RANGE BETWEEN 1000000 PRECEDING AND CURRENT ROW)
      ORDER BY o_orderpriority, cents, o_orderkey
    """)),

    // W10b: the SAME trailing-RANGE-frame result computed DISTRIBUTED —
    // the 100-TB form of w10, retiring its scale note the way w8b retired
    // w8's. Key fact: a trailing frame of width exactly W, banded by
    // band = cents div W, spans at most the probe's own band (prefix up
    // to its value) plus ONE neighbor band (suffix from the threshold) —
    // so the full-partition window decomposes into per-(priority, band)
    // pieces, shuffle-parallel in the number of bands:
    //   1. one hash agg builds per-(priority, band) DISTINCT-VALUE
    //      running prefixes (count + sum), windows keyed by (prio, band);
    //   2. in-band term: probes equi-join their own (prio, band, cents)
    //      prefix row — peers included, matching RANGE's <= semantics;
    //   3. neighbor term: tot(band-1) minus the strict-below prefix at
    //      threshold c-W, found by an AS-OF MERGE — union the neighbor
    //      band's prefix rows with probe lookups at v = c-W-1 (integer
    //      strictness), running last() per (prio, band). A probe whose
    //      threshold undercuts the neighbor band floor naturally reads
    //      NULL → 0 → whole neighbor band in frame (the c == band*W edge).
    // No pair materialization anywhere (the naive banded self-join is
    // O(sum of frame sizes) — quadratic in band density); this is
    // O(n log n) within bands with ~55 bands/priority at any corpus
    // size. Hash-identical to w10's single-window oracle.
    Q("w10b_band_frame", (s, dir) => {
      import s.implicits._
      val o = t(s, dir, "orders")
        .select($"o_orderkey", $"o_orderpriority",
          floor($"o_totalprice" * 100 + 0.5).cast("long").as("cents"))
      bandedTrailingFrame(o, 1000000L)
        .orderBy($"o_orderpriority", $"cents", $"o_orderkey")
    }, sql = Some("""
      SELECT o_orderkey, o_orderpriority, cents,
             COUNT(*) OVER w AS band_orders,
             CAST(SUM(cents) OVER w AS BIGINT) AS band_cents
      FROM (SELECT o_orderkey, o_orderpriority,
                   CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
            FROM orders) t
      WINDOW w AS (PARTITION BY o_orderpriority ORDER BY cents
                   RANGE BETWEEN 1000000 PRECEDING AND CURRENT ROW)
      ORDER BY o_orderpriority, cents, o_orderkey
    """)),

    // W11: TIME-based RANGE frame (trailing 7 days by VALUE of the order
    // timestamp — not a row count, not a numeric band): ONE SQL text
    // verbatim in both engines. Cents quantization keeps the frame sums
    // integer-exact; frame membership is a timestamp comparison, same in
    // both. Semantics demo (per-priority single-task window); the
    // 100-TB form is SHIPPED as w11b below against the same oracle text.
    Q("w11_time_range_frame", (s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql(timeRangeFrameSql)
    }, sql = Some(timeRangeFrameSql)),

    // W11b: the SAME trailing-7-day result computed DISTRIBUTED — w10b's
    // banded algorithm on the TIME axis, retiring w11's per-stratum
    // caveat with a shipped twin instead of a cross-reference. The order
    // column is exact epoch MICROS (7 days = exactly 604,800,000,000 µs
    // in epoch arithmetic — no DST, matching DuckDB's timestamp
    // INTERVAL math bit-for-bit), the aggregated value is cents, and
    // the band width equals the frame reach so a frame spans at most
    // the own band plus one neighbor. Same oracle TEXT as w11: the
    // single-window SQL is the ground truth for both forms.
    //
    // REQUIRES a UTC session: the micros derivation casts the (naive)
    // order timestamp through the session zone, so under a DST zone a
    // date pair straddling a transition would differ from 7*86400 s and
    // band membership could diverge from the oracle's INTERVAL frame at
    // the boundary — asserted loudly rather than assumed.
    Q("w11b_time_band_frame", (s, dir) => {
      import s.implicits._
      graft.Tables.requireUtc(s, "w11b derives its band key via " +
        "unix_micros(cast(o_orderdate as timestamp)) — naive wall-clock " +
        "to epoch micros is only DST-free under UTC")
      val o = t(s, dir, "orders").select($"o_orderkey", $"o_orderpriority",
        unix_micros($"o_orderdate".cast("timestamp")).as("tus"),
        floor($"o_totalprice" * 100 + 0.5).cast("long").as("cents"))
      bandedTrailingFrameBy(o, 604800000000L, "tus", "cents")
        .select($"o_orderkey", $"frame_sum".as("trail7d_cents"))
        .orderBy($"o_orderkey")
    }, sql = Some(timeRangeFrameSql)),

    // W9: gap-fill / resample — densify a sparse daily series onto a
    // calendar spine (Jan 1997 × priority class), zero-filling counts and
    // forward-filling the last observed max price (last_value IGNORE
    // NULLS). The canonical time-series-prep op before any ML windowing.
    // Scale shape: the DATE axis is generated (sequence+explode, never
    // read); the key axis is a distinct over one fact column here — at
    // 100 TB you'd read the key universe from its dimension table
    // instead. The spine broadcasts against ONE hash agg of the fact
    // side; the ffill window is PARTITIONED by key — no global sort.
    Q("w9_gap_fill", (s, dir) => {
      import s.implicits._
      val days = s.range(1).select(explode(expr(
        "sequence(to_date('1997-01-01'), to_date('1997-01-31'), interval 1 day)")).as("d"))
      val spine = t(s, dir, "orders").select($"o_orderpriority").distinct()
        .crossJoin(days)
      val daily = t(s, dir, "orders")
        .filter($"o_orderdate" >= "1997-01-01" && $"o_orderdate" < "1997-02-01")
        .groupBy($"o_orderpriority", to_date($"o_orderdate").as("d"))
        .agg(count(lit(1)).as("cnt"), max($"o_totalprice").as("mx"))
      val w = Window.partitionBy($"o_orderpriority").orderBy($"d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      broadcast(spine).join(daily, Seq("o_orderpriority", "d"), "left")
        .select($"o_orderpriority", $"d", coalesce($"cnt", lit(0L)).as("n_orders"),
          last($"mx", ignoreNulls = true).over(w).as("last_max_price"))
        .select($"o_orderpriority", $"d".cast("string").as("d"),
          $"n_orders", $"last_max_price")
        .orderBy($"o_orderpriority", $"d")
    }, sql = Some("""
      WITH spine AS (
        SELECT p.o_orderpriority, CAST(gs AS DATE) AS d
        FROM (SELECT DISTINCT o_orderpriority FROM orders) p
        CROSS JOIN UNNEST(generate_series(DATE '1997-01-01', DATE '1997-01-31',
                                          INTERVAL 1 DAY)) t(gs)),
      daily AS (
        SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS d,
               COUNT(*) AS cnt, MAX(o_totalprice) AS mx
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-02-01'
        GROUP BY 1, 2)
      SELECT o_orderpriority, CAST(d AS VARCHAR) AS d,
             CAST(COALESCE(cnt, 0) AS BIGINT) AS n_orders,
             last_value(mx IGNORE NULLS) OVER (PARTITION BY o_orderpriority ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_max_price
      FROM spine LEFT JOIN daily USING (o_orderpriority, d)
      ORDER BY o_orderpriority, d
    """))
  )

  /** Shared verbatim between Spark SQL and DuckDB (see w11). */
  private val timeRangeFrameSql = """
    SELECT o_orderkey,
           CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) OVER w AS BIGINT)
             AS trail7d_cents
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderdate
                 RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW)
    ORDER BY o_orderkey
  """
}
