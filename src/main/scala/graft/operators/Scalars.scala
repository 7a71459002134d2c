package graft.operators

import graft.{Q, QModule}
import graft.Tables.t
import org.apache.spark.sql.functions._

/** Scalar-function inventory (SURVEY.md §2.7, X1-X16) exercised over the
  * testdata tables. Every X-function is a composition of codegen'd
  * `org.apache.spark.sql.functions` built-ins — no UDFs anywhere, so each
  * stays inside whole-stage codegen (SURVEY §4.2).
  *
  * The Vietnamese-calendar variants (X6 day names) live in the lottery
  * pipeline module; here the testdata-facing equivalents are oracled.
  */
object Scalars extends QModule {

  def qs: Seq[Q] = Seq(
    // X4+X5+X7: date_key (yyyyMMdd int, ETLMain.java:210), calendar parts
    // (:261-264), is_weekend (:266) — aggregated per year-month.
    Q("x5_date_parts", (s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .select(
          date_format($"o_orderdate", "yyyyMMdd").cast("int").as("date_key"),
          date_format($"o_orderdate", "yyyy-MM").as("year_month"),
          when(dayofweek($"o_orderdate").isin(1, 7), 1).otherwise(0).as("is_weekend"))
        .groupBy($"year_month", $"is_weekend")
        .agg(count(lit(1)).as("n"), max($"date_key").as("max_date_key"))
        .orderBy($"year_month", $"is_weekend")
    }, sql = Some("""
      SELECT strftime(o_orderdate, '%Y-%m') AS year_month,
             CASE WHEN dayofweek(o_orderdate) IN (0, 6) THEN 1 ELSE 0 END AS is_weekend,
             COUNT(*) AS n,
             MAX(CAST(strftime(o_orderdate, '%Y%m%d') AS INT)) AS max_date_key
      FROM orders GROUP BY 1, 2 ORDER BY year_month, is_weekend
    """)),

    // X6 analog: day-name derivation via a when-chain (the reference's
    // Vietnamese switch, ETLMain.java:275-285 — English here so the DuckDB
    // oracle can replicate; the Viet chain itself is pipeline-tested).
    Q("x6_day_name", (s, dir) => {
      import s.implicits._
      val dayName = element_at(
        array(lit("Sunday"), lit("Monday"), lit("Tuesday"), lit("Wednesday"),
          lit("Thursday"), lit("Friday"), lit("Saturday")),
        dayofweek($"o_orderdate"))
      t(s, dir, "orders")
        .select(dayName.as("day_name"))
        .groupBy($"day_name").agg(count(lit(1)).as("n"))
        .orderBy($"day_name")
    }, sql = Some("""
      SELECT dayname(o_orderdate) AS day_name, COUNT(*) AS n
      FROM orders GROUP BY 1 ORDER BY day_name
    """)),

    // X1+X2: last-two-digits (LotteryTransform.java:130) and the decile
    // range_group "%02d-%02d" (:134-136), over orderkey.
    Q("x2_decile_bucket", (s, dir) => {
      import s.implicits._
      val twoDigit = pmod($"o_orderkey", lit(100)).cast("int")
      val lo = (floor(twoDigit / 10) * 10).cast("int")
      t(s, dir, "orders")
        .select(concat(
          lpad(lo.cast("string"), 2, "0"), lit("-"),
          lpad((lo + 9).cast("string"), 2, "0")).as("range_group"))
        .groupBy($"range_group").agg(count(lit(1)).as("n"))
        .orderBy($"range_group")
    }, sql = Some("""
      SELECT lpad(CAST(((o_orderkey % 100) // 10) * 10 AS VARCHAR), 2, '0')
             || '-' ||
             lpad(CAST(((o_orderkey % 100) // 10) * 10 + 9 AS VARCHAR), 2, '0')
               AS range_group,
             COUNT(*) AS n
      FROM orders GROUP BY 1 ORDER BY range_group
    """)),

    // X10+X9+X8: normalize leading-zero number strings via int round-trip
    // (ETLMain.java:432-442: "04"→"4", non-numeric unchanged), last_digit
    // (:314-316), is_even. Built from lpad'd custkeys to reproduce the
    // reference's leading-zero staging values (SURVEY §1.3).
    Q("x10_normalize_numstr", (s, dir) => {
      import s.implicits._
      val padded = lpad(pmod($"c_custkey", lit(100)).cast("string"), 3, "0")
      t(s, dir, "customer")
        .select(
          coalesce(padded.cast("int").cast("string"), trim(padded)).as("number_value"),
          coalesce(padded.cast("int") % 10, lit(0)).cast("int").as("last_digit"),
          when(padded.cast("int") % 2 === 0, 1).otherwise(0).as("is_even"))
        .groupBy($"number_value", $"last_digit", $"is_even")
        .agg(count(lit(1)).as("n"))
        .orderBy($"number_value")
    }, sql = Some("""
      WITH src AS (
        SELECT lpad(CAST(c_custkey % 100 AS VARCHAR), 3, '0') AS padded
        FROM customer)
      SELECT COALESCE(CAST(TRY_CAST(padded AS INT) AS VARCHAR), trim(padded)) AS number_value,
             CAST(COALESCE(TRY_CAST(padded AS INT) % 10, 0) AS INT) AS last_digit,
             CASE WHEN TRY_CAST(padded AS INT) % 2 = 0 THEN 1 ELSE 0 END AS is_even,
             COUNT(*) AS n
      FROM src GROUP BY 1, 2, 3 ORDER BY number_value
    """)),

    // X12+string fns: trim/upper/lower/substring/split over part names.
    Q("x12_string_fns", (s, dir) => {
      import s.implicits._
      t(s, dir, "part")
        .select(
          upper(substring(trim($"p_name"), 1, 1)).as("initial"),
          size(split($"p_name", " ")).as("n_words"))
        .groupBy($"initial")
        .agg(count(lit(1)).as("n"), sum($"n_words").as("total_words"))
        .orderBy($"initial")
    }, sql = Some("""
      SELECT upper(substr(trim(p_name), 1, 1)) AS initial, COUNT(*) AS n,
             CAST(SUM(length(string_split(p_name, ' '))) AS BIGINT) AS total_words
      FROM part GROUP BY 1 ORDER BY initial
    """)),

    // X3+X16: string→date parse round-trip in the reference's dd-MM-yyyy
    // wire format (LotteryCrawler.java:24,248; LotteryTransform.java:125)
    // and ISO timestamp formatting (:26,249).
    Q("x3_date_parse_roundtrip", (s, dir) => {
      import s.implicits._
      val asStr = date_format($"o_orderdate", "dd-MM-yyyy")
      t(s, dir, "orders")
        .select(to_date(asStr, "dd-MM-yyyy").as("parsed"),
                $"o_orderdate".cast("date").as("direct"))
        .agg(count(lit(1)).as("n_rows"),
             sum(when($"parsed" === $"direct", 1).otherwise(0)).as("n_roundtrip_ok"),
             max(date_format($"parsed", "yyyy-MM-dd'T'00:00:00'Z'")).as("max_iso"))
    }, sql = Some("""
      SELECT COUNT(*) AS n_rows,
             CAST(SUM(CASE WHEN strptime(strftime(o_orderdate, '%d-%m-%Y'), '%d-%m-%Y')::DATE
                           = o_orderdate::DATE THEN 1 ELSE 0 END) AS BIGINT) AS n_roundtrip_ok,
             MAX(strftime(strptime(strftime(o_orderdate, '%d-%m-%Y'), '%d-%m-%Y'),
                          '%Y-%m-%dT00:00:00Z')) AS max_iso
      FROM orders
    """)),

    // X13: string→map kv parse (transform_staging/Util.java:14-28's
    // "host: x, port: y" config format) via str_to_map.
    Q("x13_kv_parse", (s, dir) => {
      import s.implicits._
      val cfg = concat(lit("type:"), $"event_type", lit(",user:"), $"user_id")
      t(s, dir, "events")
        .select(element_at(str_to_map(cfg, lit(","), lit(":")), "type").as("parsed_type"))
        .groupBy($"parsed_type").agg(count(lit(1)).as("n"))
        .orderBy($"parsed_type")
    }, sql = Some("""
      SELECT map_extract(map_from_entries(
               list_transform(string_split('type:' || event_type || ',user:' || user_id, ','),
                 s -> struct_pack(k := string_split(s, ':')[1],
                                  v := string_split(s, ':')[2]))),
             'type')[1] AS parsed_type,
             COUNT(*) AS n
      FROM events GROUP BY 1 ORDER BY parsed_type
    """)),

    // X14: composite string key — the reference builds its fact key as
    // `dateKey + "_" + numberKey` (load_warehouse/.../ETLMain.java:354,387).
    // SURVEY §2.7's verdict stands: multi-column join keys are the native
    // Spark form (every join in this engine uses them), so the composite
    // string exists as a COMPATIBILITY COLUMN, not a join key. This query
    // proves the rendered key round-trips: built with concat_ws over the
    // same (date_key, number_value) pair the mart uses, aggregated to one
    // row per key — the grouped counts are identical to grouping by the
    // two columns (the injectivity that makes the reference's key valid).
    Q("x14_composite_key", (s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .select(date_format($"l_shipdate", "yyyyMMdd").as("date_key"),
          lpad(pmod($"l_partkey", lit(100)).cast("string"), 2, "0").as("number_value"))
        .withColumn("fact_key", concat_ws("_", $"date_key", $"number_value"))
        .groupBy($"fact_key").agg(count(lit(1)).as("n"))
        .orderBy($"fact_key")
    }, sql = Some("""
      SELECT strftime(CAST(l_shipdate AS DATE), '%Y%m%d') || '_' ||
             lpad(CAST(l_partkey % 100 AS VARCHAR), 2, '0') AS fact_key,
             COUNT(*) AS n
      FROM lineitem GROUP BY 1 ORDER BY fact_key
    """)),

    // X15: percent render — the frontend shows `(probability*100)
    // .toFixed(2)` (lottery_frontend/.../TableComponent.jsx:46). Rendered
    // engine-side as an exact integer path: scale to hundredths of a
    // percent with ONE IEEE divide + floor (the established exactness
    // pattern), then assemble the "NN.NN" string from integer div/mod —
    // no float formatting, so the string is hash-identical across
    // engines (toFixed's binary-rounding quirks are exactly why the
    // render is pinned to integers here).
    Q("x15_percent_render", (s, dir) => {
      import s.implicits._
      val grid = t(s, dir, "lineitem").select(
          lpad(pmod($"l_partkey", lit(100)).cast("string"), 2, "0").as("number_value"))
        .groupBy($"number_value").agg(count(lit(1)).as("occ"))
      val total = grid.agg(sum($"occ").as("total"))
      grid.crossJoin(broadcast(total))
        .withColumn("pct_e2",
          floor($"occ" * lit(10000.0) / $"total" + 0.5).cast("long"))
        .select($"number_value",
          concat(expr("CAST(pct_e2 div 100 AS STRING)"), lit("."),
            lpad(($"pct_e2" % 100).cast("string"), 2, "0")).as("percent"))
        .orderBy($"number_value")
    }, sql = Some("""
      WITH grid AS (
        SELECT lpad(CAST(l_partkey % 100 AS VARCHAR), 2, '0') AS number_value,
               COUNT(*) AS occ
        FROM lineitem GROUP BY 1),
      t AS (SELECT CAST(SUM(occ) AS BIGINT) AS total FROM grid)
      SELECT number_value,
             CAST(CAST(floor(occ * 10000.0 / total + 0.5) AS BIGINT) // 100 AS VARCHAR)
               || '.' ||
               lpad(CAST(CAST(floor(occ * 10000.0 / total + 0.5) AS BIGINT) % 100 AS VARCHAR), 2, '0')
               AS percent
      FROM grid CROSS JOIN t ORDER BY number_value
    """))
  )
}
