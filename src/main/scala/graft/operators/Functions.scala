package graft.operators

import graft.{Q, QModule}
import graft.Tables.t
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Function-level coverage beyond the X-inventory: array aggregation,
  * null-handling, date arithmetic, min_by/max_by, first/last window frames.
  * All built-ins, all oracled.
  */
object Functions extends QModule {

  def qs: Seq[Q] = Seq(
    // Array collect + sort + join (deterministic: sorted before joining).
    Q("fn_array_collect", (s, dir) => {
      import s.implicits._
      t(s, dir, "nation").join(t(s, dir, "region"),
          $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name")
        .agg(array_join(sort_array(collect_list($"n_name")), ",").as("nations"),
             count(lit(1)).as("n"))
        .orderBy($"r_name")
    }, sql = Some("""
      SELECT r_name,
             array_to_string(list_sort(list(n_name)), ',') AS nations,
             COUNT(*) AS n
      FROM nation JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name ORDER BY r_name
    """)),

    // Null-handling family: coalesce / nullif / null-aware counts.
    Q("fn_null_handling", (s, dir) => {
      import s.implicits._
      val masked = nullif($"o_orderstatus", lit("P")) // P → NULL
      t(s, dir, "orders")
        .select(masked.as("st"), $"o_totalprice")
        .agg(count(lit(1)).as("n_rows"),
             count($"st").as("n_nonnull"),
             sum(when($"st".isNull, 1).otherwise(0)).as("n_null"),
             max(coalesce($"st", lit("?"))).as("max_or_default"))
    }, sql = Some("""
      SELECT COUNT(*) AS n_rows,
             COUNT(nullif(o_orderstatus, 'P')) AS n_nonnull,
             CAST(SUM(CASE WHEN nullif(o_orderstatus, 'P') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
             MAX(COALESCE(nullif(o_orderstatus, 'P'), '?')) AS max_or_default
      FROM orders
    """)),

    // ANSI-safe arithmetic: Spark 4 runs ANSI mode by default, where
    // x/0 THROWS — try_divide is the null-on-error form a pipeline uses
    // for ratio columns over possibly-zero denominators. The oracle
    // expresses the same contract as x / nullif(y, 0). One IEEE divide
    // on exact counts, hash-comparable.
    Q("fn_try_arith", (s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem")
      li.groupBy($"l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum(when($"l_returnflag" === "R", 1L).otherwise(0L)).as("n_returned"))
        .select($"l_linestatus", $"n", $"n_returned",
          expr("try_divide(n_returned, n - n)").as("div_zero_is_null"),
          floor(expr("try_divide(n_returned * 1e6, n)")).cast("long")
            .as("return_rate_e6"))
        .orderBy($"l_linestatus")
    }, sql = Some("""
      SELECT l_linestatus, COUNT(*) AS n,
             CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned,
             CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
               / nullif(COUNT(*) - COUNT(*), 0) AS div_zero_is_null,
             CAST(floor(CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) * 1e6
               / COUNT(*)) AS BIGINT) AS return_rate_e6
      FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus
    """)),

    // Date arithmetic: add/sub, month boundaries, truncation.
    Q("fn_date_arith", (s, dir) => {
      import s.implicits._
      val d = $"o_orderdate".cast("date")
      t(s, dir, "orders")
        .select(
          date_add(d, 30).as("d30"),
          last_day(d).as("eom"),
          trunc(d, "month").as("som"))
        .agg(max($"d30").cast("string").as("max_d30"),
             countDistinct($"eom").as("n_eom"),
             countDistinct($"som").as("n_som"))
    }, sql = Some("""
      SELECT CAST(MAX(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY) AS DATE)::VARCHAR AS max_d30,
             COUNT(DISTINCT last_day(CAST(o_orderdate AS DATE))) AS n_eom,
             COUNT(DISTINCT date_trunc('month', CAST(o_orderdate AS DATE))) AS n_som
      FROM orders
    """)),

    // min_by/max_by keyed on a UNIQUE ordering column (deterministic).
    Q("fn_min_max_by", (s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .groupBy($"o_orderstatus")
        .agg(max_by($"o_totalprice", $"o_orderkey").as("price_of_last_key"),
             min_by($"o_totalprice", $"o_orderkey").as("price_of_first_key"))
        .orderBy($"o_orderstatus")
    }, sql = Some("""
      SELECT o_orderstatus,
             arg_max(o_totalprice, o_orderkey) AS price_of_last_key,
             arg_min(o_totalprice, o_orderkey) AS price_of_first_key
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """)),

    // Regex family: extract / replace / position over part type strings.
    Q("fn_regex", (s, dir) => {
      import s.implicits._
      t(s, dir, "part")
        .select(
          regexp_extract($"p_type", "^(\\w+)", 1).as("first_word"),
          length(regexp_replace($"p_type", "[aeiou]", "")).as("len_novowels"),
          instr($"p_type", " ").as("first_space"))
        .groupBy($"first_word")
        .agg(count(lit(1)).as("n"), sum($"len_novowels").as("sum_len"),
             min($"first_space").as("min_space"))
        .orderBy($"first_word")
    }, sql = Some("""
      SELECT regexp_extract(p_type, '^(\w+)', 1) AS first_word,
             COUNT(*) AS n,
             CAST(SUM(length(regexp_replace(p_type, '[aeiou]', '', 'g'))) AS BIGINT) AS sum_len,
             MIN(strpos(p_type, ' ')) AS min_space
      FROM part GROUP BY 1 ORDER BY first_word
    """)),

    // first/last_value with explicit frames over a total per-key order.
    Q("fn_first_last_window", (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "orders")
        .select($"o_custkey",
          first($"o_totalprice").over(w).as("first_price"),
          last($"o_totalprice").over(w).as("last_price"))
        .distinct()
        .orderBy($"o_custkey")
    }, sql = Some("""
      SELECT DISTINCT o_custkey,
             first_value(o_totalprice) OVER w AS first_price,
             last_value(o_totalprice) OVER w AS last_price
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY o_custkey
    """)),

    // Higher-order array functions (filter / exists / zip_with+aggregate)
    // over the embedding vectors — all codegen'd lambda expressions, no
    // UDFs; the float fold is e6-quantized AFTER the sum (same contract
    // as m1's norm).
    Q("fn_higher_order", (s, dir) => {
      import s.implicits._
      t(s, dir, "embeddings").filter($"vec_id" < 5)
        .select($"vec_id",
          expr("size(filter(embedding, x -> x > 0))").as("n_pos"),
          expr("""CAST(floor(aggregate(
                    zip_with(embedding, embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                    CAST(0 AS DOUBLE), (acc, v) -> acc + v) * 1e6 + 0.5) AS BIGINT)""")
            .as("sum_sq_e6"),
          expr("exists(embedding, x -> x < -0.5)").as("has_lt_m05"))
        .orderBy($"vec_id")
    }, sql = Some("""
      SELECT vec_id,
             length(list_filter(embedding, x -> x > 0)) AS n_pos,
             CAST(floor(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) * 1e6 + 0.5) AS BIGINT)
               AS sum_sq_e6,
             length(list_filter(embedding, x -> x < -0.5)) > 0 AS has_lt_m05
      FROM embeddings WHERE vec_id < 5 ORDER BY vec_id
    """)),

    // Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    // match NULL — the semantics a plain equi-join silently drops. The
    // nullable key is derived (nullif), the dim side is its distinct
    // grouping; a regular join would lose the NULL stratum entirely.
    Q("j7_null_safe_join", (s, dir) => {
      import s.implicits._
      val o = t(s, dir, "orders")
        .select(expr("nullif(o_orderstatus, 'P')").as("k"), $"o_totalprice")
      val dim = o.groupBy($"k").agg(count(lit(1)).as("n_in_dim"))
        .withColumnRenamed("k", "dk")
      o.join(dim, $"k" <=> $"dk")
        .groupBy($"k".as("status_key"))
        .agg(count(lit(1)).as("n_rows"), max($"n_in_dim").as("n_in_dim"))
        .orderBy($"status_key".asc_nulls_first)
    }, sql = Some("""
      WITH o AS (SELECT nullif(o_orderstatus, 'P') AS k, o_totalprice FROM orders),
      dim AS (SELECT k, COUNT(*) AS n_in_dim FROM o GROUP BY k)
      SELECT o.k AS status_key, COUNT(*) AS n_rows, MAX(dim.n_in_dim) AS n_in_dim
      FROM o JOIN dim ON o.k IS NOT DISTINCT FROM dim.k
      GROUP BY o.k ORDER BY status_key ASC NULLS FIRST
    """)),

    // Pearson correlation + population covariance from EXACT integer sums
    // (the g13 pattern extended to two variables): a distributed
    // corr()/covar_pop() is not bit-stable across partitionings, but six
    // exact sums are, and the closed-form derivation is the same IEEE op
    // sequence in both engines.
    //
    // TWO exactness lessons, both caught by an sf0.1 oracle sweep (the
    // sf0.01 gate passed):
    // 1. QUANTIZE FACTORS, NOT PRODUCTS — each input snaps to its cent
    //    grid (floor(v·100+0.5), exact and engine-identical) so every
    //    product is an exact integer; casting the double PRODUCT to
    //    decimal diverged by 1 ulp on one row in 600k (the engines'
    //    double→decimal half-rounding disagrees).
    // 2. NO a·b − c·d IN DOUBLE — DuckDB's C++ compiles the textbook
    //    n·sxy − sx·sy into an FMA (one rounding); the JVM does two.
    //    The numerator and both variance terms are therefore computed
    //    EXACTLY in wide integers (Spark DECIMAL(38,0) arithmetic,
    //    DuckDB HUGEINT — max ~3.6e25 here, far inside both), and only
    //    then cast to double for sqrt/multiply/divide — each a single
    //    correctly-rounded IEEE op, identical everywhere.
    // corr is scale-invariant so the ×100 units cancel; covar rescales
    // by 10⁻⁴ in final divisions.
    Q("g15_corr", (s, dir) => {
      import s.implicits._
      val qx = floor($"l_quantity" * 100 + 0.5)
      val qy = floor($"l_extendedprice" * 100 + 0.5)
      val d38 = DecimalType(38, 0)
      t(s, dir, "lineitem")
        .agg(
          sum(qx.cast(d38)).as("sx"),
          sum(qy.cast(d38)).as("sy"),
          sum((qx * qy).cast(d38)).as("sxy"),
          sum((qx * qx).cast(d38)).as("sxx"),
          sum((qy * qy).cast(d38)).as("syy"),
          count(lit(1)).cast(d38).as("n"))
        .select(
          ($"n" * $"sxy" - $"sx" * $"sy").as("num"),
          ($"n" * $"sxx" - $"sx" * $"sx").as("varx"),
          ($"n" * $"syy" - $"sy" * $"sy").as("vary"),
          $"n".cast("double").as("nd"))
        .select(
          ($"num".cast("double") /
            (sqrt($"varx".cast("double")) * sqrt($"vary".cast("double"))))
            .as("corr_qty_price"),
          ($"num".cast("double") / $"nd" / $"nd" / 10000.0).as("covar_pop"))
    }, sql = Some("""
      WITH q AS (
        SELECT CAST(floor(l_quantity * 100 + 0.5) AS HUGEINT) AS qx,
               CAST(floor(l_extendedprice * 100 + 0.5) AS HUGEINT) AS qy
        FROM lineitem),
      s AS (
        SELECT SUM(qx) AS sx, SUM(qy) AS sy, SUM(qx * qy) AS sxy,
               SUM(qx * qx) AS sxx, SUM(qy * qy) AS syy,
               CAST(COUNT(*) AS HUGEINT) AS n
        FROM q),
      e AS (
        SELECT CAST(n * sxy - sx * sy AS DOUBLE) AS num,
               CAST(n * sxx - sx * sx AS DOUBLE) AS varx,
               CAST(n * syy - sy * sy AS DOUBLE) AS vary,
               CAST(n AS DOUBLE) AS nd
        FROM s)
      SELECT num / (sqrt(varx) * sqrt(vary)) AS corr_qty_price,
             num / nd / nd / 10000.0 AS covar_pop
      FROM e
    """))
  )
}
