package graft.operators

import graft.{Q, QModule}
import graft.Tables.t
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
    """))
  )
}
