package graft

import graft.pipeline.Lottery
import java.sql.Date

/** End-to-end golden test of the lottery warehouse (SURVEY §5.2 item 3):
  * crawler-format fixture CSVs (BOM, dd-MM-yyyy, malformed rows) → staging →
  * transform → dims → fact → mart → statistic, asserted against hand-computed
  * values.
  *
  * Fixture content (src/test/resources/lottery): three draw days
  * 2025-10-23 (Thu), 2025-10-25 (Sat), 2025-10-26 (Sun); Giải Bảy rows
  * 78,09,09,45 / 09,33 (+1-char "7" rejected, short row dropped, bad date
  * quarantined) / 78.
  */
class LotteryPipelineSpec extends SparkSpec {

  private lazy val dir = getClass.getResource("/lottery").getPath
  private lazy val wh = Lottery.run(spark, dir)

  private def d(s: String) = Date.valueOf(s)

  test("staging: BOM tolerated, header + short rows dropped") {
    // day1: 6 rows, day2: 5 (short row dropped by na.drop), day3: 1
    assert(wh.staging.count() === 12)
    // BOM must not corrupt the first column name/value
    assert(wh.staging.columns.head === "prize")
  }

  test("transform: filter + derivations + quarantine (F2,F4,F6,X1-X3,X7,X8)") {
    val got = rows(wh.transform.select("number_value", "full_date",
      "range_group", "is_weekend", "is_even"))
    val expected = Set(
      Seq(78, d("2025-10-23"), "70-79", 0, 1),
      Seq(9, d("2025-10-23"), "00-09", 0, 0), // appears twice, Set collapses
      Seq(45, d("2025-10-23"), "40-49", 0, 0),
      Seq(9, d("2025-10-25"), "00-09", 1, 0),
      Seq(33, d("2025-10-25"), "30-39", 1, 0),
      Seq(78, d("2025-10-26"), "70-79", 1, 1))
    assert(got === expected)
    assert(wh.transform.count() === 7) // dup 09 on day1 kept as two rows
  }

  test("dim_date: date_key, parts, Vietnamese day names (X4-X7)") {
    val got = rows(wh.dimDate)
    val expected = Set(
      Seq(20251023, d("2025-10-23"), 23, 10, 2025, "2025-10", "Thứ 5", 0),
      Seq(20251025, d("2025-10-25"), 25, 10, 2025, "2025-10", "Thứ 7", 1),
      Seq(20251026, d("2025-10-26"), 26, 10, 2025, "2025-10", "Chủ nhật", 1))
    assert(got === expected)
  }

  test("dim_number: normalization, parity, last_digit, last appearance, deterministic keys") {
    val got = orderedRows(wh.dimNumber.orderBy("number_key"))
    val expected = Seq(
      Seq(1, "9", 0, 9, d("2025-10-25")),
      Seq(2, "33", 0, 3, d("2025-10-25")),
      Seq(3, "45", 0, 5, d("2025-10-23")),
      Seq(4, "78", 1, 8, d("2025-10-26")))
    assert(got === expected)
  }

  test("fact_prize: grain, total_draws, probability, days_since_last (G1,J1,X11,W2,A3)") {
    val fp = wh.factPrize
    val keyed = fp.collect().map(r =>
      (r.getInt(0), r.getInt(1)) ->
        (r.getInt(2), r.getInt(3), r.getDecimal(4).doubleValue(),
         if (r.isNullAt(5)) None else Some(r.getInt(5)))).toMap
    // number_keys: 9→1, 33→2, 45→3, 78→4
    assert(keyed.size === 6) // day1 dedups 09 to one row
    assert(keyed((20251023, 4)) === ((1, 4, 0.25, None)))          // 78 first
    assert(keyed((20251023, 1)) === ((2, 4, 0.25, None)))          // 09 ×2
    assert(keyed((20251023, 3)) === ((1, 4, 0.25, None)))          // 45
    assert(keyed((20251025, 1)) === ((1, 2, 0.5, Some(2))))        // 09 gap 2
    assert(keyed((20251025, 2)) === ((1, 2, 0.5, None)))           // 33 first
    assert(keyed((20251026, 4)) === ((1, 1, 1.0, Some(3))))        // 78 gap 3
  }

  test("mart: occurrences, global denominator, probability, recency (G7)") {
    val got = wh.mart.collect().map(r =>
      r.getString(0) -> (r.getDecimal(1).intValue(), r.getInt(2),
        r.getDecimal(3).doubleValue(), r.getDate(4).toString, r.getInt(5))).toMap
    assert(got("9") === ((3, 3, 1.0, "2025-10-25", 1)))
    assert(got("33") === ((1, 3, 0.3333, "2025-10-25", 1)))
    assert(got("45") === ((1, 3, 0.3333, "2025-10-23", 3)))
    assert(got("78") === ((2, 3, 0.6667, "2025-10-26", 0)))
  }

  test("statistic: the four dashboard scalars with pinned tie-break (G4,G5)") {
    val r = wh.statistic.collect().head
    assert(r.getInt(0) === 3)                     // totalOccurrences = max draws
    assert(r.getString(1) === "9")                // mostNumber (3 occurrences)
    assert(r.getString(2) === "33")               // leastNumber tie 33/45 → lowest
    assert(r.getDate(3) === d("2025-10-26"))      // lastUpdate
  }

  test("pipeline is idempotent under re-load (A1-A3 contract)") {
    import graft.sources.Upsert
    val dd = wh.dimDate
    val once = Upsert.appendNew(dd, dd, Seq("date_key"))
    assert(once.count() === dd.count())
    val fact = wh.factPrize
    val factTwice = Upsert.appendNew(fact, fact, Seq("date_key", "number_key"))
    assert(factTwice.count() === fact.count())
  }
}
