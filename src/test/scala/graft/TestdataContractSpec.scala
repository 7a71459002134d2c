package graft

import graft.Tables.t
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Content-contract canary: the invariants the oracles and streaming specs
  * silently lean on, asserted ONCE with the leaning site named — so a
  * testdata regen that violates one fails HERE with a diagnosis instead of
  * as a spurious hash mismatch (or worse, a green-but-vacuous assertion)
  * somewhere downstream. The schema-shape twin is SchemaCanarySpec; this
  * spec is about VALUES.
  *
  * Contracts and their dependents:
  *  - `events.ts >= 0`: DuckDB `//` floors while Spark `div`/Scala `/`
  *    truncate toward zero; they agree only for non-negative operands.
  *    Leaned on by every hour-key oracle (T29/T30, e15/e16, e21's
  *    sum_ts_sec) and by the micro-grid band keys.
  *  - `events.event_id` unique: T14's and T30's oracles GROUP BY the left
  *    event id and treat each group as one left row; j4's fixed oracle and
  *    e21's re-emit collapse assume one original row per id.
  *  - non-negative `event_id`/`user_id`: streaming specs use negative
  *    sentinels (user_id −1, event_id −99…) for watermark-flush rows and
  *    filter them out of compared output — real data at a negative id
  *    would be silently dropped from comparisons.
  *  - a LATE unmatched view / orphan click (inside the final watermark+gap
  *    horizon of the sf0.001 tape): the outer-join StreamingSpec arms
  *    assert `nulls/orphans AFTER flush > BEFORE flush`, which is vacuous
  *    unless at least one null-padded row is still pending in join state
  *    when the flush arrives.
  *  - all five event types present: the interval-join family and the type
  *    pivots produce degenerate (empty-side) plans without them.
  */
class TestdataContractSpec extends SparkSpec {

  private val sfDirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
    "/root/testdata/sf0.1").filter(d => new java.io.File(d).exists())

  private def events(d: String): DataFrame = t(spark, d, "events")

  test("events: non-negative ts and ids, unique event_id (every SF)") {
    assert(sfDirs.nonEmpty, "no testdata directories found")
    sfDirs.foreach { d =>
      val agg = events(d).agg(
        min(col("ts")).as("min_ts"),
        min(col("event_id")).as("min_eid"),
        min(col("user_id")).as("min_uid"),
        count(lit(1)).as("n"),
        countDistinct(col("event_id")).as("n_ids")).collect()(0)
      assert(agg.getAs[Long]("min_ts") >= 0L,
        s"$d: negative ts arrived — floor-div (DuckDB //) and trunc-div " +
          "(Spark div) hour keys diverge; every hour-key oracle breaks")
      assert(agg.getAs[Long]("min_eid") >= 0L && agg.getAs[Long]("min_uid") >= 0L,
        s"$d: negative id arrived — streaming specs' negative sentinel " +
          "filters would silently drop real rows from comparisons")
      assert(agg.getAs[Long]("n") === agg.getAs[Long]("n_ids"),
        s"$d: event_id no longer unique — T14/T30 GROUP BY left-id oracles " +
          "and e21's re-emit collapse assume one row per id")
    }
  }

  test("sf0.001 tape: all five event types present") {
    val types = events(sfDirs.head).select("event_type").distinct()
      .collect().map(_.getString(0)).toSet
    val want = Set("click", "error", "purchase", "signup", "view")
    assert(want.subsetOf(types),
      s"missing event types ${want -- types} — interval-join and type-pivot " +
        "fixtures degenerate to empty sides")
  }

  test("sf0.001 tape: a late unmatched view and a late orphan click exist") {
    // The outer-join StreamingSpec arms flush with watermark delay 2h and
    // join gap 30min; each side's event_type filter is pushed BELOW its
    // EventTimeWatermark node, so the pre-flush GLOBAL watermark is
    // min(max view ts, max click ts) − 2h. Pending-at-flush (→ the flush
    // assertions are non-vacuous) requires an unmatched view with
    // ts + 30min >= that watermark and an orphan click with ts >= it.
    val ev = events(sfDirs.head).select("event_id", "ts", "user_id", "event_type")
    val wmNs = 2L * 3600 * 1000000000L
    val gapNs = 30L * 60 * 1000000000L
    val views = ev.filter(col("event_type") === "view")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    val maxV = views.agg(max(col("ts"))).collect()(0).getLong(0)
    val maxC = clicks.agg(max(col("c_ts"))).collect()(0).getLong(0)
    val preFlushWm = math.min(maxV, maxC) - wmNs
    val unmatchedLateViews = views
      .join(clicks, col("user_id") === col("c_user") &&
        col("c_ts") >= col("ts") && col("c_ts") <= col("ts") + gapNs, "left_anti")
      .filter(col("ts") + gapNs >= preFlushWm)
      .count()
    assert(unmatchedLateViews > 0,
      "no unmatched view inside the final watermark+gap horizon — the " +
        "LEFT/FULL OUTER StreamingSpec flush assertions would be vacuous; " +
        "regen the tape or plant one")
    val viewsR = views.select(col("user_id").as("v_user"), col("ts").as("v_ts"))
    val lateOrphanClicks = ev.filter(col("event_type") === "click")
      .join(viewsR, col("user_id") === col("v_user") &&
        col("ts") >= col("v_ts") && col("ts") <= col("v_ts") + gapNs, "left_anti")
      .filter(col("ts") >= preFlushWm)
      .count()
    assert(lateOrphanClicks > 0,
      "no orphan click inside the final watermark horizon — the RIGHT/FULL " +
        "OUTER StreamingSpec flush assertions would be vacuous")
  }
}
