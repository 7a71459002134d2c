package graft.streaming

import graft.{Q, QModule}
import graft.Tables.{dsum, t}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming-capable event transforms (extension tier — the reference is a
  * once-daily batch, SURVEY §2.8 "Streaming: none"; its only temporal gate
  * is the 19:00 draw-time check, LotteryCrawler.java:106-110).
  *
  * Every transform here is expressed on a plain DataFrame so the SAME code
  * runs in batch (`spark.read` → oracled below) and in Structured Streaming
  * (`spark.readStream` → StreamingSpec with watermarks over MemoryStream).
  *
  * `events.ts` reaches the engine as Long nanos regardless of the file's
  * physical timestamp encoding — `Tables.t("events")` normalizes
  * TIMESTAMP(NANOS)-as-long, TIMESTAMP, and TIMESTAMP_NTZ arrivals to one
  * contract (see Tables.normalizeEventTs). Sessionization is done in
  * *integer nanos* — exact, engine-independent arithmetic; the timestamp
  * cast happens only for window bucketing where both engines truncate
  * identically.
  *
  * Scale posture: windowed counts shuffle once on (window, type) with
  * map-side partial aggregation; sessionization shuffles once on user_id.
  * In streaming mode the watermark bounds state; in batch mode the same
  * plan is a plain window/agg. Skewed users would get salted pre-agg —
  * not needed at these volumes.
  */
/** Typed event row (Dataset[T] surface; FIXTURES.md §B events schema with
  * ts as Long nanos — the Tables.normalizeEventTs contract). */
final case class Event(event_id: Long, ts: Long, user_id: Long,
                       event_type: String, value: Double, props: String)

/** Per-user running state for the custom-state operator. */
final case class UserAgg(n_events: Long, n_purchases: Long, last_ts: Long)

/** StatefulProcessor for [[EventStream.userProfileTws]]: two independent
  * state variables per user key — see the method scaladoc for why that is
  * the v2 API's scale win. Values fold in exact cents (the 2-decimal
  * testdata contract, same quantization as Tables.dsum) so replays are
  * bit-stable. */
private[streaming] object UserProfileFold {
  import org.apache.spark.sql.streaming.{MapState, ValueState}

  /** The shared per-batch fold over a user's events: bump the ValueState
    * counters and the MapState per-type counts, emit a refreshed row per
    * type touched. Values fold in exact cents (the 2-decimal testdata
    * contract, same quantization as Tables.dsum) so replays are
    * bit-stable. */
  def apply(key: Long, rows: Iterator[Event],
            totals: ValueState[(Long, Long)],
            perType: MapState[String, Long]): Iterator[(Long, String, Long, Long)] = {
    var (n, cents) = if (totals.exists()) totals.get() else (0L, 0L)
    val touched = scala.collection.mutable.LinkedHashSet[String]()
    rows.foreach { e =>
      n += 1
      cents += math.floor(e.value * 100 + 0.5).toLong
      val prev = if (perType.containsKey(e.event_type))
        perType.getValue(e.event_type) else 0L
      perType.updateValue(e.event_type, prev + 1)
      touched += e.event_type
    }
    totals.update((n, cents))
    touched.iterator.map(t => (key, t, perType.getValue(t), n))
  }
}

final class UserProfileProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, Event, (Long, String, Long, Long)] {
  import org.apache.spark.sql.{Encoders => E}
  import org.apache.spark.sql.streaming.{MapState, OutputMode, TimeMode,
    TimerValues, TTLConfig, ValueState}

  @transient private var totals: ValueState[(Long, Long)] = _
  @transient private var perType: MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    totals = getHandle.getValueState("totals",
      E.tuple(E.scalaLong, E.scalaLong), TTLConfig.NONE)
    perType = getHandle.getMapState("perType",
      E.STRING, E.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[Event],
      timerValues: TimerValues): Iterator[(Long, String, Long, Long)] =
    UserProfileFold(key, rows, totals, perType)
}

/** StatefulProcessor for [[EventStream.hourlyDistinctSketchTws]]: streaming
  * cardinality with a SKETCH-VALUED state variable — per hour bucket, the
  * ValueState holds the serialized theta sketch (graftshim's persistable
  * set-sketch tier inside the state store) and each micro-batch folds its
  * user_ids in and re-emits the refreshed estimate. This is the 100-TB
  * shape for streaming distinct-counts: raw per-key ID SETS in state grow
  * without bound (the thing `dropDuplicates` state does), a theta sketch
  * is ≤~32 KB per key at ANY cardinality, survives restarts as bytes, and
  * its estimate is EXACT below 4096 retained hashes — which is what makes
  * the batch oracle (`e15_distinct_sketch_tws`) an equality, not a bound.
  * Incremental fold across micro-batches == one-shot build (union
  * associativity; StreamingSpec pins it against the batch run). */
final class HourlyDistinctSketchProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, Event, (Long, Long)] {
  import org.apache.datasketches.memory.Memory
  import org.apache.datasketches.theta.SetOperation
  import org.apache.spark.sql.{Encoders => E}
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues,
    TTLConfig, ValueState}

  @transient private var sk: ValueState[Array[Byte]] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    sk = getHandle.getValueState("theta", E.BINARY, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[Event],
      timerValues: TimerValues): Iterator[(Long, Long)] = {
    val u = SetOperation.builder().buildUnion()
    if (sk.exists()) u.union(Memory.wrap(sk.get()))
    rows.foreach(e => u.update(e.user_id))
    val res = u.getResult
    sk.update(res.toByteArray)
    Iterator.single((key, math.round(res.getEstimate)))
  }
}

/** StatefulProcessor for the state-TTL spec: a per-user running event
  * count whose ValueState carries a PROCESSING-TIME TTL. The 100-TB
  * rationale: keyed state for keys that STOP ARRIVING (abandoned
  * sessions, dead devices, churned users) cannot be evicted by
  * watermarks when the query has no event-time close — without a bound
  * the store grows with the all-time key population. TTL bounds it by
  * recency of access instead: the state manager enforces expiry at read
  * (an expired value reads as absent) and the store's cleanup reclaims
  * the bytes, so a returning key restarts from zero — the semantics the
  * spec pins against the TTLConfig.NONE accumulate-forever arm.
  * `ttlMs <= 0` selects NONE, so both arms share one processor. */
final class TtlCountProcessor(ttlMs: Long)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, Event, (Long, Long)] {
  import org.apache.spark.sql.{Encoders => E}
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues,
    TTLConfig, ValueState}

  @transient private var n: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    val ttl = if (ttlMs > 0) TTLConfig(java.time.Duration.ofMillis(ttlMs))
              else TTLConfig.NONE
    n = getHandle.getValueState("n", E.scalaLong, ttl)
  }

  override def handleInputRows(key: Long, rows: Iterator[Event],
      timerValues: TimerValues): Iterator[(Long, Long)] = {
    val upd = (if (n.exists()) n.get() else 0L) + rows.size
    n.update(upd)
    Iterator.single((key, upd))
  }
}

/** The quantile twin of [[HourlyDistinctSketchProcessor]]: per hour bucket
  * the ValueState holds serialized KLL(k=200) bytes; each micro-batch
  * folds its event values in and re-emits (n, p50). Streaming percentiles
  * with BOUNDED state (~3 KB/key at any volume) — the per-window latency
  * p50/p99 query every streaming observability stack runs, impossible
  * with exact state at 100 TB (exact percentile state is the raw value
  * multiset). KLL's compaction is internally randomized, so the oracle
  * (`e16_quantile_sketch_tws`) pins the RANK-INTERVAL contract (g29's
  * pattern), not the sampled value; stream length n is exactly preserved
  * through state and asserted row-for-row. */
final class HourlyQuantileSketchProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, Event, (Long, Long, Double)] {
  import org.apache.datasketches.kll.KllDoublesSketch
  import org.apache.datasketches.memory.Memory
  import org.apache.spark.sql.{Encoders => E}
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues,
    TTLConfig, ValueState}

  @transient private var sk: ValueState[Array[Byte]] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    sk = getHandle.getValueState("kll", E.BINARY, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[Event],
      timerValues: TimerValues): Iterator[(Long, Long, Double)] = {
    val s = if (sk.exists()) KllDoublesSketch.heapify(Memory.wrap(sk.get()))
      else KllDoublesSketch.newHeapInstance(200)
    rows.foreach(e => s.update(e.value))
    sk.update(s.toByteArray)
    Iterator.single((key, s.getN, s.getQuantile(0.5)))
  }
}

/** Batch-computed profile row used to WARM-START the streaming state
  * ([[EventStream.userProfileFromBackfill]]). */
final case class UserProfileInit(user_id: Long, n_events: Long,
                                 value_cents: Long, per_type: Map[String, Long])

/** [[UserProfileProcessor]] with initial state: `handleInitialState` seeds
  * both state variables from a batch backfill row before the first
  * micro-batch touches the key — the restart-from-backfill pattern (a
  * daily batch job owns history; the streaming job starts TODAY without
  * replaying it). Only keys present in the stream OR the initial state
  * get state; the two fold identically afterwards. */
final class UserProfileBackfillProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessorWithInitialState[
      Long, Event, (Long, String, Long, Long), UserProfileInit] {
  import org.apache.spark.sql.{Encoders => E}
  import org.apache.spark.sql.streaming.{MapState, OutputMode, TimeMode,
    TimerValues, TTLConfig, ValueState}

  @transient private var totals: ValueState[(Long, Long)] = _
  @transient private var perType: MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    totals = getHandle.getValueState("totals",
      E.tuple(E.scalaLong, E.scalaLong), TTLConfig.NONE)
    perType = getHandle.getMapState("perType",
      E.STRING, E.scalaLong, TTLConfig.NONE)
  }

  override def handleInitialState(key: Long, initialState: UserProfileInit,
      timerValues: TimerValues): Unit = {
    totals.update((initialState.n_events, initialState.value_cents))
    initialState.per_type.foreach { case (t, c) => perType.updateValue(t, c) }
  }

  override def handleInputRows(key: Long, rows: Iterator[Event],
      timerValues: TimerValues): Iterator[(Long, String, Long, Long)] =
    UserProfileFold(key, rows, totals, perType)
}

/** StatefulProcessor for [[EventStream.sessionCloseTws]]: gap-based
  * sessions closed by EVENT-TIME TIMERS — the v2 capability
  * mapGroupsWithState's coarse GroupStateTimeout cannot express (one
  * timeout per key vs arbitrary re-registerable timers; here the timer is
  * re-armed to last_event + gap on every event, and `handleExpiredTimer`
  * emits the closed session when the WATERMARK passes it, not when a new
  * event happens to arrive). Sessions that demonstrably close inside a
  * batch (a later event for the same user beyond the gap) emit inline;
  * the final open session per user emits only via its timer — so state is
  * bounded by live-session count, evicted by watermark progress, never by
  * key-arrival luck. All arithmetic in long millis (exact). */
final class SessionCloseProcessor(gapMs: Long)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, Event, (Long, Long, Long, Long)] {
  import org.apache.spark.sql.{Encoders => E}
  import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
    TimeMode, TimerValues, TTLConfig, ValueState}

  // (session_start_ms, last_event_ms, n_events)
  @transient private var sess: ValueState[(Long, Long, Long)] = _
  @transient private var timerAt: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    sess = getHandle.getValueState("sess",
      E.tuple(E.scalaLong, E.scalaLong, E.scalaLong), TTLConfig.NONE)
    timerAt = getHandle.getValueState("timerAt", E.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[Event],
      timerValues: TimerValues): Iterator[(Long, Long, Long, Long)] = {
    // rows within a micro-batch arrive unordered; fold in event order
    val sorted = rows.toSeq.sortBy(e => (e.ts, e.event_id))
    val closed = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]()
    var st = if (sess.exists()) Option(sess.get()) else None
    sorted.foreach { e =>
      val ms = e.ts / 1000000L
      st match {
        case None => st = Some((ms, ms, 1L))
        case Some((s, l, n)) if ms - l > gapMs =>
          closed += ((key, s, l, n)); st = Some((ms, ms, 1L))
        case Some((s, l, n)) =>
          st = Some((s, math.max(l, ms), n + 1))
      }
    }
    st.foreach { case st2 @ (_, last, _) =>
      sess.update(st2)
      if (timerAt.exists()) getHandle.deleteTimer(timerAt.get())
      val at = last + gapMs
      getHandle.registerTimer(at)
      timerAt.update(at)
    }
    closed.iterator
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[(Long, Long, Long, Long)] =
    if (sess.exists()) {
      val (s, l, n) = sess.get()
      sess.clear(); timerAt.clear()
      Iterator.single((key, s, l, n))
    } else Iterator.empty
}

/** CDC apply-changes (latest-wins upsert view): ValueState = the newest
  * (ts, event_id, value) seen per key, ordered by (ts, event_id) — the
  * dense-unique event id breaks ts ties deterministically (testdata
  * contract canary). Emits ONLY when the key's latest actually advances
  * (CDC update suppression): an out-of-order or re-delivered row with a
  * stale (ts, event_id) is absorbed silently, which is exactly the
  * at-least-once upsert-feed contract (Debezium-style change streams).
  * State is O(1) per key; for key populations that churn, bound it with
  * the TTL discipline of [[TtlCountProcessor]]. */
final class LatestWinsProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, Event, (Long, Long, Long, Double)] {
  import org.apache.spark.sql.{Encoders => E}
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues,
    TTLConfig, ValueState}

  // (ts, event_id, value)
  @transient private var latest: ValueState[(Long, Long, Double)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    latest = getHandle.getValueState("latest",
      E.tuple(E.scalaLong, E.scalaLong, E.scalaDouble), TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[Event],
      timerValues: TimerValues): Iterator[(Long, Long, Long, Double)] = {
    val prev = if (latest.exists()) Option(latest.get()) else None
    val mx = rows.foldLeft(prev) { (acc, e) =>
      acc match {
        case Some((ts, id, _)) if ts > e.ts || (ts == e.ts && id > e.event_id) => acc
        case _ => Some((e.ts, e.event_id, e.value))
      }
    }
    (prev, mx) match {
      case (p, Some(m)) if !p.contains(m) =>
        latest.update(m)
        Iterator.single((key, m._1, m._2, m._3))
      case _ => Iterator.empty
    }
  }
}

object EventStream {

  /** ts (long nanos) → timestamp at microsecond precision. */
  def tsCol: Column = timestamp_micros(expr("ts div 1000"))

  /** Custom arbitrary state via mapGroupsWithState (the brief's
    * KeyValueGroupedDataset path): per-user running totals that survive
    * across micro-batches. Works identically over a batch Dataset (state
    * folds within the single "batch") and a stream (state persists in the
    * state store, bounded by the group key cardinality).
    *
    * Scale posture: state is per-key and O(1) per user; the state store
    * shuffles once on user_id. */
  def runningUserStats(ds: org.apache.spark.sql.Dataset[Event])
      : org.apache.spark.sql.Dataset[(Long, UserAgg)] = {
    import ds.sparkSession.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    ds.groupByKey(_.user_id)
      .mapGroupsWithState[UserAgg, (Long, UserAgg)](GroupStateTimeout.NoTimeout) {
        (uid, events, state) =>
          val prev = state.getOption.getOrElse(UserAgg(0L, 0L, Long.MinValue))
          val next = events.foldLeft(prev) { (acc, e) =>
            UserAgg(acc.n_events + 1,
              acc.n_purchases + (if (e.event_type == "purchase") 1 else 0),
              math.max(acc.last_ts, e.ts))
          }
          state.update(next)
          (uid, next)
      }
  }

  /** Per-user running profile on Spark 4's transformWithState — the
    * arbitrary-state v2 API that supersedes mapGroupsWithState. The
    * upgrade that matters at scale is INDEPENDENT state variables under
    * one key: `totals` (ValueState, O(1) running counters) and `perType`
    * (MapState, one entry per event type) evolve separately, where the
    * v1 API packs everything into one value the store rewrites wholesale
    * on every update — with RocksDB each variable is its own column
    * family, so the hot counter path no longer rewrites the cold map.
    * Emits one refreshed (user, type, n_type, n_total) row per type
    * touched in the batch (update semantics). Requires the RocksDB state
    * store provider (an API requirement, set by the streaming caller);
    * StreamingSpec replays two micro-batches against the batch oracle. */
  def userProfileTws(ds: org.apache.spark.sql.Dataset[Event])
      : org.apache.spark.sql.Dataset[(Long, String, Long, Long)] = {
    import ds.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    ds.groupByKey(_.user_id)
      .transformWithState(new UserProfileProcessor, TimeMode.None(),
        OutputMode.Update())
  }

  /** Per-user running event counts with TTL-bounded state
    * ([[TtlCountProcessor]] — the recency bound for stores whose keys
    * stop arriving; `ttlMs <= 0` = keep forever). TimeMode is
    * ProcessingTime: state TTL is a processing-time contract, enforced
    * by the state manager at read. */
  def runningCountsTtl(ds: org.apache.spark.sql.Dataset[Event],
                       ttlMs: Long): org.apache.spark.sql.Dataset[(Long, Long)] = {
    import ds.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    ds.groupByKey(_.user_id)
      .transformWithState(new TtlCountProcessor(ttlMs),
        TimeMode.ProcessingTime(), OutputMode.Update())
  }

  /** Streaming distinct-users-per-hour with sketch-valued state
    * ([[HourlyDistinctSketchProcessor]]): key = epoch-hour of the nanos
    * ts (exact integer div — no timezone, no cast), emission =
    * (hour_key, refreshed distinct estimate). One shuffle on the hour
    * key; state is one ≤~32 KB sketch per live hour regardless of user
    * cardinality. Runs identically over batch (oracled, e15) and a
    * watermarked stream (StreamingSpec). */
  def hourlyDistinctSketchTws(ds: org.apache.spark.sql.Dataset[Event])
      : org.apache.spark.sql.Dataset[(Long, Long)] = {
    import ds.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    ds.groupByKey(_.ts / 3600000000000L)
      .transformWithState(new HourlyDistinctSketchProcessor, TimeMode.None(),
        OutputMode.Update())
  }

  /** Streaming per-hour value p50 with KLL-sketch-valued state
    * ([[HourlyQuantileSketchProcessor]]); same key/shuffle shape as
    * [[hourlyDistinctSketchTws]]. Emits (hour_key, n, p50). */
  def hourlyQuantileSketchTws(ds: org.apache.spark.sql.Dataset[Event])
      : org.apache.spark.sql.Dataset[(Long, Long, Double)] = {
    import ds.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    ds.groupByKey(_.ts / 3600000000000L)
      .transformWithState(new HourlyQuantileSketchProcessor, TimeMode.None(),
        OutputMode.Update())
  }

  /** Streaming CDC apply-changes ([[LatestWinsProcessor]]): maintains the
    * latest-wins upsert view of an at-least-once change feed, keyed by
    * user. Emits (user_id, ts, event_id, value) whenever a key's latest
    * advances; stale/re-delivered rows are absorbed. One shuffle on the
    * key; runs identically over a batch Dataset (oracled, e25) and a
    * stream (StreamingSpec update-suppression differential). */
  def cdcLatestTws(ds: org.apache.spark.sql.Dataset[Event])
      : org.apache.spark.sql.Dataset[(Long, Long, Long, Double)] = {
    import ds.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    ds.groupByKey(_.user_id)
      .transformWithState(new LatestWinsProcessor, TimeMode.None(),
        OutputMode.Update())
  }

  /** [[userProfileTws]] warm-started from a batch backfill: `backfill` is
    * the profile table a daily batch job materialized over history; the
    * stream resumes from it instead of replaying history. Computes the
    * backfill itself from a batch Dataset via [[profileBackfill]]. */
  def userProfileFromBackfill(ds: org.apache.spark.sql.Dataset[Event],
      backfill: org.apache.spark.sql.Dataset[UserProfileInit])
      : org.apache.spark.sql.Dataset[(Long, String, Long, Long)] = {
    import ds.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    ds.groupByKey(_.user_id)
      .transformWithState(new UserProfileBackfillProcessor, TimeMode.None(),
        OutputMode.Update(), backfill.groupByKey(_.user_id))
  }

  /** The batch half of the warm-start: one hash agg over history produces
    * the initial-state table (persistable as parquet between the batch
    * and streaming jobs). */
  def profileBackfill(history: org.apache.spark.sql.Dataset[Event])
      : org.apache.spark.sql.Dataset[UserProfileInit] = {
    import history.sparkSession.implicits._
    history.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100 + 0.5).cast("long")).as("value_cents"))
      .join(history.groupBy(col("user_id"), col("event_type"))
          .agg(count(lit(1)).as("c"))
          .groupBy(col("user_id"))
          .agg(map_from_entries(collect_list(struct(col("event_type"), col("c"))))
            .as("per_type")),
        Seq("user_id"))
      .as[UserProfileInit]
  }

  /** Watermark-closed gap sessions on transformWithState event-time
    * timers ([[SessionCloseProcessor]]). `ds` must carry a watermark
    * (TimeMode.EventTime is rejected without one); emits
    * (user_id, session_start_ms, session_end_ms, n_events) as sessions
    * close. Scale posture: one shuffle on user_id; state = live sessions
    * only, each evicted the moment the watermark passes its gap — the
    * shape that holds at 100 TB/day where sessionize-then-groupBy over
    * history cannot. */
  def sessionCloseTws(ds: org.apache.spark.sql.Dataset[Event],
                      gapMs: Long = 30L * 60 * 1000)
      : org.apache.spark.sql.Dataset[(Long, Long, Long, Long)] = {
    import ds.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    ds.groupByKey(_.user_id)
      .transformWithState(new SessionCloseProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Update())
  }

  /** An existing `tss` column is used AS-IS: re-deriving it from `ts`
    * would silently replace a watermarked streaming column and strip its
    * watermark — append-mode aggregation then fails analysis (and worse,
    * state would never evict). Batch callers without `tss` get it derived
    * here as before. */
  private def withTss(df: DataFrame): DataFrame =
    if (df.columns.contains("tss")) df else df.withColumn("tss", tsCol)

  /** Tumbling-window counts per event_type (the canonical streaming agg).
    * `df` may be a batch read or a readStream with watermark applied. */
  def windowedCounts(df: DataFrame, windowLen: String = "1 hour"): DataFrame =
    withTss(df)
      .groupBy(window(col("tss"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value"), 2).as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
              col("event_type"), col("n"), col("sum_value"))

  /** Hopping (sliding) window counts: `windowLen` windows advancing by
    * `slide` — each event lands in windowLen/slide overlapping windows
    * (Spark's `window(ts, len, slide)` generates them scan-side; the
    * row multiplication is the inherent cost of hopping aggregation,
    * bounded by the ratio, and partials still combine map-side). */
  def hoppingCounts(df: DataFrame, windowLen: String = "2 hours",
                    slide: String = "30 minutes"): DataFrame =
    withTss(df)
      .groupBy(window(col("tss"), windowLen, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value"), 2).as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
              col("event_type"), col("n"), col("sum_value"))

  /** Exactly-once-style dedupe by event_id (streaming: pair with
    * withWatermark + dropDuplicatesWithinWatermark). */
  def dedupeEvents(df: DataFrame): DataFrame = df.dropDuplicates("event_id")

  /** Exact per-session distinct count — the SAFE form under session
    * merging. Spark 4.1.2's `count_distinct` over a `session_window`
    * groupBy returns WRONG results when a distinct value recurs within
    * one session separated by more than the gap (bridged by other
    * events): the distinct rewrite's first MergingSessions merges
    * sessions PER DISTINCT VALUE, so that value's fragments never merge,
    * and the final merge SUMS the fragment counts — `a@10:00, b@10:40,
    * a@11:10` at a 60-min gap answers 3 distinct types instead of 2
    * (found by the T11 differential, seed 9003; minimal repro pinned as
    * an upstream canary in StreamingSpec). This set-union form is immune:
    * the merge state is the value set itself, so merging sessions unions
    * sets instead of summing partial counts. Scale: state is the
    * per-session distinct-value set (event types, variants — bounded
    * cardinality); for unbounded columns use a distinct sketch (the g12
    * KMV tier) rather than an exact set. */
  def distinctInSession(c: Column): Column =
    size(collect_set(c)).cast("long")

  /** Gap-based sessionization in integer nanos: a new session starts when
    * the gap since the user's previous event exceeds `gapNanos`. Batch
    * form (lag + running sum); the streaming twin is session_window /
    * flatMapGroupsWithState in StreamingSpec. */
  def sessionize(df: DataFrame, gapNanos: Long = 30L * 60 * 1000000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val newSession = when(
      col("ts") - lag(col("ts"), 1).over(byUser) > gapNanos, 1)
      .when(lag(col("ts"), 1).over(byUser).isNull, 1)
      .otherwise(0)
    df.withColumn("new_s", newSession)
      .withColumn("session_id", sum(col("new_s")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Stream-stream interval join: every `view` matched with the same
    * user's `click`s landing within [0, gap] after it (attribution /
    * funnel enrichment). The SAME expression runs batch and streaming;
    * in streaming both inputs carry watermarks and the interval predicate
    * upper-bounds how long either side waits, so the join state store
    * evicts old rows instead of growing forever — the condition Spark
    * requires to run a stream-stream inner join at all, and the property
    * that keeps state bounded at 100 TB/day event volumes. Each side
    * pre-filters its event_type BEFORE the join, so state holds only the
    * joining subset. */
  def viewClickJoin(views: DataFrame, clicks: DataFrame,
                    gap: String = "30 minutes"): DataFrame = {
    val l = views.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_event"),
        col("tss").as("view_ts"))
    val r = clicks.filter(col("event_type") === "click")
      .select(col("user_id").as("r_user"), col("event_id").as("click_event"),
        col("tss").as("click_ts"))
    l.join(r,
      col("user_id") === col("r_user") &&
      col("click_ts") >= col("view_ts") &&
      col("click_ts") <= col("view_ts") + expr(s"INTERVAL $gap"))
      .select(col("user_id"), col("view_event"), col("click_event"),
        col("view_ts"), col("click_ts"))
  }

  /** Stream-stream LEFT OUTER interval join: [[viewClickJoin]] plus one
    * row per view that attracted NO click within the gap (click columns
    * null) — the "unconverted impressions" half an attribution pipeline
    * needs, which the inner form silently drops. The SAME expression runs
    * batch and streaming; in streaming Spark emits the null-padded row
    * only once the watermark passes `view_ts + gap` (the point where no
    * future click can match), so outer results are late by exactly the
    * watermark delay and state stays bounded — identical eviction math to
    * the inner join, plus the one extra emit on eviction. Each side
    * pre-filters its event_type BEFORE the join, so state holds only the
    * joining subset. */
  def viewClickAttribution(views: DataFrame, clicks: DataFrame,
                           gap: String = "30 minutes",
                           joinType: String = "left_outer"): DataFrame = {
    val l = views.filter(col("event_type") === "view")
      .select(col("user_id").as("l_user"), col("event_id").as("view_event"),
        col("tss").as("view_ts"))
    val r = clicks.filter(col("event_type") === "click")
      .select(col("user_id").as("r_user"), col("event_id").as("click_event"),
        col("tss").as("click_ts"))
    l.join(r,
      col("l_user") === col("r_user") &&
      col("click_ts") >= col("view_ts") &&
      col("click_ts") <= col("view_ts") + expr(s"INTERVAL $gap"),
      joinType)
      // coalesce is the identity for left_outer (l_user never null there)
      // and the FULL OUTER contract: an orphan click's row carries the
      // click side's user
      .select(coalesce(col("l_user"), col("r_user")).as("user_id"),
        col("view_event"), col("click_event"),
        col("view_ts"), col("click_ts"))
  }

  /** Attribution rollup: the inner interval join chained into a tumbling
    * window aggregation in ONE streaming query — the third multi-stateful
    * pair the engine ships (e18 chains agg→agg, e26 chains dedup→agg,
    * this chains join→agg). Counts attributed (view, click) pairs per
    * click-hour with id-extremum content pins (streaming append mode
    * forbids distinct aggregates; min/max are the order-free content
    * check the driver can hash). The join's watermark propagates through,
    * so append mode closes an hour once the join can no longer emit into
    * it — without the chain, the pair stream needs its own sink and a
    * second aggregation job. Batch and streaming run the same plan
    * (oracled, e27; StreamingSpec pins both stateful operators). */
  def attributionRollup(views: DataFrame, clicks: DataFrame,
                        gap: String = "30 minutes",
                        windowLen: String = "1 hour"): DataFrame =
    viewClickJoin(views, clicks, gap)
      .groupBy(window(col("click_ts"), windowLen).as("w"))
      .agg(count(lit(1)).as("n_pairs"),
        min(col("view_event")).as("first_view"),
        max(col("click_event")).as("last_click"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("n_pairs"), col("first_view"), col("last_click"))

  /** Stream-stream LEFT SEMI interval join: each view that attracted at
    * least one click within the gap, emitted ONCE with no click payload —
    * the "converted impressions" set without the per-click row
    * multiplication of the inner join (at 100 TB the inner form's output
    * is views×matching-clicks; the semi form caps it at the view count).
    * In streaming Spark emits the left row on its FIRST match and
    * thereafter drops it from the match path; state eviction math is the
    * inner join's. */
  def viewClickConverted(views: DataFrame, clicks: DataFrame,
                         gap: String = "30 minutes"): DataFrame = {
    val l = views.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_event"),
        col("tss").as("view_ts"))
    val r = clicks.filter(col("event_type") === "click")
      .select(col("user_id").as("r_user"), col("tss").as("click_ts"))
    l.join(r,
      col("user_id") === col("r_user") &&
      col("click_ts") >= col("view_ts") &&
      col("click_ts") <= col("view_ts") + expr(s"INTERVAL $gap"),
      "left_semi")
      .select(col("user_id"), col("view_event"), col("view_ts"))
  }

  /** Streaming ingest-time exact dedup: collapse at-least-once re-emits of
    * the same `event_id` whose event times land within `horizon` of each
    * other. Streaming input → Spark 4's `dropDuplicatesWithinWatermark`:
    * unlike plain `dropDuplicates` (whose key state NEVER evicts — at
    * 100 TB/day the store grows with total distinct ids forever), state
    * here expires once the watermark passes firstSeen + horizon, so the
    * store holds only the ids seen in the last horizon — bounded by ingest
    * RATE, not corpus size (StreamBench dedup mode measures the curve;
    * eviction is pinned in StreamingSpec).
    *
    * Batch input → the deterministic shadow of the streaming guarantee:
    * the FIRST occurrence per event_id survives (row_number over event-time
    * order — one hash shuffle on the key, the dedup_exact fingerprint
    * shape). The shadow assumes re-emit jitter ≤ horizon, which is the
    * at-least-once delivery contract: a source that re-emits FARTHER apart
    * than the horizon is outside the operator's guarantee in streaming too
    * (state already evicted — the duplicate passes), so the two forms agree
    * exactly on contract-compliant tapes; StreamingSpec pins the agreement
    * over a chunk-replayed jittered tape. */
  def dedupeWithinHorizon(df: DataFrame, horizon: String = "1 hour"): DataFrame =
    if (df.isStreaming)
      withTss(df).withWatermark("tss", horizon)
        .dropDuplicatesWithinWatermark("event_id")
    else {
      import org.apache.spark.sql.expressions.Window
      val firstSeen = Window.partitionBy(col("event_id"))
        .orderBy(col("ts"), col("event_type"), col("user_id"))
      withTss(df)
        .withColumn("occ_rn", row_number().over(firstSeen))
        .filter(col("occ_rn") === 1).drop("occ_rn")
    }

  /** Exactly-once windowed counts from an AT-LEAST-ONCE feed: ingest
    * dedup chained into the tumbling-window aggregation, two stateful
    * operators in ONE query (the dedup's watermark carries through to
    * close the windows — e18's chaining argument applied to the
    * dedup→agg pair). This is the composition every real event pipeline
    * runs first: without the dedup stage, re-delivered events inflate
    * every count; without the chain, the dedup needs its own sink and a
    * second job (a full extra write/read of the raw feed at 100 TB/day).
    * Works identically over batch (oracled, e26) and a stream
    * (StreamingSpec arm asserts BOTH stateful operators in the progress
    * record and parity with this batch form). */
  def dedupedWindowedCounts(df: DataFrame, horizon: String = "1 hour",
                            windowLen: String = "1 hour"): DataFrame =
    windowedCounts(dedupeWithinHorizon(df, horizon), windowLen)

  /** Chained time-window aggregation (two stateful operators in ONE
    * streaming query): fine-grained per-(cell, user) counts rolled up to
    * a coarse window of active user-cells and total events — the
    * multi-level dashboard rollup. Downstream grouping uses
    * `window_time(w)` (the cell's event-time representative, end − 1 µs),
    * which is what lets Spark chain stateful aggs in append mode: the
    * first agg's watermark carries through, the second agg closes a
    * coarse window once every fine cell inside it has closed. Without
    * this, the rollup needs an intermediate sink + a second job — at
    * 100 TB/day that is a full extra write/read of the fine aggregate.
    * `coarse` must be a multiple of `fine` so end−1 µs and start truncate
    * to the same coarse bucket. Scale: shuffle 1 keys (cell, user) with
    * map-side partials; shuffle 2 moves only the already-aggregated
    * cells, grouped by coarse window. */
  def windowedRollup(df: DataFrame, fine: String = "15 minutes",
                     coarse: String = "1 hour"): DataFrame = {
    // loud-fail the alignment contract instead of silently mis-bucketing:
    // a fine cell whose start and end−1µs straddle a coarse boundary
    // would land its rollup row in the WRONG coarse window
    def micros(s: String): Long = {
      val i = org.apache.spark.sql.catalyst.util.IntervalUtils
        .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(s))
      require(i.months == 0, s"calendar-month grains not supported here: $s")
      i.days * 86400000000L + i.microseconds
    }
    val (fUs, cUs) = (micros(fine), micros(coarse))
    require(fUs > 0 && cUs % fUs == 0,
      s"windowedRollup needs coarse ($coarse) to be a multiple of fine ($fine); " +
        "for calendar grains (month/quarter) use EventStream.calendarRollup")
    graft.Tables.requireUtc(df.sparkSession,
      "windowedRollup renders w2.start via date_format (session-zone wall clock)")
    val perCell = withTss(df)
      .groupBy(window(col("tss"), fine).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
    perCell
      .groupBy(window(window_time(col("w")), coarse).as("w2"))
      .agg(count(lit(1)).as("n_active_cells"), sum(col("n")).as("n_events"))
      .select(date_format(col("w2.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("n_active_cells"), col("n_events"))
  }

  /** Calendar-grain rollup (month / quarter / year / week): the variant
    * [[windowedRollup]] deliberately loud-fails, because `window()` cells
    * have fixed micro-widths and a calendar month does not — `window_time`
    * alignment arithmetic cannot bucket it. Here the grain key is
    * `date_trunc`, which is calendar-correct under the UTC session pin
    * (guarded loudly — a DST zone would split months at offset changes).
    *
    * Batch: one hash shuffle on (grain, event_type) with map-side partials
    * — the per-month dashboard rollup. Streaming: the SAME expression runs
    * in UPDATE mode (spec-pinned); append mode is impossible for calendar
    * grains — `date_trunc` strips the event-time watermark tag, so Spark
    * has no close-the-bucket criterion. The update-mode state is bounded
    * by KEY CARDINALITY (#months × #types — calendar-small) rather than by
    * watermark eviction, which is the honest trade at 100 TB/day: tiny
    * state, but downstream must accept row updates (an upsert sink), not
    * append-only files.
    *
    * `n_users` is exact COUNT(DISTINCT) in batch; streaming aggregation
    * cannot hold exact distinct sets in update-mode state, so the streaming
    * form reports the HLL++ estimate (`approx_count_distinct`, rsd 1% —
    * the g27 sketch-tier trade: per-key state is one dense sketch, flat in
    * user volume). The spec pins the streaming arm's n/sum columns EQUAL
    * to batch and its n_users within the rsd band. */
  def calendarRollup(df: DataFrame, grain: String = "month"): DataFrame = {
    val ok = Set("week", "month", "quarter", "year")
    require(ok(grain), s"calendarRollup grain must be one of $ok, got: $grain" +
      " (fixed intervals belong in windowedRollup, which also chains in append mode)")
    graft.Tables.requireUtc(df.sparkSession,
      s"calendarRollup buckets by date_trunc('$grain') wall-clock calendar")
    val nUsers =
      if (df.isStreaming) approx_count_distinct(col("user_id"), 0.01)
      else countDistinct(col("user_id"))
    withTss(df)
      .groupBy(date_trunc(grain, col("tss")).as("g"), col("event_type"))
      .agg(count(lit(1)).as("n"), nUsers.as("n_users"),
        dsum(col("value"), 2).as("sum_value"))
      .select(date_format(col("g"), "yyyy-MM-dd").as(s"${grain}_start"),
        col("event_type"), col("n"), col("n_users"), col("sum_value"))
  }

  /** Per-user session stats from the sessionized frame. */
  def sessionStats(df: DataFrame): DataFrame =
    sessionize(df)
      .groupBy(col("user_id"))
      .agg(max(col("session_id")).as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
}

object EventQueries extends QModule {
  import EventStream._

  def qs: Seq[Q] = Seq(
    // E14: the transformWithState operator run as a BATCH query (Spark 4
    // supports tws over batch Datasets: one transient state pass, each
    // key's group handled once) — which puts the v2 stateful processor
    // under the driver's hash oracle, not just the streaming specs. In a
    // single batch the emitted rows are the final per-(user, type)
    // profile, so the oracle is the plain grouped count with the per-user
    // total windowed over it. The `streams` touch initializes the
    // StateStoreCoordinator RPC endpoint, which a pure-batch session
    // never creates (loading state fails with CANNOT_LOAD_STATE_STORE
    // otherwise — a lazy-init quirk, not a config).
    Q("e14_user_profile_tws", (s, dir) => {
      s.streams.active
      import s.implicits._
      userProfileTws(t(s, dir, "events").as[Event])
        .toDF("user_id", "event_type", "n_type", "n_total")
        .orderBy(col("user_id"), col("event_type"))
    }, sql = Some("""
      SELECT user_id, event_type, COUNT(*) AS n_type,
             CAST(SUM(COUNT(*)) OVER (PARTITION BY user_id) AS BIGINT) AS n_total
      FROM events GROUP BY user_id, event_type
      ORDER BY user_id, event_type
    """)),

    // E15: streaming cardinality via SKETCH-VALUED tws state, run as a
    // batch query (the e14 pattern): per epoch-hour key the processor
    // folds user_ids into a theta sketch held in ValueState and emits
    // the refreshed estimate. The oracle is plain COUNT(DISTINCT) and
    // the compare is EQUALITY, not a bound: every hour bucket holds far
    // fewer than 4096 distinct users (sf0.1 max: 166), so the sketch is
    // in its exact regime by the documented theta contract — a testdata
    // regen that blows past 4096/hour fails HERE loudly, which is the
    // correct signal to switch this oracle to the bound-row form. The
    // hour key is exact integer division of the nanos ts on both sides.
    Q("e15_distinct_sketch_tws", (s, dir) => {
      s.streams.active
      import s.implicits._
      hourlyDistinctSketchTws(t(s, dir, "events").as[Event])
        .toDF("hour_key", "n_users")
        .orderBy(col("hour_key"))
    }, sql = Some("""
      SELECT epoch_us(ts) // 3600000000 AS hour_key,
             COUNT(DISTINCT user_id) AS n_users
      FROM events GROUP BY 1 ORDER BY hour_key
    """)),

    // E16: the quantile twin of e15 — per-hour value p50 from KLL bytes
    // held in tws state, run as a batch query. KLL compaction is
    // internally randomized so the oracle pins the RANK-INTERVAL
    // contract (the g29 pattern: the returned p50's exact rank must sit
    // within eps of 0.5 per hour — at ≤~140 rows/hour the k=200 sketch
    // retains everything and the interval check is exact-deterministic)
    // plus n preserved exactly through state (n_matches). eps 0.03.
    Q("e16_quantile_sketch_tws", (s, dir) => {
      s.streams.active
      import s.implicits._
      val sk = hourlyQuantileSketchTws(t(s, dir, "events").as[Event])
        .toDF("hour_key", "n_sk", "p50")
      val ev = t(s, dir, "events")
        .withColumn("hour_key", expr("ts div 3600000000000"))
      val eps = 0.03
      ev.join(broadcast(sk), Seq("hour_key"))
        .groupBy($"hour_key")
        .agg(count(lit(1)).as("n_rows"),
          (sum(when($"value" < $"p50", 1L).otherwise(0L))
             < (lit(0.5) + eps) * count(lit(1)) &&
           sum(when($"value" <= $"p50", 1L).otherwise(0L))
             >= (lit(0.5) - eps) * count(lit(1))).as("p50_within_bound"),
          (max($"n_sk") === count(lit(1))).as("n_matches"))
        .orderBy($"hour_key")
    }, sql = Some("""
      SELECT epoch_us(ts) // 3600000000 AS hour_key, COUNT(*) AS n_rows,
             TRUE AS p50_within_bound, TRUE AS n_matches
      FROM events GROUP BY 1 ORDER BY hour_key
    """)),

    // Tumbling 1h windowed aggregation (streaming-equivalent batch form).
    Q("e1_window_counts", (s, dir) =>
      windowedCounts(t(s, dir, "events"))
        .orderBy(col("window_start"), col("event_type")),
      sql = Some("""
      SELECT strftime(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)),
                      '%Y-%m-%d %H:%M:%S') AS window_start,
             event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY window_start, event_type
    """), headline = true),

    // Hopping 2h/30min windows — each event in exactly 4 overlapping
    // windows (epoch-aligned, Spark window() semantics); the oracle
    // reconstructs them by shifting the 30-min bucket back k∈0..3
    // slides. Same text works streaming with a watermark.
    Q("e7_hopping_counts", (s, dir) =>
      hoppingCounts(t(s, dir, "events"))
        .orderBy(col("window_start"), col("event_type")),
      sql = Some("""
      SELECT strftime(time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP))
                        - k * INTERVAL '30 minutes',
                      '%Y-%m-%d %H:%M:%S') AS window_start,
             event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events CROSS JOIN UNNEST(range(0, 4)) t(k)
      GROUP BY 1, 2 ORDER BY window_start, event_type
    """)),

    // E6: semi-structured VARIANT path (Spark 4's open-schema type): parse
    // once to variant, extract typed fields lazily — the schema-on-read
    // pattern for payloads too heterogeneous for from_json's fixed
    // StructType (e3). The oracle replays it as plain JSON extraction;
    // identical ints either way.
    Q("e6_variant", (s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .select($"event_type",
          expr("variant_get(try_parse_json(props), '$.k', 'int')").as("k"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), sum($"k").as("sum_k"),
          min($"k").as("min_k"), max($"k").as("max_k"))
        .orderBy($"event_type")
    }, sql = Some("""
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
             MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
             MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
      FROM events GROUP BY event_type ORDER BY event_type
    """)),

    // E4: ordered funnel (view → click-after-view → purchase-after-click).
    // Each stage is one filtered agg keyed by user joined to the previous
    // stage's first-hit time — stage predicates are >= comparisons on the
    // raw integer nanos, exact in both engines. 100 TB shape: three
    // filtered scans with map-side partial min, joins on the (tiny)
    // per-user stage tables; no window, no ordering.
    Q("e4_funnel", (s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events").select($"user_id", $"event_type", $"ts")
      val v = ev.filter($"event_type" === "view")
        .groupBy($"user_id").agg(min($"ts").as("vts"))
      val c = ev.filter($"event_type" === "click").join(v, Seq("user_id"))
        .filter($"ts" >= $"vts")
        .groupBy($"user_id").agg(min($"ts").as("cts"))
      val p = ev.filter($"event_type" === "purchase").join(c, Seq("user_id"))
        .filter($"ts" >= $"cts")
        .groupBy($"user_id").agg(min($"ts").as("pts"))
      v.agg(count(lit(1)).as("n_viewed"))
        .crossJoin(c.agg(count(lit(1)).as("n_clicked_after_view")))
        .crossJoin(p.agg(count(lit(1)).as("n_purchased_after_click")))
    }, sql = Some("""
      WITH v AS (SELECT user_id, MIN(ts) AS vts FROM events
                 WHERE event_type = 'view' GROUP BY user_id),
      c AS (SELECT e.user_id, MIN(e.ts) AS cts
            FROM events e JOIN v ON e.user_id = v.user_id
            WHERE e.event_type = 'click' AND e.ts >= v.vts GROUP BY e.user_id),
      p AS (SELECT e.user_id, MIN(e.ts) AS pts
            FROM events e JOIN c ON e.user_id = c.user_id
            WHERE e.event_type = 'purchase' AND e.ts >= c.cts GROUP BY e.user_id)
      SELECT (SELECT COUNT(*) FROM v) AS n_viewed,
             (SELECT COUNT(*) FROM c) AS n_clicked_after_view,
             (SELECT COUNT(*) FROM p) AS n_purchased_after_click
    """)),

    // E5: weekly cohort retention — users bucketed by first-active week,
    // distinct-user counts per (cohort, week offset). All integer-nanos
    // arithmetic (epoch-week = ts div week-nanos), so the cohort grid is
    // exact cross-engine. Shape: one distinct on (user, week), one min
    // per user, one join, one count agg — each a single shuffle of
    // already-tiny intermediates.
    Q("e5_cohort_retention", (s, dir) => {
      import s.implicits._
      val wkNanos = 604800000000000L // 7*24*3600 * 1e9
      val uw = t(s, dir, "events")
        .select($"user_id", expr(s"ts div $wkNanos").as("wk")).distinct()
      val cohort = uw.groupBy($"user_id").agg(min($"wk").as("cohort_wk"))
      uw.join(cohort, Seq("user_id"))
        .groupBy($"cohort_wk", ($"wk" - $"cohort_wk").as("week_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy($"cohort_wk", $"week_offset")
    }, sql = Some("""
      WITH uw AS (SELECT DISTINCT user_id, epoch_ns(ts) // 604800000000000 AS wk
                  FROM events),
      cohort AS (SELECT user_id, MIN(wk) AS cohort_wk FROM uw GROUP BY user_id)
      SELECT cohort.cohort_wk, uw.wk - cohort.cohort_wk AS week_offset,
             COUNT(*) AS n_users
      FROM uw JOIN cohort ON uw.user_id = cohort.user_id
      GROUP BY 1, 2 ORDER BY cohort_wk, week_offset
    """)),

    // Schema'd JSON parsing of event props (SURVEY §1.4: from_json with a
    // declared schema, not per-field string extraction).
    Q("e3_json_props", (s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .withColumn("p", from_json($"props",
          org.apache.spark.sql.types.StructType.fromDDL("k INT")))
        .groupBy(($"p.k" % 10).as("k_mod10"))
        .agg(count(lit(1)).as("n"), sum($"p.k").as("sum_k"))
        .orderBy($"k_mod10")
    }, sql = Some("""
      SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_mod10,
             COUNT(*) AS n,
             CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k
      FROM events GROUP BY 1 ORDER BY k_mod10
    """)),

    // E3b: the same semi-structured payload through Spark 4's VARIANT
    // type — parse_json once into the binary variant encoding, then
    // schema-on-read extraction with variant_get (no up-front
    // StructType, unlike e3's from_json). try_variant_get on an absent
    // path yields null instead of failing — the tolerant-read contract
    // a schema-drifting event stream needs. At scale variant's binary
    // form is parsed once and pushed through codegen, not re-parsed
    // per extraction like repeated get_json_object calls.
    Q("e10_variant_props", (s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .withColumn("v", parse_json($"props"))
        .select(
          variant_get($"v", "$.k", "long").as("k"),
          try_variant_get($"v", "$.missing", "long").as("m"))
        .groupBy(($"k" % 7).as("k_mod7"))
        .agg(count(lit(1)).as("n"), min($"k").as("min_k"), max($"k").as("max_k"),
          count(when($"m".isNull, 1)).as("n_missing"))
        .orderBy($"k_mod7")
    }, sql = Some("""
      SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 7 AS k_mod7,
             COUNT(*) AS n,
             MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
             MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
             COUNT(CASE WHEN json_extract_string(props, '$.missing') IS NULL THEN 1 END) AS n_missing
      FROM events GROUP BY 1 ORDER BY k_mod7
    """)),

    // E8: the interval join (stream-stream in StreamingSpec) in its batch
    // form — view→click attribution within 30 min per user. The oracle is
    // the equivalent range join; ordering pins the row set. Scale: both
    // sides pre-filter event_type before the join, the equi-key is
    // user_id, and the time band rides along as a residual predicate —
    // never an inequality-only nested loop (the global PlanHygieneSpec
    // net would catch that).
    Q("e8_view_click_join", (s, dir) => {
      val ev = t(s, dir, "events").withColumn("tss", tsCol)
      viewClickJoin(ev, ev)
        .select(col("user_id"), col("view_event"), col("click_event"))
        .orderBy(col("user_id"), col("view_event"), col("click_event"))
    }, sql = Some("""
      SELECT v.user_id, v.event_id AS view_event, c.event_id AS click_event
      FROM events v JOIN events c
        ON v.user_id = c.user_id
       AND v.event_type = 'view' AND c.event_type = 'click'
       AND CAST(c.ts AS TIMESTAMP) >= CAST(v.ts AS TIMESTAMP)
       AND CAST(c.ts AS TIMESTAMP) <= CAST(v.ts AS TIMESTAMP) + INTERVAL '30 minutes'
      ORDER BY v.user_id, view_event, click_event
    """)),

    // E17: the LEFT OUTER form of e8 (stream-stream outer join in
    // StreamingSpec) in its batch form — every view row survives, clicks
    // null where nothing landed in the gap. Null ordering is pinned
    // explicitly on BOTH sides (Spark asc = nulls first; DuckDB default
    // is nulls last) because the driver compare is row-order sensitive.
    Q("e17_view_click_outer", (s, dir) => {
      val ev = t(s, dir, "events").withColumn("tss", tsCol)
      viewClickAttribution(ev, ev)
        .select(col("user_id"), col("view_event"), col("click_event"))
        .orderBy(col("user_id"), col("view_event"),
          col("click_event").asc_nulls_first)
    }, sql = Some("""
      SELECT v.user_id, v.event_id AS view_event, c.event_id AS click_event
      FROM (SELECT * FROM events WHERE event_type = 'view') v
      LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON v.user_id = c.user_id
       AND CAST(c.ts AS TIMESTAMP) >= CAST(v.ts AS TIMESTAMP)
       AND CAST(c.ts AS TIMESTAMP) <= CAST(v.ts AS TIMESTAMP) + INTERVAL '30 minutes'
      ORDER BY v.user_id, view_event, click_event NULLS FIRST
    """), headline = true),

    // E19: the FULL OUTER form — both orphan halves survive: views with
    // no click in the gap (click columns null, e17's half) AND clicks
    // attached to no view (view columns null — the orphan-click
    // reconciliation half). Same equi-key + band plan family; in
    // streaming both sides' state evicts by watermark and emits its
    // null-padded row on eviction.
    Q("e19_view_click_full", (s, dir) => {
      val ev = t(s, dir, "events").withColumn("tss", tsCol)
      viewClickAttribution(ev, ev, joinType = "full_outer")
        .select(col("user_id"), col("view_event"), col("click_event"))
        .orderBy(col("user_id"), col("view_event").asc_nulls_first,
          col("click_event").asc_nulls_first)
    }, sql = Some("""
      SELECT coalesce(v.user_id, c.user_id) AS user_id,
             v.event_id AS view_event, c.event_id AS click_event
      FROM (SELECT * FROM events WHERE event_type = 'view') v
      FULL JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON v.user_id = c.user_id
       AND CAST(c.ts AS TIMESTAMP) >= CAST(v.ts AS TIMESTAMP)
       AND CAST(c.ts AS TIMESTAMP) <= CAST(v.ts AS TIMESTAMP) + INTERVAL '30 minutes'
      ORDER BY user_id, view_event NULLS FIRST, click_event NULLS FIRST
    """)),

    // E20: the LEFT SEMI form — converted views exactly once, no click
    // payload, output capped at the view count (the inner join's output
    // is views×matching-clicks). Oracle = EXISTS, the semi join's
    // relational definition.
    Q("e20_view_click_semi", (s, dir) => {
      val ev = t(s, dir, "events").withColumn("tss", tsCol)
      viewClickConverted(ev, ev)
        .select(col("user_id"), col("view_event"))
        .orderBy(col("user_id"), col("view_event"))
    }, sql = Some("""
      SELECT v.user_id, v.event_id AS view_event
      FROM events v
      WHERE v.event_type = 'view' AND EXISTS (
        SELECT 1 FROM events c
        WHERE c.event_type = 'click' AND c.user_id = v.user_id
          AND CAST(c.ts AS TIMESTAMP) >= CAST(v.ts AS TIMESTAMP)
          AND CAST(c.ts AS TIMESTAMP) <= CAST(v.ts AS TIMESTAMP) + INTERVAL '30 minutes')
      ORDER BY v.user_id, view_event
    """)),

    // E23: the RIGHT OUTER form — every click survives, view columns null
    // where no view preceded it within the gap: the orphan-click set is
    // the fraud/bot-detection shape (clicks with no impression). Mirror of
    // e17 through the same viewClickAttribution entry point; in streaming
    // the right side's state evicts by watermark and emits its null-padded
    // row on eviction, symmetric to e17's left half.
    Q("e23_click_view_right", (s, dir) => {
      val ev = t(s, dir, "events").withColumn("tss", tsCol)
      viewClickAttribution(ev, ev, joinType = "right_outer")
        .select(col("user_id"), col("view_event"), col("click_event"))
        .orderBy(col("user_id"), col("click_event"),
          col("view_event").asc_nulls_first)
    }, sql = Some("""
      SELECT coalesce(v.user_id, c.user_id) AS user_id,
             v.event_id AS view_event, c.event_id AS click_event
      FROM (SELECT * FROM events WHERE event_type = 'view') v
      RIGHT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON v.user_id = c.user_id
       AND CAST(c.ts AS TIMESTAMP) >= CAST(v.ts AS TIMESTAMP)
       AND CAST(c.ts AS TIMESTAMP) <= CAST(v.ts AS TIMESTAMP) + INTERVAL '30 minutes'
      ORDER BY user_id, click_event, view_event NULLS FIRST
    """)),

    // E21: ingest-time exact dedup within a watermark horizon — the tape
    // is replayed with a +10-minute jittered re-emit of every event (the
    // at-least-once delivery shape with network delay, vs e9's exact
    // doubling), dedupeWithinHorizon collapses each pair to its FIRST
    // occurrence, and sum_ts_sec proves the ORIGINAL copy survived (a
    // wrong-copy keep shifts the sum by 600 s per event). Streaming twin:
    // dropDuplicatesWithinWatermark with watermark-bounded key state
    // (StreamingSpec parity + eviction pins; StreamBench dedup mode).
    Q("e21_dedup_within_horizon", (s, dir) => {
      val ev = t(s, dir, "events")
      val replayed = ev.unionAll(
        ev.withColumn("ts", col("ts") + lit(600000000000L)))
      dedupeWithinHorizon(replayed)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), countDistinct(col("event_id")).as("n_ids"),
          sum(expr("ts div 1000000000")).as("sum_ts_sec"))
        .orderBy(col("event_type"))
    }, sql = Some("""
      WITH replayed AS (
        SELECT event_id, ts, user_id, event_type FROM events
        UNION ALL
        SELECT event_id, ts + INTERVAL '10 minutes' AS ts, user_id, event_type
        FROM events),
      kept AS (
        SELECT event_type, event_id, epoch_ns(ts) AS tns,
               row_number() OVER (PARTITION BY event_id
                 ORDER BY ts, event_type, user_id) AS rn
        FROM replayed)
      SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT event_id) AS n_ids,
             CAST(SUM(tns // 1000000000) AS BIGINT) AS sum_ts_sec
      FROM kept WHERE rn = 1
      GROUP BY event_type ORDER BY event_type
    """)),

    // E22: calendar-grain rollup — the month buckets windowedRollup
    // loud-fails (no fixed micro-width). date_trunc keys under the UTC
    // pin; exact distinct users in batch (streaming twin reports the
    // HLL++ estimate — see calendarRollup scaladoc and its spec arm).
    Q("e22_month_rollup", (s, dir) =>
      calendarRollup(t(s, dir, "events"), "month")
        .orderBy(col("month_start"), col("event_type")),
      sql = Some("""
      SELECT strftime(date_trunc('month', CAST(ts AS TIMESTAMP)),
                      '%Y-%m-%d') AS month_start,
             event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY month_start, event_type
    """)),

    // E27: stream-stream join chained into a window aggregation — the
    // attribution-throughput rollup (pairs per click-hour) in its oracled
    // batch form; the third multi-stateful composition (e18 agg→agg,
    // e26 dedup→agg, e27 join→agg). min/max id pins replace the distinct
    // aggregates append-mode streaming forbids.
    Q("e27_attribution_rollup", (s, dir) => {
      val ev = t(s, dir, "events").withColumn("tss", tsCol)
      attributionRollup(ev, ev)
        .orderBy(col("window_start"))
    }, sql = Some("""
      SELECT strftime(time_bucket(INTERVAL '1 hour', CAST(c.ts AS TIMESTAMP)),
                      '%Y-%m-%d %H:%M:%S') AS window_start,
             COUNT(*) AS n_pairs, MIN(v.event_id) AS first_view,
             MAX(c.event_id) AS last_click
      FROM (SELECT * FROM events WHERE event_type = 'view') v
      JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON c.user_id = v.user_id
       AND CAST(c.ts AS TIMESTAMP) >= CAST(v.ts AS TIMESTAMP)
       AND CAST(c.ts AS TIMESTAMP) <= CAST(v.ts AS TIMESTAMP) + INTERVAL '30 minutes'
      GROUP BY 1 ORDER BY window_start
    """)),

    // E26: exactly-once windowed counts from an at-least-once feed — the
    // dedup→window-agg CHAIN (two stateful operators in one streaming
    // query) in its oracled batch form. The tape is replayed with e21's
    // +10-min jitter; the counts must equal the clean tape's counts
    // because every duplicate dies at the dedup stage BEFORE the window
    // aggregation sees it. Streaming twin: the chained append query
    // (StreamingSpec pins both stateful operators in one progress
    // record).
    Q("e26_dedup_window", (s, dir) => {
      val ev = t(s, dir, "events")
      val replayed = ev.unionAll(
        ev.withColumn("ts", col("ts") + lit(600000000000L)))
      dedupedWindowedCounts(replayed)
        .orderBy(col("window_start"), col("event_type"))
    }, sql = Some("""
      WITH replayed AS (
        SELECT event_id, ts, user_id, event_type, value FROM events
        UNION ALL
        SELECT event_id, ts + INTERVAL '10 minutes', user_id, event_type, value
        FROM events),
      kept AS (
        SELECT *, row_number() OVER (PARTITION BY event_id
                 ORDER BY ts, event_type, user_id) AS rn
        FROM replayed)
      SELECT strftime(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)),
                      '%Y-%m-%d %H:%M:%S') AS window_start,
             event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM kept WHERE rn = 1
      GROUP BY 1, 2 ORDER BY window_start, event_type
    """)),

    // E25: CDC apply-changes in batch form — the latest-wins upsert view
    // an at-least-once change feed materializes (argmax per key by
    // (ts, event_id); the dense-unique event id is the deterministic
    // tie-break, canaried in TestdataContractSpec). One struct-max hash
    // aggregation — no window, no self-join — so the plan is a single
    // shuffle on the key at any scale. Streaming twin: cdcLatestTws
    // (update-suppression differential in StreamingSpec).
    Q("e25_cdc_latest", (s, dir) =>
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(max(struct(col("ts"), col("event_id"), col("value"))).as("m"))
        .select(col("user_id"), col("m.ts").as("last_ts"),
          col("m.event_id").as("last_event"), col("m.value").as("last_value"))
        .orderBy(col("user_id")),
      sql = Some("""
      SELECT user_id, epoch_ns(ts) AS last_ts, event_id AS last_event,
             value AS last_value
      FROM (SELECT *, row_number() OVER (PARTITION BY user_id
              ORDER BY ts DESC, event_id DESC) AS rn FROM events)
      WHERE rn = 1 ORDER BY user_id
    """)),

    // E18: the chained-stateful rollup (two window aggregations in one
    // streaming query — StreamingSpec runs it with both aggs stateful in
    // append mode) in its batch form. n_active_cells counts distinct
    // (15-min cell, user) pairs per hour; n_events re-sums the fine
    // counts, so a cell lost between the two aggs mismatches both
    // columns. The oracle replays the two-level rollup as nested
    // time_buckets.
    Q("e18_windowed_rollup", (s, dir) =>
      windowedRollup(t(s, dir, "events"))
        .orderBy(col("window_start")),
      sql = Some("""
      WITH cell AS (
        SELECT time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP)) AS cs,
               user_id, COUNT(*) AS n
        FROM events GROUP BY 1, 2)
      SELECT strftime(time_bucket(INTERVAL '1 hour', cs),
                      '%Y-%m-%d %H:%M:%S') AS window_start,
             COUNT(*) AS n_active_cells, CAST(SUM(n) AS BIGINT) AS n_events
      FROM cell GROUP BY 1 ORDER BY window_start
    """), headline = true),

    // E9: exactly-once dedupe semantics, oracle-checked — the input is
    // deliberately DOUBLED (union all of the table with itself, the
    // at-least-once delivery shape), dropDuplicates("event_id") collapses
    // it, and per-type counts prove the collapse. Streaming twin:
    // dropDuplicatesWithinWatermark (StreamingSpec, incl. checkpoint
    // restart). Scale: dedupe is one hash-shuffle on event_id — the same
    // one-shuffle fingerprint shape as dedup_exact.
    Q("e9_dedup_replayed", (s, dir) => {
      val ev = t(s, dir, "events")
      dedupeEvents(ev.unionAll(ev))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), countDistinct(col("event_id")).as("n_ids"))
        .orderBy(col("event_type"))
    }, sql = Some("""
      WITH doubled AS (
        SELECT * FROM events UNION ALL SELECT * FROM events),
      deduped AS (
        SELECT event_type, event_id,
               row_number() OVER (PARTITION BY event_id) AS rn
        FROM doubled)
      SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT event_id) AS n_ids
      FROM deduped WHERE rn = 1
      GROUP BY event_type ORDER BY event_type
    """)),

    // E11: native session windows — Spark's session_window(ts, gap)
    // merged per user (the streaming-native gap-window operator; e2 is
    // the hand-rolled lag/running-sum equivalent). Semantics: a session
    // spans [first_ts, last_ts + gap); an event whose time equals the
    // previous session's end TOUCHES it and MERGES (Spark unions
    // touching intervals — pinned by the StreamingSpec exact-gap
    // fixture), so the oracle's new-session test is STRICTLY > gap.
    // The oracle reconstructs sessions via the lag/gap
    // grouping and emits min(ts) / max(ts)+gap; its gap test is in
    // epoch_us deliberately — session_window runs on the micro-truncated
    // tss, and micros parity holds for every file encoding and DuckDB
    // version (epoch_ns would read exact nanos under a future DuckDB
    // on legacy NANOS files while tss stays truncated). Scale: one
    // shuffle on user_id + in-partition session merge
    // (MergingSessionsExec) — in streaming mode the same expression
    // runs with a watermark and state eviction at window end.
    Q("e11_session_window", (s, dir) => {
      val ev = t(s, dir, "events").withColumn("tss", tsCol)
      ev.groupBy(session_window(col("tss"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value"), 2).as("sum_value"))
        .select(col("user_id"),
          date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          date_format(col("w.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
          col("n_events"), col("sum_value"))
        .orderBy(col("user_id"), col("session_start"))
    }, sql = Some("""
      WITH g AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN lag(ts) OVER w IS NULL THEN 1
                    WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w)
                         > CAST(1800 AS BIGINT) * 1000000 THEN 1
                    ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      s AS (
        SELECT user_id, ts, value,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM g)
      SELECT user_id,
             strftime(MIN(CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS session_start,
             strftime(MAX(CAST(ts AS TIMESTAMP)) + INTERVAL '30 minutes',
                      '%Y-%m-%d %H:%M:%S') AS session_end,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM s GROUP BY user_id, sid
      ORDER BY user_id, session_start
    """)),

    // E12: per-session exact distinct counts via distinctInSession — the
    // safe set-union form; naive count_distinct over session_window is
    // WRONG on Spark 4.1.2 (see distinctInSession scaladoc; upstream
    // canary + fixture repro pinned in StreamingSpec). The oracle is the
    // ground-truth COUNT(DISTINCT) over lag/gap-reconstructed sessions,
    // so this row fails loudly if the safe form ever drifts.
    Q("e12_session_distinct", (s, dir) => {
      val ev = t(s, dir, "events").withColumn("tss", tsCol)
      ev.groupBy(session_window(col("tss"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"),
             distinctInSession(col("event_type")).as("nd_types"))
        .select(col("user_id"),
          unix_micros(col("w.start")).as("session_start_us"),
          col("n_events"), col("nd_types"))
        .orderBy(col("user_id"), col("session_start_us"))
    }, sql = Some("""
      WITH g AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(ts) OVER w IS NULL THEN 1
                    WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w)
                         > CAST(1800 AS BIGINT) * 1000000 THEN 1
                    ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      s AS (
        SELECT user_id, ts, event_type,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM g)
      SELECT user_id, MIN(epoch_us(ts)) AS session_start_us,
             COUNT(*) AS n_events,
             COUNT(DISTINCT event_type) AS nd_types
      FROM s GROUP BY user_id, sid
      ORDER BY user_id, session_start_us
    """)),

    // E13: behavior-graph matrix product — the event-type transition
    // counts C[f,t] (per-user LEAD over time) squared via the join-
    // aggregate form: paths2[f,t] = Σ_m C[f,m]·C[m,t], the number of
    // length-2 walks f→m→t in the transition multigraph (edge
    // multiplicity = observed transition count; the two hops need not
    // come from the same user). This is distributed sparse
    // matrix multiplication (SpGEMM): equi-join the two operands on the
    // shared dimension m, partial-aggregate the products — the shuffle
    // moves nnz(A)+nnz(B) rows keyed by m and the output is bounded by
    // nnz of the product, never a dense |types|² blow-up. Integer-exact
    // (counts of counts), so it hash-matches the oracle's replay.
    // At 100 TB the same plan runs with m as any high-cardinality
    // vertex id (page→page, domain→domain): the join is the canonical
    // 1-shuffle SpGEMM and the partial agg bounds the exchange.
    Q("e13_transition_matmul", (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val c = t(s, dir, "events")
        .withColumn("nt", lead($"event_type", 1).over(w))
        .filter($"nt".isNotNull)
        .groupBy($"event_type".as("f"), $"nt".as("t2"))
        .agg(count(lit(1)).as("c"))
      val a = c.select($"f".as("a_f"), $"t2".as("a_t"), $"c".as("a_c"))
      val b = c.select($"f".as("b_f"), $"t2".as("b_t"), $"c".as("b_c"))
      a.join(b, $"a_t" === $"b_f")
        .groupBy($"a_f".as("from_type"), $"b_t".as("to_type"))
        .agg(sum($"a_c" * $"b_c").as("paths2"))
        .orderBy($"from_type", $"to_type")
    }, sql = Some("""
      WITH tr AS (
        SELECT event_type AS f,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS t
        FROM events),
      c AS (SELECT f, t, COUNT(*) AS c FROM tr WHERE t IS NOT NULL
            GROUP BY f, t)
      SELECT a.f AS from_type, b.t AS to_type,
             CAST(SUM(a.c * b.c) AS BIGINT) AS paths2
      FROM c a JOIN c b ON a.t = b.f
      GROUP BY 1, 2 ORDER BY from_type, to_type
    """)),

    // Gap-based sessionization (30 min), integer-nanos exact.
    Q("e2_sessionize", (s, dir) =>
      sessionStats(t(s, dir, "events")),
      sql = Some("""
      WITH g AS (
        SELECT user_id,
               CASE WHEN lag(ts) OVER w IS NULL THEN 1
                    WHEN epoch_ns(ts) - epoch_ns(lag(ts) OVER w)
                         > CAST(1800 AS BIGINT) * 1000000000 THEN 1
                    ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      SELECT user_id, CAST(SUM(new_s) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
      FROM g GROUP BY user_id ORDER BY user_id
    """), headline = true)
  )
}
