package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Spark 4's `transformWithState` surface — the successor to
  * `mapGroupsWithState` with named state variables, per-state TTL, and
  * timers. [[RunningSpendProcessor]] keeps one O(1) record per user
  * (count + exact integer cents) and emits the updated running totals
  * whenever a key receives input — the unbounded-stream accumulator a
  * Kinesis-style spend monitor needs, with state the RocksDB provider
  * spills off-heap at 100 TB key cardinality.
  */
object StatefulOps {

  case class SpendEvent(user_id: Long, amount_cents: Long)
  case class SpendTotal(user_id: Long, n_events: Long, total_cents: Long)

  /** One running (count, Σcents) per user. TTL comes from the caller:
    * `TTLConfig.NONE` keeps state forever (the deterministic test mode);
    * a duration turns the state into an expiring activity window.
    */
  class RunningSpendProcessor(ttl: TTLConfig)
      extends StatefulProcessor[Long, SpendEvent, SpendTotal] {

    @transient private var state: ValueState[SpendTotal] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SpendTotal](
        "spend", Encoders.product[SpendTotal], ttl)

    override def handleInputRows(key: Long, rows: Iterator[SpendEvent],
        timerValues: TimerValues): Iterator[SpendTotal] = {
      var cur =
        if (state.exists()) state.get()
        else SpendTotal(key, 0L, 0L)
      rows.foreach { e =>
        cur = SpendTotal(key, cur.n_events + 1, cur.total_cents + e.amount_cents)
      }
      state.update(cur)
      Iterator.single(cur)
    }
  }

  /** Streaming per-user running spend: input needs `user_id` and
    * `amount_cents` columns; emits one updated `SpendTotal` row per key
    * per micro-batch that saw input (Update mode). The time mode follows
    * the TTL: Spark rejects a TTL'd state variable outside
    * `TimeMode.ProcessingTime` (state expiry needs a clock), so a real
    * TTL switches modes automatically and `TTLConfig.NONE` keeps the
    * deterministic clock-free mode.
    */
  def runningSpend(events: DataFrame,
      ttl: TTLConfig = TTLConfig.NONE): Dataset[SpendTotal] = {
    import events.sparkSession.implicits._
    val timeMode =
      if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()
    events
      .select(col("user_id").cast("long").as("user_id"),
        col("amount_cents").cast("long").as("amount_cents"))
      .as[SpendEvent]
      .groupByKey(_.user_id)
      .transformWithState(new RunningSpendProcessor(ttl),
        timeMode, OutputMode.Update(), Encoders.product[SpendTotal])
  }

  case class DigestEvent(user_id: Long, ts: java.sql.Timestamp,
      event_type: String, cents: Long)
  case class SessionBounds(start_ms: Long, end_ms: Long, n_events: Long,
      total_cents: Long)
  case class SessionDigest(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, total_cents: Long,
      type_counts: String)

  /** The FULL `transformWithState` surface in one processor: a ValueState
    * for session bounds, a MapState for per-type counters, and an
    * EVENT-TIME TIMER re-armed on every input to (session end + gap) —
    * when the watermark passes it, [[StatefulProcessor.handleExpiredTimer]]
    * emits the closed session's digest and clears both states. This is
    * the timer-driven formulation of gap sessionization (the
    * `flatMapGroupsWithState` twin closes via timeout polling; timers
    * make the expiry a first-class callback). State per key stays O(1) +
    * O(|types|); type counts serialize as a sorted `type:count` string
    * so the digest row is deterministic.
    */
  class SessionDigestProcessor(gapMs: Long)
      extends StatefulProcessor[Long, DigestEvent, SessionDigest] {

    @transient private var bounds: ValueState[SessionBounds] = _
    @transient private var counts: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      bounds = getHandle.getValueState[SessionBounds](
        "bounds", Encoders.product[SessionBounds], TTLConfig.NONE)
      counts = getHandle.getMapState[String, Long](
        "counts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[DigestEvent],
        timerValues: TimerValues): Iterator[SessionDigest] = {
      var cur =
        if (bounds.exists()) bounds.get()
        else SessionBounds(Long.MaxValue, Long.MinValue, 0L, 0L)
      rows.foreach { e =>
        val t = e.ts.getTime
        cur = SessionBounds(math.min(cur.start_ms, t), math.max(cur.end_ms, t),
          cur.n_events + 1, cur.total_cents + e.cents)
        val prev = if (counts.containsKey(e.event_type))
          counts.getValue(e.event_type) else 0L
        counts.updateValue(e.event_type, prev + 1)
      }
      bounds.update(cur)
      // re-arm: exactly one live timer per key, at latest-event + gap
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t))
      getHandle.registerTimer(cur.end_ms + gapMs)
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionDigest] = {
      if (!bounds.exists()) return Iterator.empty
      val b = bounds.get()
      val byType = counts.iterator().toSeq.sortBy(_._1)
      val digest = SessionDigest(
        key,
        new java.sql.Timestamp(b.start_ms),
        new java.sql.Timestamp(b.end_ms),
        b.n_events,
        b.total_cents,
        byType.map { case (t, c) => s"$t:$c" }.mkString(","))
      bounds.clear()
      counts.clear()
      Iterator.single(digest)
    }
  }

  /** Timer-driven gap sessionization over `transformWithState`: input
    * needs (user_id, ts, event_type, cents) columns; emits one
    * [[SessionDigest]] per closed session (Append mode) once the
    * event-time watermark passes last-event + gap.
    */
  def sessionDigest(events: DataFrame, gapSeconds: Long,
      watermark: String = "1 minute"): Dataset[SessionDigest] = {
    import events.sparkSession.implicits._
    events
      .select(col("user_id").cast("long").as("user_id"), col("ts"),
        col("event_type"), col("cents").cast("long").as("cents"))
      .withWatermark("ts", watermark)
      .as[DigestEvent]
      .groupByKey(_.user_id)
      .transformWithState(new SessionDigestProcessor(gapSeconds * 1000L),
        TimeMode.EventTime(), OutputMode.Append(),
        Encoders.product[SessionDigest])
  }

  case class TrailStat(user_id: Long, n_in_trail: Long, trail_cents: Long,
      trail_max_cents: Long)

  /** Bounded recent-activity trail per key via LIST STATE — the third
    * and last `transformWithState` state shape next to the ValueState
    * accumulator and the MapState counters: the state holds the most
    * recent [[TrailLen]] amounts per user (append + rewrite-trimmed, so
    * it is O(TrailLen) per key regardless of stream length — the
    * "last-N purchases" feature window a fraud heuristic reads), and
    * each input batch emits the trailing count/sum/max.
    */
  val TrailLen = 5

  class SpendTrailProcessor
      extends StatefulProcessor[Long, SpendEvent, TrailStat] {

    @transient private var trail: org.apache.spark.sql.streaming.ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      trail = getHandle.getListState[Long](
        "trail", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[SpendEvent],
        timerValues: TimerValues): Iterator[TrailStat] = {
      rows.foreach(e => trail.appendValue(e.amount_cents))
      val kept = trail.get().toArray.takeRight(TrailLen)
      trail.put(kept) // trim: state stays O(TrailLen) per key
      Iterator.single(TrailStat(key, kept.length.toLong, kept.sum, kept.max))
    }
  }

  /** Streaming last-N spend trail: input needs `user_id` and
    * `amount_cents`; emits one [[TrailStat]] per key per micro-batch
    * that saw input (Update mode, deterministic clock-free TimeMode).
    */
  def spendTrail(events: DataFrame): Dataset[TrailStat] = {
    import events.sparkSession.implicits._
    events
      .select(col("user_id").cast("long").as("user_id"),
        col("amount_cents").cast("long").as("amount_cents"))
      .as[SpendEvent]
      .groupByKey(_.user_id)
      .transformWithState(new SpendTrailProcessor(),
        TimeMode.None(), OutputMode.Update(), Encoders.product[TrailStat])
  }
}
