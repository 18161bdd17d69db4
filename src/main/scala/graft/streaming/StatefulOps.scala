package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

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
}
