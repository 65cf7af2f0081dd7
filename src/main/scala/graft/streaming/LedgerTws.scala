package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** One ledger row per update: running per-user totals while the user is
  * active (`closed = false`), then a final row when the user's quiet-period
  * timer fires (`closed = true`) and the state clears. */
case class LedgerUpdate(user_id: Long, n_events: Long, total_value: Double,
                        n_types: Long, closed: Boolean)

/** Per-user activity ledger on the Spark 4 `transformWithState` API — the
  * successor of `flatMapGroupsWithState` ([[EventStreams.sessionize]] stays
  * on the classic API deliberately, so the engine exercises both):
  *
  *   - MULTIPLE typed state variables per key (a ValueState running
  *     aggregate + a MapState of per-event-type counts) instead of one
  *     monolithic state object — each updated independently, so a
  *     high-cardinality map member doesn't rewrite the scalar aggregate;
  *   - EXPLICIT event-time timers (`registerTimer`/`handleExpiredTimer`)
  *     in place of the single per-key timeout: one live deadline per user
  *     here, re-armed on every batch (delete + register);
  *   - requires the RocksDB state store provider
  *     (`spark.sql.streaming.stateStore.providerClass` =
  *     `...state.RocksDBStateStoreProvider`) — which is also the right
  *     production store at 100 TB key cardinality: state lives off-heap /
  *     on-disk per executor, checkpointed incrementally via changelog.
  *
  * Semantics: every micro-batch with events for a user emits one updated
  * ledger row (`closed = false`); when the event-time watermark passes the
  * user's last event + `quietMs`, the timer fires, the final row emits with
  * `closed = true`, and all state for the key clears — the
  * "customer went dormant, close out the running totals" pattern. */
class UserLedgerProcessor(quietMs: Long)
    extends StatefulProcessor[Long, Event, LedgerUpdate] {

  @transient private var agg: ValueState[(Long, Double, Long)] = _ // (n, total, lastTs)
  @transient private var types: MapState[String, Long] = _
  @transient private var deadline: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    agg = getHandle.getValueState("agg",
      Encoders.product[(Long, Double, Long)], TTLConfig.NONE)
    types = getHandle.getMapState("types",
      Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    deadline = getHandle.getValueState("deadline",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[Event],
                               timers: TimerValues): Iterator[LedgerUpdate] = {
    var (n, tot, lastTs) = if (agg.exists()) agg.get() else (0L, 0.0, Long.MinValue)
    rows.foreach { e =>
      n += 1
      tot += e.value
      lastTs = math.max(lastTs, e.ts.getTime)
      val t = e.event_type
      types.updateValue(t, (if (types.containsKey(t)) types.getValue(t) else 0L) + 1L)
    }
    agg.update((n, tot, lastTs))
    // one live deadline per key: re-arm on every batch with activity
    if (deadline.exists()) getHandle.deleteTimer(deadline.get())
    getHandle.registerTimer(lastTs + quietMs)
    deadline.update(lastTs + quietMs)
    Iterator.single(LedgerUpdate(key, n, tot, types.keys().size.toLong, closed = false))
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
                                  expired: ExpiredTimerInfo): Iterator[LedgerUpdate] = {
    val (n, tot, _) = if (agg.exists()) agg.get() else (0L, 0.0, 0L)
    val nTypes = types.keys().size.toLong
    agg.clear(); types.clear(); deadline.clear()
    Iterator.single(LedgerUpdate(key, n, tot, nTypes, closed = true))
  }
}

object LedgerTws {

  /** Wire the processor: watermarked typed events, keyed by user, event-time
    * timers, update output. The caller's session must use the RocksDB state
    * store provider (see class doc). */
  def userLedger(events: Dataset[Event], quietMinutes: Int = 30,
                 watermark: String = "1 hour"): Dataset[LedgerUpdate] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .transformWithState(new UserLedgerProcessor(quietMinutes * 60000L),
        TimeMode.EventTime(), OutputMode.Update())
  }
}
