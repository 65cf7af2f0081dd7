package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event row for the typed streaming operators. */
case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                 event_type: String, value: Double)

/** Emitted per closed session by [[EventStreams.sessionize]]. */
case class SessionSummary(user_id: Long, n_events: Long, start: java.sql.Timestamp,
                          end: java.sql.Timestamp, total_value: Double)

private case class SessionState(nEvents: Long, startMs: Long, endMs: Long, totalValue: Double)

/** Structured Streaming operators over the events stream — the streaming
  * siblings of the batch window queries in SparkEntry. The reference library
  * is strictly batch (SURVEY.md §2.2); these exist because a Spark-native
  * engine gets streaming semantics (watermarks, state stores, exactly-once
  * sinks) from the same declarative plans.
  *
  * Scale notes: every operator here is keyed-state over a shuffled key
  * (window × type, doc hash, user), so it scales horizontally with executors;
  * watermarks bound state size, which is what makes unbounded streams safe.
  */
object EventStreams {

  /** Streaming hourly tumbling counts + mean value per event type, with a
    * watermark bounding late data and state. Batch equivalent:
    * SparkEntry "events_hourly_tumbling". */
  def hourlyTumbling(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        (sum(col("value").cast("decimal(18,6)")).cast("double") / count(lit(1))).as("avg_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n_events"), col("avg_value"))

  /** Streaming histogram: the reference's core operator (fixed-boundary
    * binning, graft.dist.Binning.binId — identical closed-last-bucket
    * semantics) over an unbounded stream, complete-mode counts per bin.
    * The same declarative binning expression serves batch and stream —
    * that is the point of building the engine Spark-native. */
  def histogramStream(events: DataFrame, valueCol: String, edges: Seq[Double]): DataFrame = {
    graft.dist.Binning.validateEdges(edges)
    val x = col(valueCol).cast("double")
    events
      .where(x.isNotNull && !isnan(x) && x >= lit(edges.head) && x <= lit(edges.last))
      .groupBy(graft.dist.Binning.binId(x, edges).as("bin_id"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Streaming exact dedup: first occurrence of each key wins; watermark
    * expires the seen-set state. This is the streaming face of
    * Dedup.dropExactDups (built-in stateful dropDuplicates — no custom
    * state needed, per the compose-built-ins-first rule). */
  def dedupStream(events: DataFrame, keyCols: Seq[String], watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Per-user sessionization with custom state (flatMapGroupsWithState):
    * events within `gapMinutes` of each other (event time) belong to one
    * session; a session closes either when a later event breaks the gap or
    * when the WATERMARK passes session end + gap (event-time timeout), and
    * emits one summary row. The custom-state tier exists for semantics
    * built-ins can't express — session windows with per-group lifecycle.
    *
    * Event-time (not processing-time) timeouts on purpose: state lifecycle
    * follows the data's own clock, replays deterministically from a
    * checkpoint, and the microbatch loop stays quiescent between arrivals
    * (a processing-time timeout forces continuous empty batches). */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30,
                 watermarkDelay: String = "10 minutes"): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionSummary](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, it, state: GroupState[SessionState]) =>
          def summary(s: SessionState) = SessionSummary(userId, s.nEvents,
            new java.sql.Timestamp(s.startMs), new java.sql.Timestamp(s.endMs), s.totalValue)
          if (state.hasTimedOut) {
            val closed = summary(state.get)
            state.remove()
            Iterator(closed)
          } else {
            val evs = it.toSeq
            if (evs.isEmpty) Iterator.empty
            else {
              // Fold events in event-time order, splitting on every gap —
              // including gaps INSIDE this batch (a replay/catch-up batch can
              // carry hours of history) — so results match the batch
              // session_window semantics. Late events that still land inside
              // the open session extend its start (math.min), matching what
              // the batch equivalent computes over the full data.
              val sorted = evs.sortBy(_.ts.getTime)
              val closed = scala.collection.mutable.Buffer.empty[SessionSummary]
              var cur = state.getOption
              for (ev <- sorted) {
                val t = ev.ts.getTime
                cur = cur match {
                  case Some(s) if t - s.endMs <= gapMs =>
                    Some(SessionState(s.nEvents + 1, math.min(s.startMs, t),
                      math.max(s.endMs, t), s.totalValue + ev.value))
                  case Some(s) =>
                    closed += summary(s)
                    Some(SessionState(1L, t, t, ev.value))
                  case None =>
                    Some(SessionState(1L, t, t, ev.value))
                }
              }
              val open = cur.get
              state.update(open)
              // close when the watermark passes session end + gap
              state.setTimeoutTimestamp(math.max(
                open.endMs + gapMs, state.getCurrentWatermarkMs() + 1))
              closed.iterator
            }
          }
      }
  }
}
