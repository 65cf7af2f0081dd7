package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event row for the typed streaming operators. */
case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                 event_type: String, value: Double)

/** Emitted per flagged event by [[EventStreams.anomalyStream]]. */
case class Anomaly(event_id: Long, event_type: String, value: Double, z: Double)

private case class MomentState(n: Long, s1: Double, s2: Double)

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

  /** Streaming distinct active users per tumbling window via the HLL++
    * sketch behind `approx_count_distinct` — the streaming sibling of the
    * batch `hll_daily_users_events` rollup. Exact streaming distinct would
    * need per-user state (unbounded); the sketch keeps a few KB per window
    * regardless of user cardinality, and the watermark expires window state
    * — the only formulation that is safe on an unbounded stream. */
  def distinctUsersStream(events: DataFrame, watermark: String = "2 hours",
                          rsd: Double = 0.05): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(approx_count_distinct(col("user_id"), rsd).as("est_users"),
        count(lit(1)).as("n_events"))
      .select(col("window.start").as("hour"), col("est_users"), col("n_events"))

  /** Stream-static enrichment: join the event stream against a slowly
    * changing dimension table (user profile, geo lookup, model-version
    * routing) with an explicit broadcast of the static side — the standard
    * "decorate the firehose" stage in front of every keyed aggregation.
    *
    * Scale: the broadcast join is stateless (no watermark, no state store,
    * no shuffle of the stream side) — each micro-batch maps through the
    * hashed dim, so throughput is scan-bound. The static plan is re-read
    * per micro-batch by Structured Streaming, which is what makes a
    * periodically rewritten dim table pick up without a restart; a
    * dimension too big to broadcast drops the hint and becomes a shuffled
    * join per micro-batch (still stateless). `how = "left"` keeps events
    * whose key is missing from the dim (nulls flag coverage gaps). */
  def enrichStream(events: DataFrame, dim: DataFrame, key: String,
                   how: String = "left"): DataFrame =
    events.join(broadcast(dim), Seq(key), how)

  /** Stream-static POINT-IN-TIME enrichment: each event joins the SCD2
    * dimension version valid AT ITS EVENT TIME (`valid_from_ms ≤ ts <
    * valid_to_ms`, null valid_to = current) — the streaming face of the
    * batch as-of lookup, and the difference between "decorate with today's
    * dim" and "decorate with the dim as it was when the event happened"
    * (what training-data reproducibility actually needs: replaying
    * yesterday's events must yield yesterday's features).
    *
    * Scale: stateless like [[enrichStream]] — the versioned dim broadcasts
    * (versions multiply the dim, not the stream), the validity range is a
    * join residual on the equi key, and the static side re-reads per
    * micro-batch so newly applied [[graft.dist.Scd]] batches are picked up
    * without a restart. */
  def enrichAsOfStream(events: DataFrame, dim: DataFrame, key: String,
                       dimKey: String): DataFrame = {
    // frame-qualified references: a dim sharing the stream's key or ts
    // column name (the natural Scd-maintained shape) must not make the
    // join condition ambiguous
    val tsMs = unix_millis(events("ts").cast("timestamp"))
    events.join(broadcast(dim),
      events(key) === dim(dimKey) &&
        tsMs >= dim("valid_from_ms") &&
        (dim("valid_to_ms").isNull || tsMs < dim("valid_to_ms")),
      "left")
  }

  /** Streaming exact dedup: first occurrence of each key wins; watermark
    * expires the seen-set state. This is the streaming face of
    * Dedup.dropExactDups (built-in stateful dropDuplicates — no custom
    * state needed, per the compose-built-ins-first rule). */
  def dedupStream(events: DataFrame, keyCols: Seq[String], watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Stream-stream interval join: each click joined to the SAME user's views
    * within the preceding `lookbackMinutes` (inclusive on both ends) — the
    * streaming face of the batch as-of join (`Joins.asOfJoin`), except a
    * stream cannot wait for "the latest" match, so it emits ALL views in the
    * window (inner join; unmatched clicks drop).
    *
    * Scale/state: watermarks on BOTH sides plus the time-range condition let
    * Spark expire buffered rows — view state is bounded by
    * watermark + lookback, click state by the watermark; without the range
    * condition the join state would grow forever. Both inputs shuffle on
    * user_id; self-join of one source stream is fine (two filtered views,
    * independent state stores). */
  def clickViewJoin(events: DataFrame, lookbackMinutes: Int = 30,
                    watermark: String = "1 hour"): DataFrame = {
    val clicks = events.where(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id"))
      .withWatermark("click_ts", watermark)
    val views = events.where(col("event_type") === "view")
      .select(col("user_id").as("v_user_id"), col("ts").as("view_ts"),
        col("event_id").as("view_id"), col("value").as("view_value"))
      .withWatermark("view_ts", watermark)
    clicks.join(views,
      col("user_id") === col("v_user_id") &&
        col("view_ts") <= col("click_ts") &&
        col("view_ts") >= col("click_ts") - expr(s"INTERVAL $lookbackMinutes MINUTES"))
      .select(col("click_id"), col("user_id"), col("click_ts"),
        col("view_id"), col("view_ts"), col("view_value"))
  }

  /** LEFT OUTER variant of [[clickViewJoin]]: every click survives — the
    * attribution-complete face ("how many clicks had NO preceding view?"
    * is unanswerable under the inner join). Distinct semantics class:
    * a matched click emits immediately like the inner join, but an
    * UNMATCHED click can only emit once the view-side watermark passes the
    * end of its lookback window (proving no match can still arrive) — so
    * null-padded rows trail the data by the watermark, and a stop/restart
    * must not lose or double-emit them (state-store backed, tested with a
    * checkpointed restart in EventStreamsSpec). Same bounded-state
    * reasoning as the inner join: both sides expire on
    * watermark + lookback. */
  def clickViewJoinOuter(events: DataFrame, lookbackMinutes: Int = 30,
                         watermark: String = "1 hour"): DataFrame = {
    val clicks = events.where(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id"))
      .withWatermark("click_ts", watermark)
    val views = events.where(col("event_type") === "view")
      .select(col("user_id").as("v_user_id"), col("ts").as("view_ts"),
        col("event_id").as("view_id"), col("value").as("view_value"))
      .withWatermark("view_ts", watermark)
    clicks.join(views,
        col("user_id") === col("v_user_id") &&
          col("view_ts") <= col("click_ts") &&
          col("view_ts") >= col("click_ts") - expr(s"INTERVAL $lookbackMinutes MINUTES"),
        "leftOuter")
      .select(col("click_id"), col("user_id"), col("click_ts"),
        col("view_id"), col("view_ts"), col("view_value"))
  }

  /** Streaming distribution-drift monitor: per event-time window, bin the
    * value column (same closed-last-bucket semantics as the batch engine,
    * via one [[graft.functions.HistogramAgg]] vector per window) and report
    * the total-variation distance against a REFERENCE histogram — the
    * data-quality alarm that catches a feed's distribution shifting.
    *
    * Streaming face of `Stats.distributionDistance` with one side pinned to
    * a literal reference. State = one fixed-width count vector per open
    * window (watermark-bounded); the TVD arithmetic is a pure expression
    * over the aggregated vector, so each window emits exactly once
    * (append mode) when the watermark closes it. */
  def driftStream(events: DataFrame, valueCol: String, edges: Seq[Double],
                  refCounts: Seq[Long], windowDur: String = "1 hour",
                  watermark: String = "2 hours"): DataFrame = {
    graft.dist.Binning.validateEdges(edges)
    require(refCounts.size == edges.size - 1, "refCounts must have one entry per bin")
    require(refCounts.sum > 0, "reference histogram is empty")
    val x = col(valueCol).cast("double")
    val tot = aggregate(col("cnts"), lit(0L), (a, c) => a + c).cast("double")
    val ref = typedLit(refCounts.map(_.toDouble))
    val refTot = lit(refCounts.sum.toDouble)
    val tvd = aggregate(
      zip_with(col("cnts"), ref, (c, r) => abs(c.cast("double") / tot - r / refTot)),
      lit(0.0), (a, t) => a + t) * lit(0.5)
    events.withWatermark("ts", watermark)
      .where(x.isNotNull && !isnan(x) && x >= lit(edges.head) && x <= lit(edges.last))
      .groupBy(window(col("ts"), windowDur))
      .agg(graft.functions.HistogramAgg.hist_counts(x, edges).as("cnts"))
      .select(col("window.start").as("win_start"),
        tot.cast("long").as("n_events"), tvd.as("tvd"))
  }

  /** Streaming PSI drift monitor: per event-time window, bin the value
    * column and report the Population Stability Index against a REFERENCE
    * histogram — the sibling of [[driftStream]] with the ML-ops drift
    * metric instead of TVD (conventional reading: <0.1 stable, 0.1–0.25
    * moderate, >0.25 drifted). Same Laplace smoothing and per-term
    * 9-decimal rounding contract as the batch
    * [[graft.dist.Stats.psiMatrix]], so window scores are reproducible
    * across engines and restarts. State = one fixed-width count vector per
    * open window; append-mode exactly-once per closed window. */
  def psiDriftStream(events: DataFrame, valueCol: String, edges: Seq[Double],
                     refCounts: Seq[Long], windowDur: String = "1 hour",
                     watermark: String = "2 hours",
                     eps: Double = 0.5): DataFrame = {
    graft.dist.Binning.validateEdges(edges)
    require(refCounts.size == edges.size - 1, "refCounts must have one entry per bin")
    require(refCounts.sum > 0, "reference histogram is empty")
    require(eps > 0, "eps must be > 0 (smoothing guards ln(0))")
    val nBins = edges.size - 1
    val x = col(valueCol).cast("double")
    val tot = aggregate(col("cnts"), lit(0L), (a, c) => a + c).cast("double")
    val refTot = lit(refCounts.sum.toDouble + nBins * eps)
    val ref = typedLit(refCounts.map(_.toDouble))
    val psi = aggregate(
      zip_with(col("cnts"), ref, (c, r) => {
        val p = (c.cast("double") + lit(eps)) / (tot + lit(nBins * eps))
        val q = (r + lit(eps)) / refTot
        round((p - q) * log(p / q), 9).cast("decimal(19,9)")
      }),
      lit(0).cast("decimal(28,9)"), (a, t) => (a + t).cast("decimal(28,9)"))
    events.withWatermark("ts", watermark)
      .where(x.isNotNull && !isnan(x) && x >= lit(edges.head) && x <= lit(edges.last))
      .groupBy(window(col("ts"), windowDur))
      .agg(graft.functions.HistogramAgg.hist_counts(x, edges).as("cnts"))
      .select(col("window.start").as("win_start"),
        tot.cast("long").as("n_events"), psi.cast("double").as("psi"))
  }

  /** Streaming data-quality gate: per event-time tumbling window, evaluate
    * the ROW-LOCAL subset of [[graft.dist.Checks]] rules (null / range /
    * predicate — uniqueness and referential integrity need unbounded state
    * and stay batch-side) as conditional counts inside one windowed
    * aggregate, and emit a verdict row per (window, rule) with the same
    * metric/pass semantics as the batch gate. The alarm face of
    * `Checks.validate`: a feed whose violation rate crosses a rule's
    * tolerance flips `pass` to false in that window.
    *
    * State = one count pair per (open window × rule) — rule-count-bounded,
    * watermark-closed, append-mode exactly-once per window. */
  def qualityGateStream(events: DataFrame, checks: Seq[graft.dist.Checks.Check],
                        windowDur: String = "1 hour",
                        watermark: String = "2 hours"): DataFrame = {
    val rowLocal = checks.flatMap(c =>
      graft.dist.Checks.isViolated(events, c).map(c -> _))
    // reject rather than silently drop: a caller passing Unique/SubsetOf
    // would otherwise believe those rules are being gated when they are
    // never evaluated (they need unbounded state — batch-side only)
    require(rowLocal.size == checks.size,
      "qualityGateStream accepts only row-local rules (null/range/predicate); " +
        "got: " + checks.filterNot(c =>
          graft.dist.Checks.isViolated(events, c).isDefined)
          .map(_.name).mkString(", "))
    val (aggs, entries) = graft.dist.Checks.ruleCounts(rowLocal)
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("window.start").as("win_start"),
        explode(array(entries: _*)).as("e"))
      .select(col("win_start"), col("e.check").as("check"),
        col("e.n_rows").as("n_rows"), col("e.n_violations").as("n_violations"),
        (col("e.n_violations").cast("double") / col("e.n_rows") <= col("e.tol"))
          .as("pass"))
  }

  /** Streaming z-score anomaly detection: per event type, maintain running
    * moments (count, Σx, Σx²) in keyed state and flag each arriving event
    * whose z-score against the moments SO FAR exceeds `zThresh` — the
    * streaming face of the batch `Stats.zscoreOutliers`. An online detector
    * necessarily scores against the past (the batch query scores against the
    * full dataset), so `minN` warm-up samples gate flagging and zero-variance
    * history flags nothing.
    *
    * Scale/state: state is THREE doubles per event type (fixed size — no
    * watermark needed to bound it; NoTimeout keeps the microbatch loop
    * quiescent). Events shuffle once on the type key; within a batch the
    * group iterator is folded in (ts, event_id) order so replays are
    * deterministic. */
  def anomalyStream(events: Dataset[Event], zThresh: Double = 3.0,
                    minN: Long = 30): Dataset[Anomaly] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState[MomentState, Anomaly](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (etype, it, state: GroupState[MomentState]) =>
          var st = state.getOption.getOrElse(MomentState(0L, 0.0, 0.0))
          val out = scala.collection.mutable.ArrayBuffer.empty[Anomaly]
          for (ev <- it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))) {
            if (st.n >= minN) {
              val mean = st.s1 / st.n
              val variance = st.s2 / st.n - mean * mean
              if (variance > 0) {
                val z = (ev.value - mean) / math.sqrt(variance)
                if (math.abs(z) >= zThresh) out += Anomaly(ev.event_id, etype, ev.value, z)
              }
            }
            st = MomentState(st.n + 1, st.s1 + ev.value, st.s2 + ev.value * ev.value)
          }
          state.update(st)
          out.iterator
      }
  }

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
      .flatMapGroupsWithState[Seq[SessionState], SessionSummary](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, it, state: GroupState[Seq[SessionState]]) =>
          def summary(s: SessionState) = SessionSummary(userId, s.nEvents,
            new java.sql.Timestamp(s.startMs), new java.sql.Timestamp(s.endMs), s.totalValue)
          // State = the user's DISJOINT session set (the same shape Spark's
          // session_window state store keeps). Each event merges every
          // session it touches within the gap ON EITHER SIDE — so a late
          // (within-watermark) event can extend a session backwards, bridge
          // two sessions into one, or open its own — and NOTHING is emitted
          // until the watermark passes a session's end + gap, at which point
          // no in-order event can reach it anymore. Emitting eagerly on an
          // intra-batch gap (the previous design) finalized sessions that a
          // late event could still legally join.
          var sessions: Seq[SessionState] = state.getOption.getOrElse(Nil)
          for (ev <- it.toSeq.sortBy(_.ts.getTime)) {
            val t = ev.ts.getTime
            val (touching, rest) = sessions.partition(
              s => t >= s.startMs - gapMs && t <= s.endMs + gapMs)
            val merged = touching.foldLeft(SessionState(1L, t, t, ev.value)) { (acc, s) =>
              SessionState(acc.nEvents + s.nEvents, math.min(acc.startMs, s.startMs),
                math.max(acc.endMs, s.endMs), acc.totalValue + s.totalValue)
            }
            sessions = merged +: rest
          }
          val wm = state.getCurrentWatermarkMs()
          val (done, live) = sessions.partition(_.endMs + gapMs <= wm)
          if (live.isEmpty) state.remove()
          else {
            state.update(live)
            // wake when the watermark passes the earliest live session's close
            state.setTimeoutTimestamp(math.max(live.map(_.endMs + gapMs).min, wm + 1))
          }
          done.sortBy(_.startMs).map(summary).iterator
      }
  }
}
