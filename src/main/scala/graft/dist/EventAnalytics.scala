package graft.dist

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-funnel and cohort-retention analytics over an events table
  * (user_id, ts, event_type) — the interactive-analytics queries a
  * data-curation/product team runs next to the distribution tooling.
  *
  * Both operators reduce events to slim (user, timestamp) rows before any
  * shuffle, aggregate with map-side combine, and never collect to the
  * driver; group cardinality is users (funnel/retention) or
  * cohorts × day-offsets (the retention matrix), so the output side is tiny
  * relative to the scan. */
object EventAnalytics {

  /** Ordered 3-step funnel with strictly sequential semantics: per user,
    * the first `steps(0)` event, then the first `steps(1)` AT OR AFTER it,
    * then the first `steps(2)` at or after THAT; the final step must land
    * within `windowSeconds` of step 1 to count as converted. Output: one
    * row per step with the surviving user count.
    *
    * Three passes by construction — step k's anchor is undefined until step
    * k-1 resolves (a single-agg formulation would need the user's full
    * sorted event list in memory: unbounded). Each pass shuffles only
    * (user_id, ts) pairs filtered to one event type, and every join key is
    * user_id, so AQE coalesces the (already slim) exchanges. */
  def funnel(events: DataFrame, steps: Seq[String] = Seq("view", "click", "purchase"),
             windowSeconds: Long = 3600L): DataFrame = {
    require(steps.size == 3, "funnel expects exactly 3 steps")
    val v = events.where(col("event_type") === steps(0))
      .groupBy("user_id").agg(min(col("ts")).as("v_ts"))
    val c = events.where(col("event_type") === steps(1))
      .join(v, Seq("user_id"))
      .where(col("ts") >= col("v_ts"))
      .groupBy("user_id").agg(min(col("ts")).as("c_ts"), max(col("v_ts")).as("v_ts"))
    val p = events.where(col("event_type") === steps(2))
      .join(c, Seq("user_id"))
      .where(col("ts") >= col("c_ts"))
      .groupBy("user_id").agg(min(col("ts")).as("p_ts"), max(col("v_ts")).as("v_ts"))
    val converted = p.where(
      unix_micros(col("p_ts")) - unix_micros(col("v_ts")) <= windowSeconds * 1000000L)
    v.agg(count(lit(1)).as("n_users")).select(lit(s"step1_${steps(0)}").as("step"), col("n_users"))
      .unionAll(c.agg(count(lit(1)).as("n_users"))
        .select(lit(s"step2_${steps(1)}").as("step"), col("n_users")))
      .unionAll(converted.agg(count(lit(1)).as("n_users"))
        .select(lit(s"step3_${steps(2)}_in_window").as("step"), col("n_users")))
      .orderBy("step")
  }

  /** Top-k session paths: sessionize per user (30-min gaps-and-islands),
    * render each session as its ordered `a>b>c` event-type sequence, count
    * identical paths corpus-wide — the "how do users actually move through
    * the product" query.
    *
    * Determinism: the per-session gather sorts by (ts, event_id) structs
    * (collect_list alone is arrival-ordered), and path counting is exact
    * integers with a lexicographic tie-break at the k boundary.
    * Scale: windows and gathers carry slim (user, ts, id, type) rows;
    * per-session arrays are bounded by session length — inherent to path
    * analysis, which needs the ordered sequence. */
  def topSessionPaths(events: DataFrame, gapMinutes: Int = 30, k: Int = 20): DataFrame = {
    graft.functions.SessionTuning.ensureActiveSession()
    sessionized(events, gapMinutes).groupBy("user_id", "sess")
      .agg(sort_array(collect_list(struct(col("ts"), col("event_id"), col("event_type")))).as("evs"))
      .select(concat_ws(">", transform(col("evs"), _.getField("event_type"))).as("path"))
      .groupBy("path").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("path").asc)
      .limit(k)
  }

  /** Gap-based sessionization shared by [[topSessionPaths]] and
    * [[firstTouchAttribution]] (and mirrored verbatim by their SQL
    * oracles): a session breaks when the gap to the user's previous event
    * exceeds `gapMinutes` (strict >, micros arithmetic); the session id is
    * the running count of breaks. One user-keyed sort window over slim
    * (user, ts, id, type) rows. */
  private def sessionized(events: DataFrame, gapMinutes: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gapMicros = gapMinutes * 60000000L
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev", lag(col("ts"), 1).over(byUser))
      .withColumn("brk",
        when(col("prev").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev")) > gapMicros, 1L).otherwise(0L))
      .withColumn("sess", sum(col("brk")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** First-touch attribution: every conversion event (`convType`) is
    * credited to the FIRST event type of its session (30-min-gap
    * sessionization, same break rule as [[topSessionPaths]]). Output: one
    * row per first-touch channel with its conversion count — "which entry
    * behavior leads to purchases".
    *
    * Shape: one user-keyed sort window computes both the session id (gap
    * cumsum) and, per session, the first event type (`first_value` over the
    * same window — no second shuffle, the window partitioning is reused);
    * the conversion filter then feeds a tiny per-channel count. */
  def firstTouchAttribution(events: DataFrame, convType: String = "purchase",
                            gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bySess = Window.partitionBy("user_id", "sess")
      .orderBy(col("ts"), col("event_id"))
    sessionized(events, gapMinutes)
      .withColumn("first_touch", first(col("event_type")).over(bySess))
      .where(col("event_type") === convType)
      .groupBy(col("first_touch"))
      .agg(count(lit(1)).as("n_conversions"))
      .orderBy("first_touch")
  }

  /** Exponentially weighted moving average of the last `k` values per user
    * (event-time order, event_id tiebreak): the trailing-frame EWMA —
    * the fold restarts from the frame's oldest value, so it equals the
    * classic full-history EWMA for users with ≤ k events and a k-windowed
    * restart beyond that. Bounding the frame is what makes the operator
    * scale: state per row is k values, independent of history length, and
    * the weight of anything older than k frames is ≤ (1−α)^k anyway.
    *
    * The fold `s ← α·x + (1−α)·s` runs left-to-right over the frame array
    * (`aggregate` higher-order function, seeded with the first element) —
    * the identical operation order DuckDB's `list_reduce` applies, so the
    * result is bit-exact cross-engine with NO rounding at the boundary.
    * One user-keyed shuffle, k-bounded per-row work. */
  def ewma(events: DataFrame, valueCol: String = "value",
           alpha: Double = 0.3, k: Int = 10): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0,1]")
    require(k >= 1, "k must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-(k - 1), 0)
    val x = col(valueCol).cast("double")
    events.where(x.isNotNull && !isnan(x))
      .withColumn("window_vals", collect_list(x).over(w)) // frame order
      .select(col("event_id"), col("user_id"), x.as(valueCol),
        expr(s"""aggregate(slice(window_vals, 2, size(window_vals)),
                |          element_at(window_vals, 1),
                |          (s, x) -> $alpha * x + ${1 - alpha} * s)""".stripMargin)
          .as("ewma"))
  }

  /** Event-type transition matrix: for consecutive events of the same user
    * within `maxGapMinutes`, count each (from_type, to_type) pair — the
    * Markov-chain view of user behavior. One window of slim rows, exact
    * counts, no session materialization. */
  def transitionMatrix(events: DataFrame, maxGapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gapMs = maxGapMinutes * 60000000L
    events.select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .where(col("prev_type").isNotNull &&
        unix_micros(col("ts")) - unix_micros(col("prev_ts")) <= gapMs)
      .groupBy(col("prev_type").as("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
      .orderBy("from_type", "to_type")
  }

  /** Association rules over unordered per-user item sets (market-basket for
    * event types, product categories, feature flags): for every item pair
    * with at least one co-user, the support, both directional confidences,
    * and the lift — the "users who do A also do B" readout.
    *
    * Scale shape: ONE distinct pass to (user, item), then per-user item
    * sets gather via `collect_set` — bounded by ITEM cardinality
    * (categorical by assumption), never by event volume — and pairs expand
    * inside the array. Counts are exact integers; each ratio is a single
    * double division over integer operands (lift multiplies integers
    * first), so results are bit-deterministic under any partitioning. */
  def assocRules(events: DataFrame, userCol: String = "user_id",
                 itemCol: String = "event_type"): DataFrame = {
    graft.functions.SessionTuning.ensureActiveSession()
    val ui = events.select(col(userCol).as("u"), col(itemCol).cast("string").as("i"))
      .where(col("u").isNotNull && col("i").isNotNull).distinct()
    val nUsers = ui.agg(countDistinct(col("u")).as("n_users"))
    val itemCounts = ui.groupBy(col("i")).agg(count(lit(1)).as("n_i"))
    val pairs = ui.groupBy("u")
      .agg(sort_array(collect_set(col("i"))).as("items"))
      .select(explode(flatten(transform(col("items"), a =>
        transform(filter(col("items"), b => a < b),
          b => struct(a.as("item_a"), b.as("item_b")))))).as("p"))
      .groupBy(col("p.item_a").as("item_a"), col("p.item_b").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(itemCounts.toDF("item_a", "n_a"), Seq("item_a"))
      .join(itemCounts.toDF("item_b", "n_b"), Seq("item_b"))
      .crossJoin(nUsers)
      .select(col("item_a"), col("item_b"), col("n_a"), col("n_b"),
        col("n_ab"), col("n_users"),
        (col("n_ab").cast("double") / col("n_users")).as("support"),
        (col("n_ab").cast("double") / col("n_a")).as("conf_ab"),
        (col("n_ab").cast("double") / col("n_b")).as("conf_ba"),
        ((col("n_ab") * col("n_users")).cast("double") /
          (col("n_a") * col("n_b")).cast("double")).as("lift"))
      .orderBy("item_a", "item_b")
  }

  /** Inter-arrival statistics per event type: consecutive same-(user, type)
    * gaps in seconds — count, decimal-exact mean, and exact p50/p90 — the
    * cadence audit behind session-gap and watermark tuning.
    *
    * Shape: one lag window over slim (user, type, ts, tie) rows keyed by
    * (user, type), then a per-type aggregate; gaps are exact integer
    * microseconds until the final divisions. The exact `percentile` is the
    * verifier tier (sort-agg per group); at 100 TB swap
    * `approx_percentile` into the same shape. */
  def interarrivalStats(events: DataFrame): DataFrame = {
    graft.functions.SessionTuning.ensureActiveSession()
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts"), col("event_id"))
    val gaps = events
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .where(col("prev_us").isNotNull)
      .select(col("event_type"),
        (unix_micros(col("ts")) - col("prev_us")).as("gap_us"))
    gaps.groupBy("event_type")
      .agg(count(lit(1)).as("n_gaps"),
        (sum(col("gap_us").cast("decimal(28,0)")).cast("double") /
          count(lit(1)) / lit(1000000.0)).as("mean_gap_s"),
        (expr("percentile(gap_us, 0.5)") / lit(1000000.0)).as("p50_gap_s"),
        (expr("percentile(gap_us, 0.9)") / lit(1000000.0)).as("p90_gap_s"))
      .orderBy("event_type")
  }

  /** Cohort retention matrix: cohort = the user's first active calendar day;
    * for each (cohort, day-offset) cell, the number of distinct users from
    * that cohort active that many days later. Day 0 counts the cohort size.
    *
    * Shape: first-day agg per user (slim), join back on user_id, distinct
    * (user, cohort, offset), count — two shuffles of (user, day) pairs and
    * one of the tiny matrix. */
  def retention(events: DataFrame): DataFrame = {
    val firstDay = events.groupBy("user_id")
      .agg(min(date_trunc("day", col("ts"))).as("cohort"))
    events.join(firstDay, Seq("user_id"))
      .select(col("user_id"), col("cohort"),
        datediff(date_trunc("day", col("ts")).cast("date"), col("cohort").cast("date"))
          .as("day_offset"))
      .distinct()
      .groupBy(unix_millis(col("cohort")).as("cohort_ms"), col("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_ms", "day_offset")
  }

  /** Feed-outage detection: per event type, the silent intervals longer
    * than `minGapSeconds` between consecutive events — the monitoring
    * primitive that distinguishes "the metric dropped" from "the feed
    * stopped". One type-keyed sort window over (type, ts) pairs; gap
    * arithmetic in exact micros. Output: (event_type, gap_start_ms,
    * gap_end_ms, gap_s) per detected outage. */
  def feedGaps(events: DataFrame, minGapSeconds: Long = 3600L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(minGapSeconds > 0, "minGapSeconds must be > 0")
    val byType = Window.partitionBy("event_type").orderBy(col("ts"), col("event_id"))
    events
      .where(col("event_type").isNotNull)
      .select(col("event_type"), col("ts"), col("event_id"))
      .withColumn("prev", lag(col("ts"), 1).over(byType))
      .where(col("prev").isNotNull &&
        unix_micros(col("ts")) - unix_micros(col("prev")) > minGapSeconds * 1000000L)
      .select(col("event_type"),
        unix_millis(col("prev")).as("gap_start_ms"),
        unix_millis(col("ts")).as("gap_end_ms"),
        ((unix_micros(col("ts")) - unix_micros(col("prev"))) / lit(1000000.0))
          .as("gap_s"))
      .orderBy("event_type", "gap_start_ms")
  }

  /** Seasonal (hour-of-day) anomaly detection: baseline mean/variance per
    * (event_type, hour-of-day) cell from exact decimal power sums, then
    * every event is z-scored against ITS OWN cell — "a metric value normal
    * at peak hour is anomalous at 3 AM". The same exact-sum arithmetic as
    * [[Stats.zscoreOutliers]] so results are bit-deterministic and
    * cross-engine comparable; z rounded to 9 places at the boundary.
    *
    * Scale shape: the baseline is #types × 24 rows — broadcast back to the
    * scan, so the whole operator is one map-side-combined aggregate plus a
    * broadcast-join map pass; no row-keyed shuffle at any size. */
  def seasonalAnomalies(events: DataFrame, valueCol: String = "value",
                        zThresh: Double = 3.0): DataFrame = {
    val x = col(valueCol).cast("double")
    val clean = events
      .where(col("event_type").isNotNull && x.isNotNull && !isnan(x))
      .withColumn("hod", hour(col("ts")))
    val dec = "decimal(30,8)"
    val base = clean.groupBy(col("event_type"), col("hod")).agg(
        count(lit(1)).as("n"),
        sum(x.cast(dec)).as("s1"),
        sum((x * x).cast(dec)).as("s2"))
      .select(col("event_type"), col("hod"),
        (col("s1").cast("double") / col("n")).as("mean"),
        ((col("s2").cast("double") / col("n"))
          - (col("s1").cast("double") / col("n")) * (col("s1").cast("double") / col("n")))
          .as("variance"))
    val z = when(col("variance") > 0,
      round((x - col("mean")) / sqrt(col("variance")), 9))
    clean.join(broadcast(base), Seq("event_type", "hod"))
      .withColumn("z", z)
      .where(abs(col("z")) >= lit(zThresh))
      .select(col("event_id"), col("event_type"), col("hod"),
        x.as(valueCol), col("z"))
  }

  /** Exact rolling median of the last `k` values per user (event-time
    * order, event_id tiebreak): the windowed robust-baseline primitive for
    * metric streams — unlike a rolling mean, one corrupt spike cannot drag
    * the baseline. The DISCRETE lower median (the ⌈m/2⌉-th sorted frame
    * value — DuckDB's `quantile_disc(…, 0.5)`) by deliberate contract: it
    * is always an observed value, so the result is bit-identical across
    * engines, where an interpolated even-frame midpoint would inherit
    * each engine's FP summation rounding.
    *
    * Scale shape: one shuffle on user_id (the window partition key); the
    * frame buffer is k values — constant memory per row regardless of user
    * history length. k stays small by contract (it's a smoothing width),
    * so the sort_array-per-row cost is k log k on ≤ k elements. */
  def rollingMedian(events: DataFrame, valueCol: String = "value",
                    k: Int = 7): DataFrame = {
    require(k >= 1, "k must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-(k - 1), 0)
    val x = col(valueCol).cast("double")
    val arr = sort_array(collect_list(x).over(w))
    // null/NaN rows are dropped BEFORE the window so both engines sweep the
    // identical value sequence and every frame is non-empty (an all-null
    // frame would make the median undefined and element_at(…, 0) an ANSI
    // error); ⌈m/2⌉ via truncation of (m+1)/2.0 — element_at is 1-based
    val mid = ((col("m") + 1) / 2).cast("int")
    events.where(x.isNotNull && !isnan(x))
      .withColumn("window_vals", arr)
      .withColumn("m", size(col("window_vals")))
      .select(col("event_id"), col("user_id"), x.as(valueCol),
        element_at(col("window_vals"), mid).as("roll_med"))
  }
}
