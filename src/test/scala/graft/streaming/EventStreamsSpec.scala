package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def tsMs(s: String) = ts(s).getTime

  test("streaming hourly tumbling window aggregates per (hour, type)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.hourlyTumbling(in.toDF())
      .writeStream.format("memory").queryName("hourly").outputMode("complete").start()
    try {
      in.addData(
        Event(1, ts("2024-01-01 10:05:00"), 1, "click", 2.0),
        Event(2, ts("2024-01-01 10:55:00"), 2, "click", 4.0),
        Event(3, ts("2024-01-01 11:05:00"), 1, "view", 10.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT hour, event_type, n_events, avg_value FROM hourly ORDER BY hour, event_type")
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
      assert(rows == Seq(
        ("2024-01-01 10:00:00.0", "click", 2L, 3.0),
        ("2024-01-01 11:00:00.0", "view", 1L, 10.0)))
    } finally q.stop()
  }

  test("streaming distinct users per window: HLL sketch tracks exact" +
    " cardinality at test scale; bounded state via watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.distinctUsersStream(in.toDF())
      .writeStream.format("memory").queryName("distusers").outputMode("complete").start()
    try {
      in.addData(
        Event(1, ts("2024-01-01 10:05:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 10:10:00"), 1, "click", 1.0), // same user
        Event(3, ts("2024-01-01 10:20:00"), 2, "view", 1.0),
        Event(4, ts("2024-01-01 10:30:00"), 3, "view", 1.0),
        Event(5, ts("2024-01-01 11:05:00"), 1, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT hour, est_users, n_events FROM distusers ORDER BY hour")
        .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2))).toSeq
      // HLL++ at rsd=0.05 is exact at these cardinalities
      assert(rows == Seq(
        ("2024-01-01 10:00:00.0", 3L, 4L),
        ("2024-01-01 11:00:00.0", 1L, 1L)))
    } finally q.stop()
  }

  test("streaming histogram bins with closed last bucket, complete mode") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.histogramStream(in.toDF(), "value", Seq(0.0, 5.0, 10.0))
      .writeStream.format("memory").queryName("histstream").outputMode("complete").start()
    try {
      in.addData(
        Event(1, ts("2024-01-01 10:00:00"), 1, "a", 0.0),
        Event(2, ts("2024-01-01 10:00:01"), 1, "a", 4.9),
        Event(3, ts("2024-01-01 10:00:02"), 1, "a", 5.0),
        Event(4, ts("2024-01-01 10:00:03"), 1, "a", 10.0),  // closed last bucket
        Event(5, ts("2024-01-01 10:00:04"), 1, "a", 11.0))  // out of range
      q.processAllAvailable()
      val rows = spark.sql("SELECT bin_id, cnt FROM histstream ORDER BY bin_id")
        .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
      assert(rows == Seq((0, 2L), (1, 2L)))
    } finally q.stop()
  }

  test("enrichStream decorates events from a broadcast dim; left join keeps misses") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val dim = Seq((1L, "emea", "pro"), (2L, "apac", "free")).toDF("user_id", "region", "tier")
    val q = EventStreams.enrichStream(in.toDF(), dim, "user_id")
      .select("event_id", "user_id", "region", "tier")
      .writeStream.format("memory").queryName("enriched").outputMode("append").start()
    try {
      in.addData(
        Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 10:00:01"), 2, "view", 2.0),
        Event(3, ts("2024-01-01 10:00:02"), 9, "click", 3.0)) // no dim row
      q.processAllAvailable()
      val rows = spark.sql("SELECT event_id, user_id, region, tier FROM enriched ORDER BY event_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3))).toSeq
      assert(rows == Seq(
        (1L, 1L, "emea", "pro"),
        (2L, 2L, "apac", "free"),
        (3L, 9L, null, null)))
    } finally q.stop()
  }

  test("stream-stream interval join matches views in the lookback window per user") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.clickViewJoin(in.toDF(), lookbackMinutes = 30)
      .writeStream.format("memory").queryName("cvjoin").outputMode("append").start()
    try {
      in.addData(
        Event(1, ts("2024-01-01 10:00:00"), 1, "view", 1.0),   // in window of click@10:20
        Event(2, ts("2024-01-01 10:10:00"), 1, "view", 2.0),   // in window
        Event(3, ts("2024-01-01 09:40:00"), 1, "view", 3.0),   // 40 min before: out
        Event(4, ts("2024-01-01 10:05:00"), 2, "view", 4.0),   // other user: out
        Event(5, ts("2024-01-01 10:20:00"), 1, "click", 0.0),
        Event(6, ts("2024-01-01 10:30:00"), 1, "view", 5.0))   // after the click: out
      q.processAllAvailable()
      // advance both watermarks far enough to flush the joined rows
      in.addData(Event(7, ts("2024-01-01 13:00:00"), 9, "click", 0.0),
        Event(8, ts("2024-01-01 13:00:00"), 9, "view", 0.0))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT click_id, view_id, view_value FROM cvjoin WHERE user_id = 1 ORDER BY view_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(rows == Seq((5L, 1L, 1.0), (5L, 2L, 2.0)))
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER join: matched clicks emit like the inner " +
    "join; view-less clicks emit null-padded once the watermark proves it") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.clickViewJoinOuter(in.toDF(), lookbackMinutes = 30)
      .writeStream.format("memory").queryName("cvjoin_outer").outputMode("append").start()
    try {
      in.addData(
        Event(1, ts("2024-01-01 10:00:00"), 1, "view", 1.0),  // matches click 5
        Event(5, ts("2024-01-01 10:20:00"), 1, "click", 0.0), // matched
        Event(6, ts("2024-01-01 10:25:00"), 2, "click", 0.0)) // NO view: outer row
      q.processAllAvailable()
      // watermark far past 10:25 + lookback: the unmatched click must flush
      in.addData(Event(7, ts("2024-01-01 14:00:00"), 9, "view", 0.0),
        Event(8, ts("2024-01-01 14:00:00"), 9, "click", 0.0))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT click_id, view_id FROM cvjoin_outer WHERE user_id IN (1, 2)")
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      assert(rows == Set((5L, 1L), (6L, -1L)))
    } finally q.stop()
  }

  test("clickViewJoinOuter: an unmatched click survives a checkpointed " +
    "restart and still emits its null-padded row exactly once") {
    // the outer join's null-padded rows come from buffered STATE (a click
    // waiting for its watermark deadline) — the restart must restore that
    // pending click and emit it once, not drop or double it
    val in = java.nio.file.Files.createTempDirectory("graft_cvo_in").toString
    val out = java.nio.file.Files.createTempDirectory("graft_cvo_out").toString
    val chk = java.nio.file.Files.createTempDirectory("graft_cvo_chk").toString
    def start() = EventStreams.clickViewJoinOuter(
        spark.readStream
          .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE")
          .parquet(in), lookbackMinutes = 30)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", chk)
      .outputMode("append").start()
    // phase 1: one matched click and one pending (view-less) click
    Seq(Event(1, ts("2024-01-01 10:00:00"), 1, "view", 1.0),
        Event(5, ts("2024-01-01 10:20:00"), 1, "click", 0.0),
        Event(6, ts("2024-01-01 10:25:00"), 2, "click", 0.0))
      .toDF().write.mode("append").parquet(in)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // phase 2 after the full stop: only the watermark advances — the
    // restored pending click must now flush null-padded
    Seq(Event(7, ts("2024-01-01 14:00:00"), 9, "view", 0.0),
        Event(8, ts("2024-01-01 14:00:00"), 9, "click", 0.0))
      .toDF().write.mode("append").parquet(in)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val rows = spark.read.parquet(out)
      .where($"user_id" === 1 || $"user_id" === 2)
      .select("click_id", "view_id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq
    assert(rows.sorted == Seq((5L, 1L), (6L, -1L))) // exactly once each
  }

  test("streaming dedup keeps first occurrence per key within watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.dedupStream(in.toDF(), Seq("event_id"))
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      in.addData(
        Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        Event(1, ts("2024-01-01 10:00:01"), 1, "click", 1.0), // dup event_id
        Event(2, ts("2024-01-01 10:00:02"), 2, "view", 2.0))
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM dedup").as[Long].collect()(0) == 2L)
    } finally q.stop()
  }

  test("file-source stream: readStream over parquet drives the same operators") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_in").toString
    Seq(
      Event(1, ts("2024-01-01 10:05:00"), 1, "click", 2.0),
      Event(2, ts("2024-01-01 10:55:00"), 2, "click", 4.0))
      .toDF().write.mode("overwrite").parquet(dir)
    val in = spark.readStream.schema(
      Seq.empty[Event].toDF().schema).parquet(dir)
    assert(in.isStreaming)
    val q = EventStreams.hourlyTumbling(in)
      .writeStream.format("memory").queryName("filehourly").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val rows = spark.sql("SELECT event_type, n_events, avg_value FROM filehourly")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(rows == Seq(("click", 2L, 3.0)))
    } finally q.stop()
  }

  test("sessionize splits sessions on gaps INSIDE one microbatch (replay shape)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.sessionize(in.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions_replay").outputMode("append").start()
    try {
      // one batch carrying hours of history: two full sessions + one open
      in.addData(
        Event(1, ts("2024-01-01 10:00:00"), 9, "click", 1.0),
        Event(2, ts("2024-01-01 10:10:00"), 9, "view", 2.0),
        Event(3, ts("2024-01-01 12:00:00"), 9, "click", 4.0),
        Event(4, ts("2024-01-01 15:00:00"), 9, "view", 8.0))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT n_events, total_value FROM sessions_replay ORDER BY start")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(rows == Seq((2L, 3.0), (1L, 4.0))) // 15:00 session still open
    } finally q.stop()
  }

  test("sessionize holds closed sessions for late events that re-open them") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    // watermark delay 1h > gap 30m: a late event may legally bridge a gap
    val q = EventStreams.sessionize(in.toDS(), gapMinutes = 30, watermarkDelay = "1 hour")
      .writeStream.format("memory").queryName("sessions_late").outputMode("append").start()
    try {
      in.addData(
        Event(1, ts("2024-01-01 10:00:00"), 5, "click", 1.0),
        Event(2, ts("2024-01-01 10:31:00"), 5, "view", 2.0)) // gap broken intra-batch
      q.processAllAvailable()
      // late bridging event: within watermark, joins BOTH fragments
      in.addData(Event(3, ts("2024-01-01 10:15:00"), 5, "click", 4.0))
      q.processAllAvailable()
      // far-future event pushes the watermark past everything for user 5
      in.addData(Event(4, ts("2024-01-02 12:00:00"), 6, "click", 0.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT user_id, n_events, total_value FROM sessions_late WHERE user_id = 5")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(rows == Seq((5L, 3L, 7.0))) // ONE session of 3, not fragments
    } finally q.stop()
  }

  test("driftStream reports per-window TVD against the reference histogram") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    // reference: even split over bins [0,5) and [5,10]
    val q = EventStreams.driftStream(in.toDF(), "value", Seq(0.0, 5.0, 10.0),
        refCounts = Seq(1L, 1L), windowDur = "1 hour", watermark = "2 hours")
      .writeStream.format("memory").queryName("drift").outputMode("append").start()
    try {
      // window 10:00-11:00: all mass in bin 0 -> TVD = 0.5*(|1-.5|+|0-.5|) = 0.5
      in.addData(
        Event(1, ts("2024-01-01 10:00:00"), 1, "a", 1.0),
        Event(2, ts("2024-01-01 10:10:00"), 1, "a", 2.0),
        Event(3, ts("2024-01-01 10:20:00"), 1, "a", 3.0))
      q.processAllAvailable()
      // advance the watermark past 11:00 + 2h to close the first window
      in.addData(Event(9, ts("2024-01-01 13:30:00"), 1, "a", 7.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT win_start, n_events, tvd FROM drift ORDER BY win_start")
        .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getDouble(2))).toSeq
      assert(rows == Seq(("2024-01-01 10:00:00.0", 3L, 0.5)))
    } finally q.stop()
  }

  test("enrichAsOfStream: events pick the dimension version valid at event time") {
    implicit val sqlCtx = spark.sqlContext
    // user 1: price 10 until 10:30, then 20; user 2: never in the dim
    val dim = Seq(
      (1L, 10.0, 0L, Some(tsMs("2024-01-01 10:30:00"))),
      (1L, 20.0, tsMs("2024-01-01 10:30:00"), None: Option[Long])
    ).toDF("uid", "price", "valid_from_ms", "valid_to_ms")
    val in = MemoryStream[Event]
    val q = EventStreams.enrichAsOfStream(in.toDF(), dim, "user_id", "uid")
      .select("event_id", "price")
      .writeStream.format("memory").queryName("asof").outputMode("append").start()
    try {
      in.addData(
        Event(1, ts("2024-01-01 10:00:00"), 1, "a", 1.0), // v1 window
        Event(2, ts("2024-01-01 10:30:00"), 1, "a", 1.0), // boundary: v2 (>= from, < to)
        Event(3, ts("2024-01-01 11:00:00"), 1, "a", 1.0), // current version
        Event(4, ts("2024-01-01 11:00:00"), 2, "a", 1.0)) // no dim row: left-kept
      q.processAllAvailable()
      val rows = spark.sql("SELECT event_id, price FROM asof ORDER BY event_id")
        .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSeq
      assert(rows == Seq(
        (1L, Some(10.0)), (2L, Some(20.0)), (3L, Some(20.0)), (4L, None)))
    } finally q.stop()
  }

  test("qualityGateStream: per-window rule verdicts match batch Checks semantics") {
    import graft.dist.Checks.{InRange, NotNull}
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.qualityGateStream(in.toDF(),
        Seq(NotNull("value"), InRange("value", 0, 10, tolerance = 0.25)),
        windowDur = "1 hour", watermark = "2 hours")
      .writeStream.format("memory").queryName("dq").outputMode("append").start()
    try {
      // window 10:00: 4 rows, one NaN (null-rule violation), one 99
      // (range violation; 1/4 = 0.25 <= tolerance passes)
      in.addData(
        Event(1, ts("2024-01-01 10:00:00"), 1, "a", 1.0),
        Event(2, ts("2024-01-01 10:10:00"), 1, "a", Double.NaN),
        Event(3, ts("2024-01-01 10:20:00"), 1, "a", 99.0),
        Event(4, ts("2024-01-01 10:30:00"), 1, "a", 5.0))
      q.processAllAvailable()
      in.addData(Event(9, ts("2024-01-01 13:30:00"), 1, "a", 1.0))
      q.processAllAvailable()
      val rows = spark.sql(
          "SELECT `check`, n_rows, n_violations, pass FROM dq ORDER BY `check`")
        .collect().map(r =>
          (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq
      assert(rows == Seq(
        ("in_range(value,0.0,10.0)", 4L, 1L, true), // 0.25 <= 0.25
        ("not_null(value)", 4L, 1L, false)))
    } finally q.stop()
  }

  test("qualityGateStream rejects non-row-local rules instead of dropping them") {
    import graft.dist.Checks.{NotNull, Unique}
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val e = intercept[IllegalArgumentException] {
      EventStreams.qualityGateStream(in.toDF(),
        Seq(NotNull("value"), Unique(Seq("event_id"))))
    }
    assert(e.getMessage.contains("unique(event_id)"))
  }

  test("psiDriftStream: window PSI matches the smoothed hand formula") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    // reference: even 1/1 over bins [0,5) and [5,10]
    val q = EventStreams.psiDriftStream(in.toDF(), "value", Seq(0.0, 5.0, 10.0),
        refCounts = Seq(1L, 1L), windowDur = "1 hour", watermark = "2 hours")
      .writeStream.format("memory").queryName("psidrift").outputMode("append").start()
    try {
      // window 10:00: all 3 events in bin 0
      in.addData(
        Event(1, ts("2024-01-01 10:00:00"), 1, "a", 1.0),
        Event(2, ts("2024-01-01 10:10:00"), 1, "a", 2.0),
        Event(3, ts("2024-01-01 10:20:00"), 1, "a", 3.0))
      q.processAllAvailable()
      in.addData(Event(9, ts("2024-01-01 13:30:00"), 1, "a", 7.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT win_start, n_events, psi FROM psidrift")
        .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getDouble(2))).toSeq
      // p = (3.5/4, 0.5/4); q = (1.5/3, 1.5/3); per-term rounded to 9
      def term(p: Double, qq: Double) =
        math.rint((p - qq) * math.log(p / qq) * 1e9) / 1e9
      val expect =
        (BigDecimal(term(3.5 / 4, 0.5)) + BigDecimal(term(0.5 / 4, 0.5))).toDouble
      assert(rows == Seq(("2024-01-01 10:00:00.0", 3L, expect)))
    } finally q.stop()
  }

  test("anomalyStream flags only post-warmup outliers against running moments") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.anomalyStream(in.toDS(), zThresh = 3.0, minN = 30)
      .writeStream.format("memory").queryName("anomalies").outputMode("append").start()
    try {
      // warm-up: 30 alternating 9/11 readings -> mean 10, variance 1
      val warm = (0 until 30).map(i =>
        Event(i, ts(f"2024-01-01 10:00:${i}%02d"), 1, "click",
          if (i % 2 == 0) 9.0 else 11.0))
      in.addData(warm: _*)
      q.processAllAvailable()
      // outlier z = (20-10)/1 = 10; inlier z = 0.5; other type still warming
      in.addData(
        Event(100, ts("2024-01-01 10:01:00"), 1, "click", 20.0),
        Event(101, ts("2024-01-01 10:01:01"), 1, "click", 10.5),
        Event(102, ts("2024-01-01 10:01:02"), 1, "view", 999.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT event_id, z FROM anomalies ORDER BY event_id")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(rows.map(_._1) == Seq(100L))
      assert(math.abs(rows.head._2 - 10.0) < 1e-9)
    } finally q.stop()
  }

  test("distinctUsersStream sketch state survives a checkpoint restart" +
    " (file-source round-trip)") {
    // the sketch-state analogue of the dedup/sessionize restart tests: an
    // OPEN window's HLL sketch crosses a full stop/start — the restarted
    // query must keep counting distinct users into the restored sketch,
    // not open a fresh one (2+1 users across the restart must read 3)
    val in = java.nio.file.Files.createTempDirectory("graft_du_in").toString
    val out = java.nio.file.Files.createTempDirectory("graft_du_out").toString
    val chk = java.nio.file.Files.createTempDirectory("graft_du_chk").toString
    def start() = EventStreams.distinctUsersStream(
        spark.readStream
          .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE")
          .parquet(in))
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", chk)
      .outputMode("append").start()
    // phase 1: hour-10 window complete (2 users); hour-13 window OPEN with
    // users 7 and 8 at shutdown
    Seq(Event(1, ts("2024-01-01 10:05:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 10:20:00"), 2, "view", 1.0),
        Event(3, ts("2024-01-01 13:05:00"), 7, "click", 1.0),
        Event(4, ts("2024-01-01 13:10:00"), 8, "click", 1.0))
      .toDF().write.mode("append").parquet(in)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // phase 2 (after the full stop): a THIRD distinct user lands in the
    // restored hour-13 window, then far-future events advance the
    // watermark so both windows close and emit
    val q2 = start()
    try {
      Seq(Event(5, ts("2024-01-01 13:20:00"), 9, "click", 1.0),
          Event(6, ts("2024-01-01 16:30:00"), 99, "click", 1.0))
        .toDF().write.mode("append").parquet(in)
      q2.processAllAvailable()
      // one more batch so the append sink flushes windows closed by the
      // watermark advance above
      Seq(Event(7, ts("2024-01-01 19:00:00"), 99, "click", 1.0))
        .toDF().write.mode("append").parquet(in)
      q2.processAllAvailable()
    } finally q2.stop()
    val rows = spark.read.parquet(out)
      .select("hour", "est_users", "n_events")
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(rows.contains(("2024-01-01 10:00:00.0", 2L, 2L)))
    // users 7+8 (pre-restart) + 9 (post-restart) in ONE merged sketch
    assert(rows.contains(("2024-01-01 13:00:00.0", 3L, 3L)))
  }

  test("sessionize session state survives a checkpoint restart (file-source round-trip)") {
    // the flatMapGroupsWithState analogue of the dedup restart test: an OPEN
    // session crosses a full stop/start — the restarted query must extend
    // it from restored state, not begin a fresh one
    val in = java.nio.file.Files.createTempDirectory("graft_sess_in").toString
    val out = java.nio.file.Files.createTempDirectory("graft_sess_out").toString
    val chk = java.nio.file.Files.createTempDirectory("graft_sess_chk").toString
    def start() = EventStreams.sessionize(
        spark.readStream
          .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE")
          .parquet(in).as[Event])
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", chk)
      .outputMode("append").start()
    // phase 1: user 8's session opens (2 events, still live at shutdown)
    Seq(Event(1, ts("2024-01-01 10:00:00"), 8, "click", 1.0),
        Event(2, ts("2024-01-01 10:10:00"), 8, "view", 2.0))
      .toDF().write.mode("append").parquet(in)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // phase 2 (after the full stop): an event 10 minutes later extends the
    // SAME session — only possible if the state store was restored — and a
    // far-future event advances the watermark so the session closes
    Seq(Event(3, ts("2024-01-01 10:20:00"), 8, "click", 4.0),
        Event(4, ts("2024-01-01 12:00:00"), 9, "click", 0.0))
      .toDF().write.mode("append").parquet(in)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val rows = spark.read.parquet(out)
      .where($"user_id" === 8)
      .select("n_events", "start", "end", "total_value")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getTimestamp(2).toString, r.getDouble(3))).toSeq
    // ONE merged 3-event session spanning the restart, not 2+1 fragments
    assert(rows == Seq((3L, "2024-01-01 10:00:00.0", "2024-01-01 10:20:00.0", 7.0)))
  }

  test("sessionize closes a session when the gap breaks and emits its summary") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.sessionize(in.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    try {
      in.addData(
        Event(1, ts("2024-01-01 10:00:00"), 7, "click", 1.0),
        Event(2, ts("2024-01-01 10:10:00"), 7, "view", 2.0))
      q.processAllAvailable()
      // new batch 2h later -> previous session must close and be emitted
      in.addData(Event(3, ts("2024-01-01 12:30:00"), 7, "click", 5.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT user_id, n_events, total_value FROM sessions")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(rows == Seq((7L, 2L, 3.0)))
    } finally q.stop()
  }
}
