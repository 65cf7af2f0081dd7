package graft.dist

import graft.SparkSpec
import java.sql.Timestamp

class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("funnel: sequential step anchors and the conversion window") {
    val ev = Seq(
      // u1 completes in 30 min
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:10:00"), "click"),
      (1L, ts("2024-01-01 10:30:00"), "purchase"),
      // u2's click precedes its first view: step 1 only
      (2L, ts("2024-01-01 09:00:00"), "click"),
      (2L, ts("2024-01-01 09:30:00"), "view"),
      // u3 purchases 90 min after the view: steps 1-2, not converted
      (3L, ts("2024-01-01 08:00:00"), "view"),
      (3L, ts("2024-01-01 08:05:00"), "click"),
      (3L, ts("2024-01-01 09:30:00"), "purchase"),
      // u4 never views
      (4L, ts("2024-01-01 07:00:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val r = EventAnalytics.funnel(ev).as[(String, Long)].collect().toSeq
    assert(r == Seq(
      ("step1_view", 3L), ("step2_click", 2L), ("step3_purchase_in_window", 1L)))
  }

  test("topSessionPaths and transitionMatrix: gap-bounded sequences") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view", 10L),
      (1L, ts("2024-01-01 10:10:00"), "click", 11L),
      (1L, ts("2024-01-01 11:00:00"), "purchase", 12L), // 50-min gap: new session
      (2L, ts("2024-01-01 09:00:00"), "view", 20L)
    ).toDF("user_id", "ts", "event_type", "event_id")
    val paths = EventAnalytics.topSessionPaths(ev)
      .as[(String, Long)].collect().toSeq
    assert(paths == Seq(("purchase", 1L), ("view", 1L), ("view>click", 1L)))
    val trans = EventAnalytics.transitionMatrix(ev)
      .as[(String, String, Long)].collect().toSeq
    // click->purchase exceeds the 30-min gap and is excluded
    assert(trans == Seq(("view", "click", 1L)))
  }

  test("funnel invariants on real data: monotone steps, window tightening") {
    val ev = graft.SparkEntry.queries("funnel_events")(spark, "/root/testdata/sf0.001")
      .as[(String, Long)].collect().toMap
    // each step can only lose users
    assert(ev("step1_view") >= ev("step2_click"))
    assert(ev("step2_click") >= ev("step3_purchase_in_window"))
    // a tighter conversion window can never convert MORE users
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    import org.apache.spark.sql.functions._
    val evd = raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val tight = EventAnalytics.funnel(evd, windowSeconds = 60L)
      .as[(String, Long)].collect().toMap
    assert(tight("step3_purchase_in_window") <= ev("step3_purchase_in_window"))
    assert(tight("step1_view") == ev("step1_view"))
  }

  test("retention: first-day cohorts and distinct day offsets") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 12:00:00")),
      (1L, ts("2024-01-03 09:00:00")),
      (2L, ts("2024-01-02 11:00:00")), (2L, ts("2024-01-03 11:00:00"))
    ).toDF("user_id", "ts").withColumn("event_type", org.apache.spark.sql.functions.lit("x"))
    val r = EventAnalytics.retention(ev).as[(Long, Int, Long)].collect().toSeq
    val d1 = ts("2024-01-01 00:00:00").getTime
    val d2 = ts("2024-01-02 00:00:00").getTime
    assert(r == Seq((d1, 0, 1L), (d1, 2, 1L), (d2, 0, 1L), (d2, 1, 1L)))
  }
}
