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
    val evd = graft.sources.Readers.readEvents(spark, "/root/testdata/sf0.001")
    val tight = EventAnalytics.funnel(evd, windowSeconds = 60L)
      .as[(String, Long)].collect().toMap
    assert(tight("step3_purchase_in_window") <= ev("step3_purchase_in_window"))
    assert(tight("step1_view") == ev("step1_view"))
  }

  test("assocRules: support, directional confidence, and lift hand-checked") {
    // users: 1:{a,b}, 2:{a,b}, 3:{a}, 4:{b,c}  (repeated events collapse)
    val ev = Seq(
      (1L, "a"), (1L, "b"), (1L, "a"),
      (2L, "a"), (2L, "b"),
      (3L, "a"),
      (4L, "b"), (4L, "c")
    ).map { case (u, t) => (u, ts("2024-01-01 10:00:00"), t) }
      .toDF("user_id", "ts", "event_type")
    val r = EventAnalytics.assocRules(ev).collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2), x.getLong(3),
        x.getLong(4), x.getLong(5), x.getDouble(6), x.getDouble(7),
        x.getDouble(8), x.getDouble(9))).toSeq
    // (a,b): n_a=3, n_b=3, n_ab=2, N=4 -> support .5, conf 2/3 both,
    // lift = 2*4/9; (b,c): n_ab=1 -> conf_ab 1/3, conf_ba 1, lift 4/3
    assert(r == Seq(
      ("a", "b", 3L, 3L, 2L, 4L, 0.5, 2.0 / 3, 2.0 / 3, 8.0 / 9),
      ("b", "c", 3L, 1L, 1L, 4L, 0.25, 1.0 / 3, 1.0, 4.0 / 3)))
  }

  test("interarrivalStats: per-type gaps from same-user consecutive events") {
    val ev = Seq(
      // u1 "a": gaps 10s, 30s ; u2 "a": gap 20s ; "b": single event, no gap
      (1L, 1L, ts("2024-01-01 10:00:00"), "a"),
      (2L, 1L, ts("2024-01-01 10:00:10"), "a"),
      (3L, 1L, ts("2024-01-01 10:00:40"), "a"),
      (4L, 2L, ts("2024-01-01 11:00:00"), "a"),
      (5L, 2L, ts("2024-01-01 11:00:20"), "a"),
      (6L, 3L, ts("2024-01-01 12:00:00"), "b")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val r = EventAnalytics.interarrivalStats(ev).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getDouble(2), x.getDouble(3), x.getDouble(4)))
    // gaps for "a": {10, 20, 30}: mean 20, p50 20, p90 = 20 + 0.8*10 = 28
    assert(r.toSeq == Seq(("a", 3L, 20.0, 20.0, 28.0)))
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

  test("firstTouchAttribution: session entry type gets the conversion credit") {
    val ev = Seq(
      // u1 session 1: view -> purchase (credit view); session 2 after a
      // 2-hour gap: click -> purchase (credit click)
      (1L, 1L, ts("2024-01-01 10:00:00"), "view"),
      (2L, 1L, ts("2024-01-01 10:10:00"), "purchase"),
      (3L, 1L, ts("2024-01-01 12:30:00"), "click"),
      (4L, 1L, ts("2024-01-01 12:40:00"), "purchase"),
      // u2: purchase opens its own session (credit purchase)
      (5L, 2L, ts("2024-01-01 09:00:00"), "purchase"),
      // u2 second session: view only — no conversion, no credit
      (6L, 2L, ts("2024-01-01 11:00:00"), "view"),
      // u3: exactly at the 30-min boundary stays in-session (> not >=)
      (7L, 3L, ts("2024-01-01 08:00:00"), "signup"),
      (8L, 3L, ts("2024-01-01 08:30:00"), "purchase")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val r = EventAnalytics.firstTouchAttribution(ev)
      .as[(String, Long)].collect().toSeq
    assert(r == Seq(("click", 1L), ("purchase", 1L), ("signup", 1L), ("view", 1L)))
  }

  test("feedGaps: only super-threshold silences, per type, exact bounds") {
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "a"),
      (2L, 1L, ts("2024-01-01 10:30:00"), "a"), // 30 min: below threshold
      (3L, 1L, ts("2024-01-01 13:00:00"), "a"), // 2.5 h gap: reported
      (4L, 1L, ts("2024-01-01 10:00:00"), "b"),
      (5L, 1L, ts("2024-01-01 12:00:00"), "b")  // exactly 2 h: NOT > threshold
    ).toDF("event_id", "user_id", "ts", "event_type")
    val r = EventAnalytics.feedGaps(ev, minGapSeconds = 7200)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(r == Seq(("a",
      ts("2024-01-01 10:30:00").getTime, ts("2024-01-01 13:00:00").getTime,
      9000.0)))
  }

  test("seasonalAnomalies: an event is judged by its own hour-of-day cell") {
    // hour 10 baseline {10,10,10,40}; hour 3 baseline {10,10,10,10,10,40}:
    // the SAME value 40 z-scores differently per cell; constant cells
    // (variance 0) yield no anomalies
    def e(id: Long, h: String, v: Double) = (id, 1L, ts(h), "m", v)
    val ev = (Seq(
      e(1, "2024-01-01 10:00:00", 10), e(2, "2024-01-02 10:00:00", 10),
      e(3, "2024-01-03 10:00:00", 10), e(4, "2024-01-04 10:30:00", 40),
      e(5, "2024-01-01 03:00:00", 10), e(6, "2024-01-02 03:00:00", 10),
      e(7, "2024-01-03 03:00:00", 10), e(8, "2024-01-04 03:00:00", 10),
      e(9, "2024-01-05 03:00:00", 10), e(10, "2024-01-06 03:10:00", 40),
      e(11, "2024-01-01 05:00:00", 7), e(12, "2024-01-02 05:00:00", 7))
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    // hour 10: mean 17.5, var 168.75 -> z(40) = 22.5/12.990 = 1.7320...
    // hour 3: mean 15, var 125 -> z(40) = 25/11.180 = 2.2360...
    val r15 = EventAnalytics.seasonalAnomalies(ev, zThresh = 1.5)
      .select("event_id", "z").as[(Long, Double)].collect().toMap
    assert(r15.keySet == Set(4L, 10L))
    assert(math.abs(r15(4L) - 22.5 / math.sqrt(168.75)) < 1e-8)
    assert(math.abs(r15(10L) - 25.0 / math.sqrt(125.0)) < 1e-8)
    // raising the threshold between the two z values keeps only hour 3's
    val r20 = EventAnalytics.seasonalAnomalies(ev, zThresh = 2.0)
      .select("event_id").as[Long].collect().toSeq
    assert(r20 == Seq(10L))
  }

  test("rollingMedian: lower-median frames, per-user isolation, null drop") {
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), 5.0),
      (2L, 1L, ts("2024-01-01 10:01:00"), 1.0),
      (3L, 1L, ts("2024-01-01 10:02:00"), 9.0),
      (4L, 1L, ts("2024-01-01 10:03:00"), 3.0),
      (5L, 2L, ts("2024-01-01 10:00:30"), 100.0), // other user: own frames
      (6L, 1L, ts("2024-01-01 10:04:00"), Double.NaN) // dropped pre-window
    ).toDF("event_id", "user_id", "ts", "value")
    val r = EventAnalytics.rollingMedian(ev, k = 3)
      .select("event_id", "roll_med").as[(Long, Double)].collect().toMap
    // frames (k=3, lower median): [5]->5; [1,5]->1; [1,5,9]->5; [1,9,3]->3
    assert(r == Map(1L -> 5.0, 2L -> 1.0, 3L -> 5.0, 4L -> 3.0, 5L -> 100.0))
  }

  test("ewma: hand case and exact equality with an in-memory left fold") {
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), 10.0),
      (2L, 1L, ts("2024-01-01 10:01:00"), 20.0),
      (3L, 1L, ts("2024-01-01 10:02:00"), 30.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val r = EventAnalytics.ewma(ev, alpha = 0.5, k = 3)
      .select("event_id", "ewma").as[(Long, Double)].collect().toMap
    // s1=10; s2=.5*20+.5*10=15; s3=.5*30+.5*15=22.5
    assert(r == Map(1L -> 10.0, 2L -> 15.0, 3L -> 22.5))
    // random data: bit-exact vs the same fold computed in memory
    val rnd = new scala.util.Random(23)
    val rows = (1 to 200).map { i =>
      (i.toLong, (i % 4).toLong,
        new Timestamp(1700000000000L + rnd.nextInt(500000) * 1000L),
        rnd.nextDouble() * 100)
    }
    val got = EventAnalytics.ewma(
        rows.toDF("event_id", "user_id", "ts", "value"), alpha = 0.3, k = 10)
      .select("event_id", "ewma").as[(Long, Double)].collect().toMap
    rows.groupBy(_._2).values.foreach { g =>
      val seq = g.sortBy(x => (x._3.getTime, x._1))
      seq.indices.foreach { i =>
        val frame = seq.slice(math.max(0, i - 9), i + 1).map(_._4)
        val expect = frame.tail.foldLeft(frame.head)((s, x) => 0.3 * x + 0.7 * s)
        assert(got(seq(i)._1) == expect, s"event ${seq(i)._1}") // == : bit-exact
      }
    }
  }

  test("rollingMedian matches a brute-force sliding sort on random data") {
    val rnd = new scala.util.Random(3)
    val rows = (1 to 300).map { i =>
      (i.toLong, (i % 5).toLong,
        new Timestamp(1700000000000L + rnd.nextInt(1000000) * 1000L),
        rnd.nextInt(50).toDouble)
    }
    val got = EventAnalytics.rollingMedian(
        rows.toDF("event_id", "user_id", "ts", "value"), k = 7)
      .select("event_id", "roll_med").as[(Long, Double)].collect().toMap
    rows.groupBy(_._2).values.foreach { g =>
      val seq = g.sortBy(r => (r._3.getTime, r._1))
      seq.indices.foreach { i =>
        val frame = seq.slice(math.max(0, i - 6), i + 1).map(_._4).sorted
        val expect = frame((frame.size - 1) / 2) // lower median, 0-based
        assert(got(seq(i)._1) == expect, s"event ${seq(i)._1}")
      }
    }
  }
}
