package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

class LedgerTwsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def withRocksDb[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("userLedger (transformWithState): running updates, timer-driven " +
    "close, state cleared for a returning user") { withRocksDb {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = LedgerTws.userLedger(in.toDS(), quietMinutes = 30)
      .toDF().writeStream.format("memory").queryName("ledger")
      .outputMode("update").start()
    try {
      // batch 1: user 1 active with two event types; user 2 with one event
      in.addData(
        Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 10:05:00"), 1, "view", 2.0),
        Event(3, ts("2024-01-01 10:06:00"), 2, "click", 5.0))
      q.processAllAvailable()
      val open = spark.sql("SELECT * FROM ledger WHERE NOT closed")
        .as[LedgerUpdate].collect().map(l => l.user_id -> l).toMap
      assert(open(1L).n_events == 2 && open(1L).total_value == 3.0 && open(1L).n_types == 2)
      assert(open(2L).n_events == 1 && open(2L).total_value == 5.0 && open(2L).n_types == 1)
      // batch 2: user 1 stays active (re-arms their timer); watermark still low
      in.addData(Event(4, ts("2024-01-01 10:20:00"), 1, "click", 4.0))
      q.processAllAvailable()
      // batch 3: far-future event pushes the watermark past both deadlines
      // (10:50 for user 1, 10:36 for user 2) -> both ledgers close
      in.addData(Event(5, ts("2024-01-01 14:00:00"), 9, "click", 0.0))
      q.processAllAvailable()
      val closed = spark.sql("SELECT * FROM ledger WHERE closed")
        .as[LedgerUpdate].collect().map(l => l.user_id -> l).toMap
      assert(closed(1L) == LedgerUpdate(1L, 3, 7.0, 2, closed = true))
      assert(closed(2L) == LedgerUpdate(2L, 1, 5.0, 1, closed = true))
      // state cleared: user 1 returning starts a FRESH ledger, not n=4
      in.addData(Event(6, ts("2024-01-01 14:05:00"), 1, "view", 9.0))
      q.processAllAvailable()
      val fresh = spark.sql(
        "SELECT * FROM ledger WHERE user_id = 1 AND NOT closed ORDER BY n_events")
        .as[LedgerUpdate].collect()
      assert(fresh.exists(l => l.n_events == 1 && l.total_value == 9.0 && l.n_types == 1))
    } finally q.stop()
  }}

  test("userLedger state survives a checkpointed restart (file-source round-trip)") {
    withRocksDb {
      val in = java.nio.file.Files.createTempDirectory("graft_tws_in").toString
      val out = java.nio.file.Files.createTempDirectory("graft_tws_out").toString
      val chk = java.nio.file.Files.createTempDirectory("graft_tws_chk").toString
      def start() = LedgerTws.userLedger(
          spark.readStream
            .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE")
            .parquet(in).as[Event], quietMinutes = 30)
        .toDF().writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", chk)
        .outputMode("append").start()
      // phase 1: user 7's ledger opens (2 events), query fully stops
      Seq(Event(1, ts("2024-01-01 10:00:00"), 7, "click", 1.0),
          Event(2, ts("2024-01-01 10:10:00"), 7, "view", 2.0))
        .toDF().write.mode("append").parquet(in)
      val q1 = start()
      try q1.processAllAvailable() finally q1.stop()
      // phase 2 after restart: one more event extends the SAME ledger (only
      // possible from restored RocksDB state), then the watermark closes it
      Seq(Event(3, ts("2024-01-01 10:20:00"), 7, "click", 4.0),
          Event(4, ts("2024-01-01 14:00:00"), 9, "click", 0.0))
        .toDF().write.mode("append").parquet(in)
      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()
      val closed7 = spark.read.parquet(out)
        .where($"user_id" === 7 && $"closed")
        .as[LedgerUpdate].collect().toSeq
      // ONE closed ledger with all 3 events merged across the restart
      assert(closed7 == Seq(LedgerUpdate(7L, 3, 7.0, 2, closed = true)))
    }
  }

  test("userLedger state-size probe: closing a generation CLEARS its keys " +
    "— RocksDB state tracks live users, not users-ever-seen") { withRocksDb {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = LedgerTws.userLedger(in.toDS(), quietMinutes = 30)
      .toDF().writeStream.format("memory").queryName("ledgerprobe")
      .outputMode("update").start()
    def stateRows: Long =
      q.recentProgress.reverse.iterator
        .flatMap(_.stateOperators.headOption).map(_.numRowsTotal)
        .nextOption().getOrElse(-1L)
    try {
      // generation 1: 10 users active at 10:00
      in.addData((0 until 10).map(u =>
        Event(u, ts("2024-01-01 10:00:00"), 100 + u, "click", 1.0)): _*)
      q.processAllAvailable()
      val live1 = stateRows
      assert(live1 >= 10, s"expected >= 10 live state rows, got $live1")
      // push the watermark past every deadline: all 10 close and clear
      in.addData(Event(99, ts("2024-01-01 14:00:00"), 999, "click", 0.0))
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM ledgerprobe WHERE closed")
        .as[Long].collect()(0) == 10L)
      // generation 2: 10x the users — then close them all the same way
      in.addData((0 until 100).map(u =>
        Event(1000 + u, ts("2024-01-01 15:00:00"), 2000 + u, "click", 1.0)): _*)
      q.processAllAvailable()
      in.addData(Event(9999, ts("2024-01-01 20:00:00"), 998, "click", 0.0))
      q.processAllAvailable()
      val after = stateRows
      // only the two watermark-driver users can still hold state: closed
      // generations must not accumulate (110 users closed so far)
      assert(after <= live1,
        s"state accumulated across closed generations: $after rows " +
          s"(gen-1 live was $live1; 110 users have closed)")
    } finally q.stop()
  } }
}
