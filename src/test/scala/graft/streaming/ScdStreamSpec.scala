package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

case class Change(doc_id: java.lang.Long, h: Long, ts: Timestamp)

class ScdStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def ms(s: String) = ts(s).getTime

  private def dims(dimDir: String): Set[(Long, Long, Long, Option[Long])] =
    ScdStream.latestDim(spark, dimDir).get
      .select(col("doc_id"), col("h"), col("valid_from_ms"), col("valid_to_ms"))
      .as[(Long, Long, Long, Option[Long])].collect().toSet

  test("file-source -> foreachBatch SCD2 -> versioned parquet: version " +
    "history survives a checkpointed restart exactly-once") {
    val in = java.nio.file.Files.createTempDirectory("graft_scd_in").toString
    val dim = java.nio.file.Files.createTempDirectory("graft_scd_dim").toString
    val chk = java.nio.file.Files.createTempDirectory("graft_scd_chk").toString
    def start() = ScdStream.scd2Sink(
      spark.readStream.schema("doc_id LONG, h LONG, ts TIMESTAMP").parquet(in),
      dim, chk)

    // batch 1: two inserts, plus a null-key malformed record that must drop
    Seq(Change(1L, 10L, ts("2024-01-01 10:00:00")),
        Change(2L, 20L, ts("2024-01-01 10:00:01")),
        Change(null, 99L, ts("2024-01-01 10:00:02")))
      .toDF().write.mode("append").parquet(in)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // asOf = max event time over the KEYED rows (the dropped malformed
    // record's 10:00:02 timestamp does not contribute)
    val t1 = ms("2024-01-01 10:00:01")
    assert(dims(dim) == Set(
      (1L, 10L, t1, None),
      (2L, 20L, t1, None)))

    // stop/restart: batch 2 arrives only after a full stop — change key 2,
    // insert key 3, and TWO same-batch changes for key 1 (last-by-ts wins)
    Seq(Change(1L, 11L, ts("2024-01-01 11:00:00")),
        Change(1L, 12L, ts("2024-01-01 11:00:05")),
        Change(2L, 21L, ts("2024-01-01 11:00:01")),
        Change(3L, 30L, ts("2024-01-01 11:00:02")))
      .toDF().write.mode("append").parquet(in)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val t2 = ms("2024-01-01 11:00:05")
    val expectedV1 = Set(
      (1L, 10L, t1, Some(t2)), // closed by the (deduped) key-1 change
      (1L, 12L, t2, None),     // last change in the batch won
      (2L, 20L, t1, Some(t2)),
      (2L, 21L, t2, None),
      (3L, 30L, t2, None))
    assert(dims(dim) == expectedV1)
    // full version history is queryable: both snapshots exist on disk
    assert(ScdStream.latestVersionBefore(spark, dim, Long.MaxValue) == Some(1L))
    assert(ScdStream.latestVersionBefore(spark, dim, 1L) == Some(0L))

    // restart with NO new data: nothing replays, nothing new commits
    val q3 = start()
    try q3.processAllAvailable() finally q3.stop()
    assert(ScdStream.latestVersionBefore(spark, dim, Long.MaxValue) == Some(1L))
    assert(dims(dim) == expectedV1)
  }

  test("replayed batch rebuilds from the prior snapshot: re-running batch N " +
    "over a partial/committed v=N is deterministic (exactly-once core)") {
    val dim = java.nio.file.Files.createTempDirectory("graft_scd_replay").toString
    val b0 = Seq(Change(1L, 10L, ts("2024-01-01 10:00:00")),
                 Change(2L, 20L, ts("2024-01-01 10:00:00"))).toDF()
    ScdStream.applyScdBatch(b0, 0L, dim, "doc_id", "h", "ts")
    val b1 = Seq(Change(2L, 21L, ts("2024-01-01 11:00:00")),
                 Change(3L, 30L, ts("2024-01-01 11:00:00"))).toDF()
    ScdStream.applyScdBatch(b1, 1L, dim, "doc_id", "h", "ts")
    val once = dims(dim)
    // simulate the failure-replay: the sink re-invokes batch 1 after v=1
    // was already (possibly partially) written — the rebuild must read
    // v=0, never v=1, and land on the identical snapshot
    ScdStream.applyScdBatch(b1, 1L, dim, "doc_id", "h", "ts")
    assert(dims(dim) == once)
    assert(once.collect { case (2L, h, _, None) => h } == Set(21L))
  }

  test("torn snapshots are never selected: a v=N dir without _SUCCESS " +
    "(sink crashed mid-write) is skipped, and foreign v=* dirnames " +
    "don't throw (ADVICE r7)") {
    val dim = java.nio.file.Files.createTempDirectory("graft_scd_torn").toString
    val b0 = Seq(Change(1L, 10L, ts("2024-01-01 10:00:00"))).toDF()
    ScdStream.applyScdBatch(b0, 0L, dim, "doc_id", "h", "ts")
    assert(ScdStream.latestVersionBefore(spark, dim, Long.MaxValue) == Some(0L))
    // simulate a crash mid-write of v=1: directory + data file, no _SUCCESS
    val torn = new java.io.File(dim, "v=1")
    torn.mkdirs()
    java.nio.file.Files.writeString(
      new java.io.File(torn, "part-00000.parquet").toPath, "partial")
    // and a foreign non-numeric version dir that used to throw in toLong
    new java.io.File(dim, "v=staging").mkdirs()
    // external readers still get the last COMMITTED snapshot, not the torn one
    assert(ScdStream.latestVersionBefore(spark, dim, Long.MaxValue) == Some(0L))
    assert(ScdStream.latestDim(spark, dim).get
      .select("doc_id").as[Long].collect().toSeq == Seq(1L))
    // and the replay of batch 1 rebuilds from v=0 and commits over the torn dir
    val b1 = Seq(Change(2L, 20L, ts("2024-01-01 11:00:00"))).toDF()
    ScdStream.applyScdBatch(b1, 1L, dim, "doc_id", "h", "ts")
    assert(ScdStream.latestVersionBefore(spark, dim, Long.MaxValue) == Some(1L))
    assert(dims(dim).map(_._1) == Set(1L, 2L))
  }
}
