package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

case class Doc(doc_id: Long, text: String, lang: String, ts: Timestamp)

case class WDoc(doc_id: Long, quality: Double, ts: Timestamp)

class DocStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming exact dedup drops repeated content within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Doc]
    val q = DocStreams.dedupExactStream(in.toDF())
      .writeStream.format("memory").queryName("docdedup").outputMode("append").start()
    try {
      in.addData(
        Doc(0, "same text", "en", ts("2024-01-01 10:00:00")),
        Doc(1, "same text", "en", ts("2024-01-01 10:00:05")), // exact dup
        Doc(2, "other text", "en", ts("2024-01-01 10:00:10")))
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM docdedup").as[Long].collect()(0) == 2L)
    } finally q.stop()
  }

  test("file-source -> dedup -> file-sink round-trip resumes exactly-once from checkpoint") {
    val in = java.nio.file.Files.createTempDirectory("graft_docs_in").toString
    val out = java.nio.file.Files.createTempDirectory("graft_docs_out").toString
    val chk = java.nio.file.Files.createTempDirectory("graft_docs_chk").toString
    def start() = DocStreams.dedupExactStream(
        spark.readStream
          .schema("doc_id LONG, text STRING, lang STRING, ts TIMESTAMP")
          .parquet(in))
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", chk)
      .outputMode("append").start()
    Seq(Doc(0, "same text", "en", ts("2024-01-01 10:00:00")),
        Doc(1, "other text", "en", ts("2024-01-01 10:00:05")))
      .toDF().write.mode("append").parquet(in)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // new files land only after a full stop: a dup of doc 0's content
    // (within the watermark) plus one genuinely new doc
    Seq(Doc(2, "same text", "en", ts("2024-01-01 10:00:10")),
        Doc(3, "third text", "en", ts("2024-01-01 10:00:15")))
      .toDF().write.mode("append").parquet(in)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    // the sink's _spark_metadata log is the exactly-once contract: replayed
    // or orphaned files are invisible to a batch read of the output
    val got = spark.read.parquet(out).select("doc_id").as[Long].collect().sorted.toSeq
    assert(got == Seq(0L, 1L, 3L)) // dedup state survived the restart; no replays
  }

  test("weightedSampleStream: per-window membership equals the batch " +
    "weightedSample of the same rows (exact parity, both windows)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[WDoc]
    val q = DocStreams.weightedSampleStream(in.toDF())
      .writeStream.format("memory").queryName("wsample").outputMode("append").start()
    val rows = (0 until 200).map { i =>
      val win = if (i < 100) "2024-01-01 10:30:00" else "2024-01-01 11:30:00"
      WDoc(i.toLong, (i % 10) / 10.0, ts(win))
    }
    try {
      in.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.sql("SELECT win_start, doc_id FROM wsample")
        .as[(Timestamp, Long)].collect().toSeq
      // exactly two windows, each matching the batch predicate over its rows
      Seq("2024-01-01 10:00:00" -> rows.take(100),
          "2024-01-01 11:00:00" -> rows.drop(100)).foreach { case (w, winRows) =>
        val batch = graft.llm.Sampling.weightedSample(
            winRows.toDF(), weightCol = "quality")
          .select("doc_id").as[Long].collect().toSet
        val got = streamed.filter(_._1 == ts(w)).map(_._2).toSet
        assert(got == batch, s"window $w stream/batch mismatch")
        assert(got.nonEmpty && got.size < winRows.size,
          s"window $w sample not a strict subset (${got.size}/${winRows.size})")
      }
    } finally q.stop()
  }

  test("weightedSampleStream resumes exactly-once from checkpoint: the " +
    "post-restart output is the batch sample of ALL input, no replays") {
    val in = java.nio.file.Files.createTempDirectory("graft_ws_in").toString
    val out = java.nio.file.Files.createTempDirectory("graft_ws_out").toString
    val chk = java.nio.file.Files.createTempDirectory("graft_ws_chk").toString
    def start() = DocStreams.weightedSampleStream(
        spark.readStream
          .schema("doc_id LONG, quality DOUBLE, ts TIMESTAMP")
          .parquet(in))
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", chk)
      .outputMode("append").start()
    val phase1 = (0 until 100).map(i => WDoc(i.toLong, (i % 10) / 10.0,
      ts("2024-01-01 10:00:00")))
    phase1.toDF().write.mode("append").parquet(in)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    val phase2 = (100 until 200).map(i => WDoc(i.toLong, (i % 10) / 10.0,
      ts("2024-01-01 11:00:00")))
    phase2.toDF().write.mode("append").parquet(in)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.parquet(out).select("doc_id").as[Long].collect().toSeq
    val expected = graft.llm.Sampling.weightedSample(
        (phase1 ++ phase2).toDF(), weightCol = "quality")
      .select("doc_id").as[Long].collect().toSeq
    assert(got.sorted == expected.sorted) // exactly-once: no losses, no dups
    assert(got.size == got.distinct.size)
  }

  test("streaming token counts match the batch tokenizer semantics") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Doc]
    val q = DocStreams.tokenCountsStream(in.toDF())
      .writeStream.format("memory").queryName("doctokens").outputMode("complete").start()
    try {
      in.addData(
        Doc(0, "Alpha beta ALPHA", "en", ts("2024-01-01 10:00:00")),
        Doc(1, "beta!", "en", ts("2024-01-01 10:00:01")))
      q.processAllAvailable()
      val rows = spark.sql("SELECT token, cnt FROM doctokens ORDER BY cnt DESC, token")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(rows == Seq(("alpha", 2L), ("beta", 2L)))
    } finally q.stop()
  }

  test("streaming language mix counts per tumbling ingest window") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Doc]
    val q = DocStreams.langMixStream(in.toDF())
      .writeStream.format("memory").queryName("langmix").outputMode("complete").start()
    try {
      in.addData(
        Doc(0, "a", "en", ts("2024-01-01 10:05:00")),
        Doc(1, "b", "en", ts("2024-01-01 10:25:00")),
        Doc(2, "c", "de", ts("2024-01-01 11:05:00")))
      q.processAllAvailable()
      val rows = spark.sql("SELECT lang, n_docs FROM langmix ORDER BY win_start, lang")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(rows == Seq(("en", 2L), ("de", 1L)))
    } finally q.stop()
  }
  test("qualityGateStream counts gopher passes per window") {
    implicit val sqlCtx = spark.sqlContext
    val good = ((0 until 40).map(i => s"${('a' + i / 26).toChar}${('a' + i % 26).toChar}x")
      ++ Seq("the", "and")).mkString(" ")
    val in = MemoryStream[Doc]
    val q = DocStreams.qualityGateStream(in.toDF())
      .writeStream.format("memory").queryName("qgate").outputMode("append").start()
    try {
      in.addData(
        Doc(0, good, "en", ts("2024-01-01 10:05:00")),
        Doc(1, "tiny doc", "en", ts("2024-01-01 10:25:00")),
        Doc(2, good, "en", ts("2024-01-01 10:35:00")),
        // watermark (2h) must pass the 10:00 window end for append emission
        Doc(3, good, "en", ts("2024-01-01 14:00:00")))
      q.processAllAvailable()
      val rows = spark.sql("SELECT n_docs, n_pass, pass_rate FROM qgate ORDER BY win_start")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(rows == Seq((3L, 2L, 2.0 / 3.0)))
    } finally q.stop()
  }

  test("heavyHittersStream: exact counts under capacity, emits at window close") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Doc]
    // one shard so the sketch sees every token; capacity ample -> exact
    val q = DocStreams.heavyHittersStream(in.toDF(), windowMinutes = 60,
        capacity = 100, nShards = 1, watermark = "10 minutes")
      .writeStream.format("memory").queryName("hh").outputMode("append").start()
    try {
      in.addData(
        Doc(0, "alpha alpha beta", "en", ts("2024-01-01 10:05:00")),
        Doc(1, "alpha gamma", "en", ts("2024-01-01 10:15:00")),
        // advances the watermark past the 10:00-11:00 window end
        Doc(2, "later doc", "en", ts("2024-01-01 11:30:00")))
      q.processAllAvailable()
      in.addData(Doc(3, "flush", "en", ts("2024-01-01 13:00:00")))
      q.processAllAvailable()
      val rows = spark.sql(
          "SELECT token, cnt, err FROM hh WHERE win_start = '2024-01-01 10:00:00' ORDER BY cnt DESC, token")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(rows == Seq(("alpha", 3L, 0L), ("beta", 1L, 0L), ("gamma", 1L, 0L)))
    } finally q.stop()
  }

  test("heavyHittersStream: eviction keeps the sketch bounded with the space-saving error") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Doc]
    val q = DocStreams.heavyHittersStream(in.toDF(), windowMinutes = 60,
        capacity = 2, nShards = 1, watermark = "10 minutes")
      .writeStream.format("memory").queryName("hh2").outputMode("append").start()
    try {
      // arrival order (ts, token): aa aa aa bb, then cc evicts bb (min=1)
      in.addData(
        Doc(0, "aa aa aa bb", "en", ts("2024-01-01 10:05:00")),
        Doc(1, "cc", "en", ts("2024-01-01 10:15:00")),
        Doc(2, "flush", "en", ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      in.addData(Doc(3, "flush2", "en", ts("2024-01-01 14:00:00")))
      q.processAllAvailable()
      val rows = spark.sql(
          "SELECT token, cnt, err FROM hh2 WHERE win_start = '2024-01-01 10:00:00' ORDER BY cnt DESC, token")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      // only 2 counters survive; cc inherited bb's count as its error bound
      assert(rows == Seq(("aa", 3L, 0L), ("cc", 2L, 1L)))
    } finally q.stop()
  }

  /** Latest reported state-store row count for the query — the measured
    * backing for every "bounded state" claim below. */
  private def stateRows(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
    q.recentProgress.reverse.iterator
      .flatMap(_.stateOperators.headOption).map(_.numRowsTotal)
      .nextOption().getOrElse(-1L)

  test("heavyHittersStream state-size probe: state rows track (window, " +
    "shard) groups, NOT token cardinality — a 10x bigger feed adds none") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Doc]
    val q = DocStreams.heavyHittersStream(in.toDF(), windowMinutes = 60,
        capacity = 8, nShards = 2, watermark = "10 minutes")
      .writeStream.format("memory").queryName("hhprobe").outputMode("append").start()
    try {
      // tokens must be pure a-z (the tokenizer splits on digits): spell
      // the numeric id in letters, so every token is distinct
      def alpha(n: Int): String = n.toString.map(d => ('a' + (d - '0')).toChar)
      def feed(n: Int, off: Int): Unit = {
        in.addData((0 until n).map(i =>
          Doc(off + i, (0 until 20).map(j => s"tok${alpha((off + i) * 20 + j)}")
            .mkString(" "), "en", ts("2024-01-01 10:05:00"))): _*)
        q.processAllAvailable()
      }
      feed(10, 0) // 200 distinct tokens into one open window
      val after1 = stateRows(q)
      assert(after1 > 0 && after1 <= 2,
        s"state rows $after1 exceed the (window, shard) group count")
      feed(100, 1000) // 10x the docs, 2000 more distinct tokens, same window
      val after2 = stateRows(q)
      assert(after2 == after1,
        s"state grew with token cardinality: $after1 -> $after2 rows " +
          "(the capacity-evicting counter map must stay inside the group row)")
    } finally q.stop()
  }

  test("nearDupStream state-size probe: state rows track live BUCKETS, not " +
    "bucket popularity — 10x more members of the same buckets add none") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Doc]
    val q = DocStreams.nearDupStream(in.toDF())
      .writeStream.format("memory").queryName("ndprobe").outputMode("append").start()
    try {
      val text = "the quick brown fox jumps over the lazy dog while the " +
        "cat watches from the warm windowsill every single morning"
      def feed(n: Int, off: Int): Unit = {
        in.addData((0 until n).map(i =>
          Doc(off + i, text, "en", ts("2024-01-01 10:00:00"))): _*)
        q.processAllAvailable()
      }
      feed(5, 0) // identical text: every doc lands in the same 16 band buckets
      val after1 = stateRows(q)
      assert(after1 > 0 && after1 <= 16,
        s"state rows $after1 exceed the band-bucket count")
      feed(50, 100) // 10x the members — same buckets, one (rep, ts) pair each
      val after2 = stateRows(q)
      assert(after2 == after1,
        s"state grew with bucket popularity: $after1 -> $after2 rows")
    } finally q.stop()
  }

  private val baseText = "the quick brown fox jumps over the lazy dog " +
    "while the cat watches from the warm windowsill every single morning"
  private val nearText = "the quick brown fox leaps over the lazy dog " +
    "while the cat watches from the warm windowsill every single morning"
  private val farText = "completely unrelated content about distributed " +
    "query engines shuffling partitioned columnar data across executors"

  test("nearDupStream flags band collisions against the first-arrived representative") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Doc]
    val q = DocStreams.nearDupStream(in.toDF())
      .writeStream.format("memory").queryName("neardup").outputMode("append").start()
    try {
      in.addData(
        Doc(0, baseText, "en", ts("2024-01-01 10:00:00")),
        Doc(1, farText, "en", ts("2024-01-01 10:00:01")))
      q.processAllAvailable()
      // nothing collides yet: base and far share no bands (w=3 shingles)
      assert(spark.sql("SELECT count(*) FROM neardup").as[Long].collect()(0) == 0L)
      in.addData(Doc(2, nearText, "en", ts("2024-01-01 10:00:05")))
      q.processAllAvailable()
      val rows = spark.sql(
          "SELECT DISTINCT doc_id, rep_id FROM neardup")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      // the near-dup flags against doc 0 (its bucket representative), and
      // the far doc never pairs with anything
      assert(rows == Seq((2L, 0L)))
      // batch agreement: the same pair is exactly what the batch LSH op
      // verifies at this threshold
      val batch = graft.llm.Dedup.minHashNearDup(
          Seq((0L, baseText), (1L, farText), (2L, nearText)).toDF("doc_id", "text"),
          threshold = 0.7)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(batch == Seq((0L, 2L)))
    } finally q.stop()
  }

  test("nearDupStream: bucket representatives survive a checkpointed restart") {
    val in = java.nio.file.Files.createTempDirectory("graft_nd_in").toString
    val out = java.nio.file.Files.createTempDirectory("graft_nd_out").toString
    val chk = java.nio.file.Files.createTempDirectory("graft_nd_chk").toString
    def start() = DocStreams.nearDupStream(
        spark.readStream
          .schema("doc_id LONG, text STRING, lang STRING, ts TIMESTAMP")
          .parquet(in))
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", chk)
      .outputMode("append").start()
    Seq(Doc(0, baseText, "en", ts("2024-01-01 10:00:00")))
      .toDF().write.mode("append").parquet(in)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // after a full stop, a near-dup arrives: its bucket representative
    // (doc 0) must come back from the state store, not be re-derived
    Seq(Doc(5, nearText, "en", ts("2024-01-01 10:10:00")))
      .toDF().write.mode("append").parquet(in)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.parquet(out).select("doc_id", "rep_id").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((5L, 0L)))
  }

  // ---- spanDedupStream (r13 verdict #7) ----

  // 10-token "spans" the operator windows on; sN are distinct spans.
  // Letters only: TextAnalysis.tokens splits on [^a-z]+, so a digit in a
  // word would shatter it.
  private def span(n: Int): String = {
    def alpha(i: Int) = ('a' + i).toChar
    (0 until 10).map(j => s"s${alpha(n)}w${alpha(j)}").mkString(" ")
  }

  test("spanDedupStream: an empty-registry batch equals the batch spanDedup " +
    "(MemoryStream parity)") {
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft_span_out").toString
    val reg = java.nio.file.Files.createTempDirectory("graft_span_reg").toString
    val chk = java.nio.file.Files.createTempDirectory("graft_span_chk").toString
    val in = MemoryStream[Doc]
    val batch = Seq(
      Doc(0, span(1) + " " + span(2), "en", ts("2024-01-01 10:00:00")),
      Doc(1, span(1) + " " + span(3), "en", ts("2024-01-01 10:00:05")), // dup span 1
      Doc(2, span(3), "en", ts("2024-01-01 10:00:10")))                 // dup span 3
    val q = DocStreams.spanDedupStream(in.toDF(), out, reg, chk)
    try { in.addData(batch: _*); q.processAllAvailable() } finally q.stop()
    val got = spark.read.parquet(out)
      .select("doc_id", "n_spans", "n_spans_kept", "text_clean")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1).toSeq
    val expected = graft.llm.Dedup.spanDedup(batch.toDF())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1).toSeq
    assert(got == expected)
    // the registry partition carries the batch's distinct span hashes
    assert(spark.read.parquet(reg).count() == 3L) // spans 1, 2, 3
  }

  test("spanDedupStream: a later batch is cleaned against the persisted " +
    "registry across a restart; a no-op restart changes nothing") {
    val in = java.nio.file.Files.createTempDirectory("graft_spanr_in").toString
    val out = java.nio.file.Files.createTempDirectory("graft_spanr_out").toString
    val reg = java.nio.file.Files.createTempDirectory("graft_spanr_reg").toString
    val chk = java.nio.file.Files.createTempDirectory("graft_spanr_chk").toString
    def start() = DocStreams.spanDedupStream(
      spark.readStream
        .schema("doc_id LONG, text STRING, lang STRING, ts TIMESTAMP")
        .parquet(in), out, reg, chk)
    val phase1 = Seq(
      Doc(0, span(1) + " " + span(2), "en", ts("2024-01-01 10:00:00")),
      Doc(1, span(3), "en", ts("2024-01-01 10:00:05")))
    phase1.toDF().write.mode("append").parquet(in)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // doc 2 repeats spans 1 and 3 from LAST MONTH's ingest (the registry,
    // not executor state, remembers them across the stop) + fresh span 4
    val phase2 = Seq(
      Doc(2, span(1) + " " + span(4) + " " + span(3), "en", ts("2024-01-02 10:00:00")))
    phase2.toDF().write.mode("append").parquet(in)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val batch2 = spark.read.parquet(s"$out/batch=1")
      .select("doc_id", "n_spans", "n_spans_kept", "text_clean")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(batch2 == Seq((2L, 3L, 1L, span(4)))) // spans 1+3 excised, 4 kept
    // and the per-batch fold equals the batch-tier incremental operator
    val viaBatchTier = graft.llm.Dedup.spanDedupAgainstRegistry(
        phase2.toDF(), graft.llm.Dedup.spanRegistry(phase1.toDF()))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(batch2 == viaBatchTier)
    // no-op restart: no new batch partitions, outputs untouched
    val before = spark.read.parquet(out).count()
    val q3 = start()
    try q3.processAllAvailable() finally q3.stop()
    assert(spark.read.parquet(out).count() == before)
    assert(spark.read.parquet(reg).count() == 4L) // spans 1..4, once each
  }

  test("substringDedupStream: cross-batch duplicated REGIONS are excised at " +
    "shifted alignments via the persisted registry") {
    val in = java.nio.file.Files.createTempDirectory("graft_subr_in").toString
    val out = java.nio.file.Files.createTempDirectory("graft_subr_out").toString
    val reg = java.nio.file.Files.createTempDirectory("graft_subr_reg").toString
    val chk = java.nio.file.Files.createTempDirectory("graft_subr_chk").toString
    def start() = DocStreams.substringDedupStream(
      spark.readStream
        .schema("doc_id LONG, text STRING, lang STRING, ts TIMESTAMP")
        .parquet(in), out, reg, chk)
    // batch 0 establishes a 12-token document
    val phase1 = Seq(Doc(0, span(1) + " ya yb", "en", ts("2024-01-01 10:00:00")))
    phase1.toDF().write.mode("append").parquet(in)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // batch 1 repeats doc 0's 12 tokens at a SHIFTED alignment (2 fresh
    // lead-in tokens) — the span tier would miss this; stride-1 shingles
    // cover all 12 duplicated positions, leaving only the lead-in
    val phase2 = Seq(
      Doc(1, "za zb " + span(1) + " ya yb", "en", ts("2024-01-02 10:00:00")))
    phase2.toDF().write.mode("append").parquet(in)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val batch2 = spark.read.parquet(s"$out/batch=1")
      .select("doc_id", "n_tokens", "n_tokens_kept", "n_dup_runs", "text_clean")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4))).toSeq
    assert(batch2 == Seq((1L, 14L, 2L, 1L, "za zb")),
      s"shifted cross-batch region not excised: $batch2")
    // equals the batch-tier incremental operator on the same split
    val viaBatchTier = graft.llm.Dedup.substringDedupAgainstRegistry(
        phase2.toDF(), graft.llm.Dedup.substringRegistry(phase1.toDF()))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4))).toSeq
    assert(batch2 == viaBatchTier)
  }

  test("substring registry: fold ≡ rescan, and a cross-hash-universe " +
    "registry fails LOUDLY at the consumer") {
    val a = Seq(Doc(0, span(1) + " " + span(2), "en", ts("2024-01-01 10:00:00"))).toDF()
    val b = Seq(Doc(1, span(2) + " " + span(3), "en", ts("2024-01-01 11:00:00"))).toDF()
    val folded = graft.llm.Dedup.mergeSubstringRegistries(
        graft.llm.Dedup.substringRegistry(a), graft.llm.Dedup.substringRegistry(b))
      .select("h").as[Long].collect().sorted.toSeq
    val rescan = graft.llm.Dedup.substringRegistry(a.unionByName(b))
      .select("h").as[Long].collect().sorted.toSeq
    assert(folded == rescan && folded.nonEmpty)
    // a rolling-hash registry consumed by the string-hash tier must throw,
    // not silently excise nothing (disjoint hash universes)
    val wrongUniverse = graft.llm.Dedup.substringRegistry(a, rollingHash = true)
    val ex = intercept[Exception] {
      graft.llm.Dedup.substringDedupAgainstRegistry(b, wrongUniverse).collect()
    }
    assert(ex.getMessage != null)
  }

  test("span registry fold ≡ rescan (mergeSpanRegistries property)") {
    val a = Seq(Doc(0, span(1) + " " + span(2), "en", ts("2024-01-01 10:00:00"))).toDF()
    val b = Seq(Doc(1, span(2) + " " + span(3), "en", ts("2024-01-01 11:00:00"))).toDF()
    val folded = graft.llm.Dedup.mergeSpanRegistries(
        graft.llm.Dedup.spanRegistry(a), graft.llm.Dedup.spanRegistry(b))
      .as[Long].collect().sorted.toSeq
    val rescan = graft.llm.Dedup.spanRegistry(a.unionByName(b))
      .as[Long].collect().sorted.toSeq
    assert(folded == rescan && folded.size == 3)
  }

}
