package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

case class Doc(doc_id: Long, text: String, lang: String, ts: Timestamp)

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
}
