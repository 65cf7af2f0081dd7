package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming faces of the document/text operators — the ingest half of a
  * training-data pipeline: documents arrive as a stream (with an ingest
  * timestamp), get exact-deduped on content hash within a watermark, and
  * feed the same expression-tree text analytics the batch operators use.
  * Everything here is the identical Column logic as graft.llm.TextAnalysis /
  * Dedup — the point of the Spark-native design is that batch and streaming
  * share one declarative core. */
object DocStreams {

  /** Streaming exact dedup on the 64-bit content hash: first arrival wins,
    * watermark bounds the seen-set state (the streaming face of
    * Dedup.dropExactDups). `tsCol` is the ingest timestamp. */
  def dedupExactStream(docs: DataFrame, textCol: String = "text",
                       tsCol: String = "ts", watermark: String = "1 hour"): DataFrame =
    docs.withColumn("__h", xxhash64(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__h")
      .drop("__h")

  /** Streaming vocabulary counts: running top tokens in complete mode
    * (the streaming face of TextAnalysis.topTokens; the sink applies the
    * ordering/limit — complete-mode aggregations cannot sort upstream). */
  def tokenCountsStream(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(graft.llm.TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))

  /** Streaming per-language document counts over tumbling ingest windows —
    * corpus-composition monitoring for an ingest pipeline. */
  def langMixStream(docs: DataFrame, langCol: String = "lang", tsCol: String = "ts",
                    window: String = "1 hour", watermark: String = "2 hours"): DataFrame =
    docs.withWatermark(tsCol, watermark)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window), col(langCol))
      .agg(count(lit(1)).as("n_docs"))
      .select(col("window.start").as("win_start"), col(langCol), col("n_docs"))

  /** Streaming quality gate monitor: per tumbling ingest window, documents
    * seen, documents passing the Gopher rule filter, and the pass rate —
    * the live dashboard over an ingest feed (the streaming face of
    * [[graft.llm.TextAnalysis.gopherFilter]]; the verdict expression is the
    * SAME map-only Column tree, evaluated per arriving row before the
    * windowed count — watermark-bounded state, exact-integer counts, one
    * double division per window). */
  def qualityGateStream(docs: DataFrame, textCol: String = "text", tsCol: String = "ts",
                        window: String = "1 hour", watermark: String = "2 hours"): DataFrame =
    docs.select(col(tsCol),
        graft.llm.TextAnalysis.gopherPass(col(textCol)).as("ok"))
      .withWatermark(tsCol, watermark)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("ok"), 1L).otherwise(0L)).as("n_pass"))
      .select(col("window.start").as("win_start"), col("n_docs"), col("n_pass"),
        (col("n_pass").cast("double") / col("n_docs")).as("pass_rate"))
}
