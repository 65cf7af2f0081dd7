package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One token observation routed to its (window, shard) state cell. `ts` is
  * the original WATERMARKED event-time column — it must survive into the
  * grouped Dataset or Spark rejects the event-time timeout. */
private case class TokenObs(winStartMs: Long, shard: Int,
                            ts: java.sql.Timestamp, token: String)

/** A heavy-hitter row emitted at window close: `cnt` overestimates the true
  * count by at most `err` (space-saving guarantee). */
case class HeavyHitter(win_start: java.sql.Timestamp, shard: Int,
                       token: String, cnt: Long, err: Long)

private case class HHState(counts: Map[String, (Long, Long)])

/** One banded MinHash observation routed to its LSH bucket. `ts` is the
  * watermarked event-time column (same survival rule as [[TokenObs]]). */
private case class BandObs(band: Int, bh: Long,
                           ts: java.sql.Timestamp, docId: Long)

/** A streaming near-dup candidate: `doc_id` collided with its bucket's
  * representative `rep_id` in LSH band `band`. Candidates, not verdicts —
  * band collision bounds Jaccard only probabilistically; verification
  * (exact Jaccard over the two texts) runs downstream where both texts are
  * addressable. */
case class NearDupCandidate(doc_id: Long, rep_id: Long, band: Int)

private case class BucketState(repId: Long, lastSeenMs: Long)

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

  /** Streaming face of the weighted deterministic sampler
    * ([[graft.llm.Sampling.weightedSample]]) — the last batch-only family
    * gap after curation closed in r12: the IDENTICAL map-only keep
    * predicate (Knuth-hash bucket of the id < weight·100) applied per
    * arriving row, stamped with its tumbling ingest window. STATELESS by
    * construction — membership depends only on (id, weight), so the
    * streamed sample over any window equals the batch sample of exactly
    * that window's rows (parity property-tested), checkpoint restarts
    * replay identically, and a document sampled today stays sampled as
    * the corpus grows (the batch tier's key-stable contract). The
    * watermark is declared so downstream windowed consumers can aggregate
    * the sampled feed directly; the sampler itself keeps zero state. */
  def weightedSampleStream(docs: DataFrame, weightCol: String = "quality",
                           idCol: String = "doc_id", tsCol: String = "ts",
                           window: String = "1 hour",
                           watermark: String = "2 hours"): DataFrame =
    docs.withWatermark(tsCol, watermark)
      .where(graft.llm.Sampling.knuthBucket(col(idCol)) < col(weightCol) * lit(100))
      .withColumn("win_start",
        org.apache.spark.sql.functions.window(col(tsCol), window).getField("start"))

  /** Streaming heavy hitters with BOUNDED state: per tumbling window, the
    * token stream shards by hash into `nShards` space-saving sketches of
    * `capacity` counters each (a plain windowed `groupBy(token)` keeps
    * state per DISTINCT token — unbounded on an open vocabulary; this keeps
    * `nShards × capacity` counters per window, full stop).
    *
    * Space-saving eviction: a new token beyond capacity replaces the
    * current minimum, inheriting its count as the overestimate bound —
    * every emitted `cnt` exceeds the true count by at most `err`, and any
    * token with true count > min-counter is guaranteed present. Sharding by
    * token hash parallelizes the sketch across tasks AND keeps per-token
    * counts exact-per-shard (a token always lands in the same shard, so
    * shard results need no cross-merge).
    *
    * Rows emit only when the watermark passes the window end (event-time
    * timeout), one batch of (token, cnt, err) per (window, shard); the
    * sink applies the final top-k order. Group iterators fold in
    * (ts, token) order so checkpoint replays are deterministic. */
  def heavyHittersStream(docs: DataFrame, windowMinutes: Int = 60,
                         capacity: Int = 1000, nShards: Int = 16,
                         textCol: String = "text", tsCol: String = "ts",
                         watermark: String = "2 hours"): Dataset[HeavyHitter] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val winMs = windowMinutes * 60000L
    val toks = docs.withWatermark(tsCol, watermark)
      .select(col(tsCol),
        explode(graft.llm.TextAnalysis.tokens(col(textCol))).as("token"))
      .select(
        (floor(unix_millis(col(tsCol)) / winMs) * winMs).as("winStartMs"),
        pmod(xxhash64(col("token")), lit(nShards)).cast("int").as("shard"),
        col(tsCol).as("ts"), col("token"))
      .as[TokenObs]
    toks.groupByKey(o => (o.winStartMs, o.shard))
      .flatMapGroupsWithState[HHState, HeavyHitter](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case ((winStartMs, shard), it, state: GroupState[HHState]) =>
          var counts = state.getOption.map(_.counts).getOrElse(Map.empty)
          for (o <- it.toSeq.sortBy(o => (o.ts.getTime, o.token))) {
            counts.get(o.token) match {
              case Some((c, e)) => counts = counts.updated(o.token, (c + 1, e))
              case None if counts.size < capacity =>
                counts = counts.updated(o.token, (1L, 0L))
              case None =>
                // evict the (count, token)-min counter; inherit its count
                val (mt, (mc, _)) = counts.minBy { case (t, (c, _)) => (c, t) }
                counts = (counts - mt).updated(o.token, (mc + 1, mc))
            }
          }
          val winEnd = winStartMs + winMs
          val wm = state.getCurrentWatermarkMs()
          if (wm >= winEnd) {
            state.remove()
            counts.toSeq.sortBy { case (t, (c, _)) => (-c, t) }.iterator.map {
              case (t, (c, e)) =>
                HeavyHitter(new java.sql.Timestamp(winStartMs), shard, t, c, e)
            }
          } else {
            state.update(HHState(counts))
            state.setTimeoutTimestamp(math.max(winEnd, wm + 1))
            Iterator.empty
          }
      }
  }

  /** Streaming MinHash-LSH near-duplicate CANDIDATES — the streaming face of
    * [[graft.llm.Dedup.minHashNearDup]]'s banding stage: each arriving
    * document's k-hash signature (the identical codegen'd
    * [[graft.llm.Dedup.minHashSignature]] the batch op uses, so batch and
    * stream bucket identically) explodes into `bands` (band, band-hash)
    * bucket keys; the FIRST document into a bucket becomes its
    * representative, and every later arrival emits a
    * (doc_id, rep_id, band) candidate row.
    *
    * State is ONE (repId, lastSeen) pair per live bucket — NOT the texts,
    * not the signatures, not the member list — so state size tracks the
    * number of distinct buckets inside the TTL horizon, independent of both
    * document length and bucket popularity; a boilerplate bucket that would
    * need `maxBucket` capping in batch costs a streaming bucket exactly one
    * pair. Buckets expire via event-time timeout `bucketTtlMinutes` after
    * their last arrival.
    *
    * Determinism/replay: within a micro-batch, arrivals fold in (ts, docId)
    * order; across batches the earlier batch's representative wins
    * (first-wins, like `dropDuplicatesWithinWatermark`). Checkpoint replays
    * re-run the same batch boundaries, so recovery emits identical rows.
    * The same (doc, rep) pair may surface from several bands — downstream
    * verification dedups pairs as its first step (batch does the same with
    * `dropDuplicates` before its Jaccard verify). */
  def nearDupStream(docs: DataFrame, k: Int = 128, bands: Int = 16,
                    seed: Long = 42L, w: Int = 3, bucketTtlMinutes: Int = 120,
                    idCol: String = "doc_id", textCol: String = "text",
                    tsCol: String = "ts",
                    watermark: String = "1 hour"): Dataset[NearDupCandidate] = {
    require(k % bands == 0, s"k ($k) must be divisible by bands ($bands)")
    val r = k / bands
    val spark = docs.sparkSession
    import spark.implicits._
    val ttlMs = bucketTtlMinutes * 60000L
    val sig = docs.withWatermark(tsCol, watermark)
      .select(col(tsCol).as("ts"), col(idCol).cast("long").as("docId"),
        graft.llm.Dedup.minHashSignature(
          graft.llm.Dedup.shingleHashes(col(textCol), w), k, seed).as("sig"))
    val bandStructs = (0 until bands).map(bIdx =>
      struct(lit(bIdx).as("band"),
        xxhash64(slice(col("sig"), bIdx * r + 1, r)).as("bh")))
    val banded = sig
      .select(col("ts"), col("docId"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("bb.band").as("band"), col("bb.bh").as("bh"),
        col("ts"), col("docId"))
      .as[BandObs]
    banded.groupByKey(o => (o.band, o.bh))
      .flatMapGroupsWithState[BucketState, NearDupCandidate](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case ((band, _), it, state: GroupState[BucketState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var st = state.getOption.orNull
            val out = scala.collection.mutable.ArrayBuffer.empty[NearDupCandidate]
            var lastMs = if (st == null) 0L else st.lastSeenMs
            for (o <- it.toSeq.sortBy(o => (o.ts.getTime, o.docId))) {
              lastMs = math.max(lastMs, o.ts.getTime)
              if (st == null) st = BucketState(o.docId, lastMs)
              else if (o.docId != st.repId)
                out += NearDupCandidate(o.docId, st.repId, band)
            }
            state.update(BucketState(st.repId, lastMs))
            state.setTimeoutTimestamp(
              math.max(lastMs + ttlMs, state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }

  /** Streaming face of the SPAN dedup tier (r13 verdict #7) — the C4-style
    * operator production pipelines run CONTINUOUSLY on incoming crawl —
    * against a PERSISTED span-hash registry, the [[graft.llm.Dedup.sourceSketches]]
    * daily-fold pattern rather than in-executor state: one winner per
    * distinct span EVER SEEN can't be watermark-bounded (the whole point is
    * remembering last month's spans), so the registry lives as parquet
    * next to the ingest batches and each micro-batch folds into it.
    *
    * Per micro-batch: clean the batch against the registry of all PRIOR
    * batches ([[graft.llm.Dedup.spanDedupAgainstRegistry]] — within-batch
    * winners are min (id, span_idx), cross-batch first-arrival wins), write
    * the cleaned docs to `outDir/batch=<id>` and the batch's new span
    * hashes to `registryDir/batch=<id>`. Both writes OVERWRITE their own
    * batch partition and the registry read filters to `batch < current`,
    * so a checkpoint-replayed batch reproduces byte-identical output
    * instead of double-counting itself (restart-idempotence is the test
    * contract). Registry fold ≡ rescan is [[graft.llm.Dedup.mergeSpanRegistries]]'
    * property. Scale shape: the anti-join ships 8-byte hashes both sides;
    * batch text never crosses an exchange (same plan as the batch tier). */
  def spanDedupStream(docs: DataFrame, outDir: String, registryDir: String,
                      checkpointDir: String, spanTokens: Int = 10,
                      textCol: String = "text", idCol: String = "doc_id")
      : org.apache.spark.sql.streaming.StreamingQuery =
    registryFoldStream(docs, outDir, registryDir, checkpointDir,
      empty = s => { import s.implicits._; Seq.empty[Long].toDF("h") },
      clean = (batch, prior) => graft.llm.Dedup.spanDedupAgainstRegistry(
        batch, prior, spanTokens, textCol, idCol),
      newHashes = batch =>
        graft.llm.Dedup.spanRegistry(batch, spanTokens, textCol, idCol))

  /** Streaming face of the SUBSTRING dedup tier (ExactSubstr) — the same
    * persisted-registry fold as [[spanDedupStream]] over the stride-1
    * shingle-hash registry: a duplicated region shared with ANY prior
    * batch is excised at any alignment, keep-first across arrival order.
    * `rollingHash = true` runs the O(L) NgramHashes tier (registry stamped
    * with its hash universe; a mismatched registry fails loudly). */
  def substringDedupStream(docs: DataFrame, outDir: String, registryDir: String,
                           checkpointDir: String, minTokens: Int = 10,
                           textCol: String = "text", idCol: String = "doc_id",
                           rollingHash: Boolean = false)
      : org.apache.spark.sql.streaming.StreamingQuery =
    registryFoldStream(docs, outDir, registryDir, checkpointDir,
      empty = s => { import s.implicits._
        Seq.empty[(Long, Int)].toDF("h", "hash_v") },
      clean = (batch, prior) => graft.llm.Dedup.substringDedupAgainstRegistry(
        batch, prior, minTokens, textCol, idCol, rollingHash),
      newHashes = batch => graft.llm.Dedup.substringRegistry(
        batch, minTokens, textCol, idCol, rollingHash))

  /** The shared persisted-registry micro-batch fold (span + substring
    * tiers): per batch, clean against the registry of all PRIOR batches,
    * write cleaned docs to `outDir/batch=<id>` and the hashes this batch
    * ADDS to `registryDir/batch=<id>`. Both writes OVERWRITE their own
    * batch partition and the registry read filters to `batch < current`,
    * so a checkpoint-replayed batch reproduces byte-identical output
    * instead of double-counting itself. Persisting only the DELTA keeps
    * the registry proportional to the distinct-hash universe, not to
    * ingest volume (re-ingested content is common day over day); the
    * anti-join ships 8-byte hashes on both sides. */
  private def registryFoldStream(docs: DataFrame, outDir: String,
                                 registryDir: String, checkpointDir: String,
                                 empty: org.apache.spark.sql.SparkSession => DataFrame,
                                 clean: (DataFrame, DataFrame) => DataFrame,
                                 newHashes: DataFrame => DataFrame)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val prior = priorRegistry(spark, registryDir, batchId, empty)
        clean(batch, prior).write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
        newHashes(batch)
          .join(prior.select("h"), Seq("h"), "left_anti")
          .write.mode("overwrite").parquet(s"$registryDir/batch=$batchId")
        ()
      }
      .start()

  /** Union of the registry partitions written by batches BEFORE `batchId` —
    * the replay guard: a restarted batch must not see its own (possibly
    * partially written) registry partition as "prior corpus". */
  private def priorRegistry(spark: org.apache.spark.sql.SparkSession,
                            registryDir: String, batchId: Long,
                            empty: org.apache.spark.sql.SparkSession => DataFrame)
      : DataFrame = {
    // Hadoop FS, not java.io — the registry lives wherever the ingest
    // batches do (HDFS/S3 at scale, local in tests)
    val root = new org.apache.hadoop.fs.Path(registryDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs =
      if (!fs.exists(root)) Array.empty[String]
      else fs.listStatus(root)
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
        .map(s => (s.getPath.getName.stripPrefix("batch=").toLong, s.getPath.toString))
        .filter(_._1 < batchId)
        .map(_._2)
    if (dirs.isEmpty) empty(spark)
    else spark.read.parquet(dirs.toIndexedSeq: _*)
  }
}
