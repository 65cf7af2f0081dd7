package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.llm.Similarity

/** Streaming faces of the similarity-search operators — ANN as a service
  * over the engine's embedding index, the query half of the batch LSH tier.
  *
  * Reference scope note (SURVEY §0): the reference library is batch-only
  * plotting; streaming similarity is engine-added surface for the
  * training-data-pipeline brief, like the rest of graft.streaming.
  */
object VectorStreams {

  /** Map-only SRP probe expansion shared by the windowed and the refreshing
    * faces: `q` must carry `qid`/`qv`/`qn` (plus any pass-through columns,
    * e.g. the windowed face's `ts`); the result appends (`tbl`, `bkt`) with
    * the 1-bit multiprobe applied — `nTables·(nBits+1)` slim rows per query,
    * the exact seed derivation [[Similarity.bucketedTables]] buckets the
    * corpus with, so the two sides of the equi-join cannot drift. */
  private def probeQueries(q: DataFrame, nBits: Int, dim: Int, seed: Long,
                           nTables: Int): DataFrame = {
    val passThrough = q.columns.map(col).toSeq
    val qTables = explode(array((0 until nTables).map(ti =>
      struct(lit(ti).as("tbl"),
        Similarity.srpBucket(col("qv"), nBits, dim, seed + ti * 1000003L).as("bkt"))): _*))
    q.select(passThrough :+ qTables.as("tb"): _*)
      .select(passThrough ++ Seq(col("tb.tbl").as("tbl"), col("tb.bkt").as("bkt")): _*)
      .select(passThrough ++ Seq(col("tbl"), Similarity.multiprobe(nBits).as("bkt")): _*)
  }

  /** Streaming approximate nearest neighbors: a watermarked stream of query
    * vectors scored against a STATIC corpus through the SAME SRP-LSH
    * machinery as the batch tier ([[Similarity.lshAnnTopK]] — shared
    * `bucketedTables`/`multiprobe` helpers, so the seed derivation and
    * bucket-key shape cannot drift between the batch and streaming faces).
    * Per event-time window, each query's top-k lands at window close.
    *
    * Shape, stage by stage:
    *   1. query side: map-only SRP bucketing + 1-bit multiprobe per table —
    *      `nTables·(nBits+1)` slim probe rows per query, no state;
    *   2. candidate side: the static corpus bucketed ONCE per (re)start —
    *      at 100 TB this is the resident index a serving job holds;
    *   3. stream-static equi-join on (tbl, bkt) — STATELESS (static side
    *      joins are not stateful in Structured Streaming), work is
    *      Σ_bucket |Q_b|·|C_b| exactly like the batch tier;
    *   4. multiprobe/table duplicate pairs collapse in a first windowed agg
    *      (max of identical sims — deterministic), then the bounded-heap
    *      [[graft.functions.TopKAgg]] keeps k per query — no per-query sort,
    *      state per open (window, qid) is the k-element heap plus the
    *      pair-dedup rows, both watermark-bounded.
    *
    * Chained stateful aggregations in append mode are a Spark 3.4+/4.x
    * capability; both aggs share the one event-time watermark. */
  def annQueryStream(queries: DataFrame, corpus: DataFrame, k: Int = 5,
                     nBits: Int = 8, dim: Int = 64, seed: Long = 42L,
                     nTables: Int = 2, windowMinutes: Int = 5,
                     watermark: String = "10 minutes",
                     qidCol: String = "query_id", vecCol: String = "embedding",
                     tsCol: String = "ts",
                     corpusIdCol: String = "vec_id",
                     corpusVecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"k $k must be >= 1")
    val base = corpus.select(col(corpusIdCol).as("id"), col(corpusVecCol).as("v"),
      Similarity.norm(col(corpusVecCol)).as("nrm"))
    val cand = Similarity.bucketedTables(base, nBits, dim, seed, nTables)
      .toDF("nid", "nv", "nn", "tbl", "bkt")
    val qBase = queries.withWatermark(tsCol, watermark)
      .select(col(qidCol).as("qid"), col(vecCol).as("qv"), col(tsCol).as("ts"))
      .withColumn("qn", Similarity.norm(col("qv")))
    val q = probeQueries(qBase, nBits, dim, seed, nTables)
    val win = window(col("ts"), s"$windowMinutes minutes")
    val scored = q.join(cand, Seq("tbl", "bkt"))
      .select(col("qid"), col("ts"), col("nid"),
        Similarity.cosine9(Similarity.dot(col("qv"), col("nv")),
          col("qn"), col("nn")).as("sim"))
    // agg 1 collapses multiprobe/table repeats of the same (query, neighbor)
    // pair (their sims are identical; max is a deterministic pick), agg 2 is
    // the bounded-heap top-k — both keyed by the same event-time window
    val uniq = scored.groupBy(win.as("window"), col("qid"), col("nid"))
      .agg(max(col("sim")).as("sim"))
    uniq.groupBy(col("window"), col("qid"))
      .agg(graft.functions.TopKAgg.top_k_by(col("sim"), col("nid"), k).as("top"))
      .select(col("window"), col("qid"), posexplode(col("top")))
      .select(col("window").getField("start").as("window_start"), col("qid"),
        (col("pos") + 1).cast("int").as("rnk"),
        col("col.id").as("nid"), col("col.ord").as("sim"))
  }

  /** One micro-batch of query vectors scored against one corpus snapshot —
    * the batch core of [[annServeRefreshing]], same probe/score/top-k
    * algebra as [[annQueryStream]] minus event-time windowing (the
    * micro-batch IS the unit of emission there). Returns
    * (qid, rnk, nid, sim). */
  private[streaming] def annTopKBatch(queries: DataFrame, corpus: DataFrame,
      k: Int, nBits: Int, dim: Int, seed: Long, nTables: Int,
      qidCol: String, vecCol: String,
      corpusIdCol: String, corpusVecCol: String): DataFrame = {
    val base = corpus.select(col(corpusIdCol).as("id"), col(corpusVecCol).as("v"),
      Similarity.norm(col(corpusVecCol)).as("nrm"))
    val cand = Similarity.bucketedTables(base, nBits, dim, seed, nTables)
      .toDF("nid", "nv", "nn", "tbl", "bkt")
    val qBase = queries.select(col(qidCol).as("qid"), col(vecCol).as("qv"))
      .withColumn("qn", Similarity.norm(col("qv")))
    val scored = probeQueries(qBase, nBits, dim, seed, nTables)
      .join(cand, Seq("tbl", "bkt"))
      .select(col("qid"), col("nid"),
        Similarity.cosine9(Similarity.dot(col("qv"), col("nv")),
          col("qn"), col("nn")).as("sim"))
    scored.groupBy(col("qid"), col("nid")).agg(max(col("sim")).as("sim"))
      .groupBy(col("qid"))
      .agg(graft.functions.TopKAgg.top_k_by(col("sim"), col("nid"), k).as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), (col("pos") + 1).cast("int").as("rnk"),
        col("col.id").as("nid"), col("col.ord").as("sim"))
  }

  /** Streaming ANN with a REFRESHING index: unlike [[annQueryStream]], whose
    * static corpus side is bucketed once per (re)start, this face re-opens
    * the corpus directory at every micro-batch — a fresh read means a fresh
    * file listing, so vectors appended to `corpusDir` between batches become
    * searchable by the NEXT query batch without a stream restart. This is
    * the serving-job answer to a growing corpus; the windowed face remains
    * the right shape when the index is genuinely immutable per run.
    *
    * Execution shape per micro-batch (the [[ScdStream]] versioned-snapshot
    * precedent, applied to a result sink):
    *   1. list + read `corpusDir` fresh (new file index each trigger). The
    *      declared trade vs the static face: re-bucketing |corpus| every
    *      trigger buys zero index staleness; trigger cadence controls the
    *      ratio, and at 100 TB the refinement is persisting BUCKETED
    *      snapshots (tbl/bkt-partitioned parquet, rebuilt incrementally the
    *      way ScdStream persists merged dimensions) so a trigger reads only
    *      the buckets its probes hit;
    *   2. score the batch's queries through [[annTopKBatch]] — identical
    *      probe seeds and top-k algebra as the static face;
    *   3. commit results to `outDir/b=<batchId>` with OVERWRITE: a replayed
    *      batch rewrites its own directory, so downstream readers keyed on
    *      `_SUCCESS` markers see each batch's answers exactly once (same
    *      torn-write contract as ScdStream's `v=<batchId>` snapshots).
    *      Replay determinism caveat, stated: if the corpus grew between a
    *      crash and the replay, the rewritten answers reflect the NEWER
    *      index — acceptable for serving (fresher neighbors), unlike a
    *      ledger. */
  def annServeRefreshing(queries: DataFrame, corpusDir: String, outDir: String,
                         checkpoint: String, k: Int = 5,
                         nBits: Int = 8, dim: Int = 64, seed: Long = 42L,
                         nTables: Int = 2,
                         qidCol: String = "query_id", vecCol: String = "embedding",
                         corpusIdCol: String = "vec_id",
                         corpusVecCol: String = "embedding"): StreamingQuery = {
    require(k >= 1, s"k $k must be >= 1")
    queries.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        serveBatch(batch, batchId, corpusDir, outDir, k, nBits, dim, seed,
          nTables, qidCol, vecCol, corpusIdCol, corpusVecCol)
      }
      .start()
  }

  /** Streaming k-center coreset per event-time window — the streaming
    * sibling the batch curation family lacked (r11 verdict item #7:
    * MMR/k-center were batch-only). Each window's vector stream folds
    * through [[graft.functions.KCenterAgg]], the doubling-algorithm
    * k-center (Charikar et al. 1997): bounded state of ≤ k weighted
    * centers + one radius PER OPEN WINDOW no matter how many vectors
    * arrive, mergeable across partitions, one pass per vector — where the
    * batch greedy ([[graft.llm.Similarity.kCenterSelect]]) re-scans the
    * corpus k times and stays the frozen-window verifier.
    *
    * Emission: append mode at watermark close, one row per (window,
    * center) with the center's representative id, fold weight, unit
    * vector, and the window's final merge radius (every folded vector is
    * within 2·radius chordal distance of its center — the coverage audit).
    * State is watermark-bounded: closed windows evict, the state store
    * holds exactly the open windows' coresets (probe-tested in
    * VectorStreamsSpec, the zero-state-rows precedent). */
  def coresetStream(vectors: DataFrame, k: Int = 8,
                    windowMinutes: Int = 5, watermark: String = "10 minutes",
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    tsCol: String = "ts"): DataFrame = {
    require(k >= 1, s"k $k must be >= 1")
    val win = window(col(tsCol), s"$windowMinutes minutes")
    vectors.withWatermark(tsCol, watermark)
      .select(col(tsCol), col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .groupBy(win.as("window"))
      .agg(graft.functions.KCenterAgg.k_center_agg(col("id"), col("v"), k).as("cs"))
      .select(col("window"), col("cs.radius").as("radius"),
        posexplode(col("cs.centers")))
      .select(col("window").getField("start").as("window_start"),
        (col("pos") + 1).cast("int").as("center_idx"),
        col("col.id").as("center_id"), col("col.weight").as("weight"),
        col("col.center").as("center"), col("radius"))
  }

  /** The per-trigger body of [[annServeRefreshing]], exposed (like
    * [[ScdStream.applyScdBatch]]) so the crash-replay contract is directly
    * testable: re-invoking a batchId OVERWRITES its own `b=<batchId>`
    * directory, deterministically for an unchanged corpus.
    *
    * No isEmpty pre-probe: it would cost a second evaluation of the
    * micro-batch source per trigger (once for the probe, again for the
    * real query), and skipping empty batches leaves holes in the
    * `b=<batchId>` sequence. An empty batch writes an empty _SUCCESS-marked
    * directory instead, so downstream batch-id readers always see a
    * contiguous, replay-stable sequence. */
  private[streaming] def serveBatch(batch: DataFrame, batchId: Long,
      corpusDir: String, outDir: String, k: Int, nBits: Int, dim: Int,
      seed: Long, nTables: Int, qidCol: String, vecCol: String,
      corpusIdCol: String, corpusVecCol: String): Unit = {
    val corpus = batch.sparkSession.read.parquet(corpusDir)
    annTopKBatch(batch, corpus, k, nBits, dim, seed, nTables,
        qidCol, vecCol, corpusIdCol, corpusVecCol)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").parquet(s"$outDir/b=$batchId")
  }
}
