package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.llm.Similarity

/** Streaming faces of the similarity-search operators — ANN as a service
  * over the engine's embedding index, the query half of the batch LSH tier.
  *
  * Reference scope note (SURVEY §0): the reference library is batch-only
  * plotting; streaming similarity is engine-added surface for the
  * training-data-pipeline brief, like the rest of graft.streaming.
  */
object VectorStreams {

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
    val qTables = explode(array((0 until nTables).map(ti =>
      struct(lit(ti).as("tbl"),
        Similarity.srpBucket(col("qv"), nBits, dim, seed + ti * 1000003L).as("bkt"))): _*))
    val q = qBase.select(col("qid"), col("qv"), col("qn"), col("ts"), qTables.as("tb"))
      .select(col("qid"), col("qv"), col("qn"), col("ts"),
        col("tb.tbl").as("tbl"), col("tb.bkt").as("bkt"))
      .select(col("qid"), col("qv"), col("qn"), col("ts"), col("tbl"),
        Similarity.multiprobe(nBits).as("bkt"))
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
}
