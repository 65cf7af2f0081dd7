package graft.llm

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.Tag

/** Tag for tests that chew on the full sf0.1 bench tables (~seconds each,
  * not milliseconds). Run by default in `sbt test`; excludable with
  * `sbt "testOnly -- -l graft.Slow"` for a quick edit loop. */
object Slow extends Tag("graft.Slow")

/** Bench-scale recall bounds for the approximate (LSH/IVF/MinHash) tiers.
  *
  * The unit specs assert recall on small planted fixtures; this suite
  * re-asserts at sf0.1 bench scale (2000 real 64-dim vectors, augmented to
  * 8000 with planted twins below / 5000 docs).
  *
  * Measured ground truth about the bench embeddings: they are
  * isotropic-random — a vector's brute-force top-5 cosines are ≈ 0.33-0.45
  * against a background mean of ≈ 0 (verified via an exact all-pairs scan).
  * With no similarity gap, recovering brute top-k sub-quadratically is
  * information-theoretically hopeless for ANY bucketing method (per-bit SRP
  * agreement at cosine 0.35 is ~0.61 ≈ a coin flip), so asserting 0.8
  * recall on the raw corpus would only test the noise floor. The ANN/kNN
  * assertions therefore run on the bench vectors AUGMENTED with planted
  * near-neighbors (deterministic ±noise twins at cosine ≈ 0.95) — bench
  * scale, real vector distribution, and a defined ground truth matching the
  * near-dup regime the approximate tiers are declared for. The near-dup and
  * MinHash assertions below run on the raw corpora unmodified, since their
  * thresholds already target genuinely-similar pairs. */
class BenchScaleRecallSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.1"
  private def present = new java.io.File(s"$sfDir/embeddings.parquet").exists()

  private def pairs(name: String, cols: (String, String)): Set[(Long, Long)] =
    SparkEntry.queries(name)(spark, sfDir)
      .select(cols._1, cols._2).as[(Long, Long)].collect().toSet

  /** `nTwins` planted near-neighbors for each base id in `ids`: twin
    * t of base x gets id `twinBase + id*10 + t` and vector x + σ·g with
    * per-component gaussian noise from Random(seed=twin id) — deterministic,
    * cosine(x, twin) ≈ 1/√(1+σ²) ≈ 0.95 at σ=0.33. */
  private def withTwins(emb: DataFrame, ids: Seq[Long], nTwins: Int,
                        twinBase: Long = 1000000L): DataFrame = {
    val base = emb.select("vec_id", "embedding").as[(Long, Array[Float])]
      .collect().toMap
    val twins = for {
      id <- ids; t <- 0 until nTwins
      tid = twinBase + id * 10 + t
      rnd = new scala.util.Random(tid)
      x = base(id)
      nrm = math.sqrt(x.map(v => v.toDouble * v).sum)
      sigma = 0.33 * nrm / math.sqrt(x.length.toDouble)
    } yield (tid, x.map(v => (v + sigma * rnd.nextGaussian()).toFloat))
    emb.select("vec_id", "embedding")
      .union(twins.toDF("vec_id", "embedding"))
  }

  // Shared fixtures (r16, suite-wall item): the four ANN tests assert four
  // DIFFERENT approximate tiers against the SAME deterministic corpus
  // (full embeddings + 5 planted twins for qids 0-9) and the SAME exact
  // brute-force baseline, and the three kNN-graph tests share one exact
  // all-pairs ground truth over one deterministic 8000-vector corpus.
  // Computing each once is a pure wall cut — every assertion, operating
  // point and threshold is unchanged (the ground truths are deterministic:
  // exact dots, round-9, seeded twins).
  private val annQids = 0L until 10L
  private def top(df: DataFrame) =
    df.select("qid", "nid").as[(Long, Long)].collect().toSet
  private lazy val annCorpus: DataFrame =
    withTwins(spark.read.parquet(s"$sfDir/embeddings.parquet"), annQids, nTwins = 5)
  private lazy val annBrute: Set[(Long, Long)] =
    top(Similarity.annBruteTopK(annCorpus, annQids, k = 5))

  test("ann_lsh_topk recall >= 0.8 on sf0.1 embeddings with planted neighbors", Slow) {
    assume(present)
    // declared-query parameters (k=5, nBits=8, nTables=2)
    val lsh = top(Similarity.lshAnnTopK(annCorpus, annQids, k = 5, nTables = 2))
    val recall = (annBrute intersect lsh).size.toDouble / annBrute.size
    assert(recall >= 0.8, s"planted-neighbor ANN-LSH recall $recall < 0.8")
  }

  test("ann_ivf_topk recall >= 0.8 on sf0.1 embeddings with planted neighbors", Slow) {
    assume(present)
    val ivf = top(Similarity.ivfAnnTopK(annCorpus, annQids, k = 5))
    val recall = (annBrute intersect ivf).size.toDouble / annBrute.size
    assert(recall >= 0.8, s"planted-neighbor ANN-IVF recall $recall < 0.8")
  }

  test("ann_pq_topk recall >= 0.8 on sf0.1 embeddings with planted neighbors", Slow) {
    assume(present)
    // declared-query parameters (k=5, nSub=4, nCodes=16)
    val pq = top(Similarity.pqAnnTopK(annCorpus, annQids, k = 5))
    val recall = (annBrute intersect pq).size.toDouble / annBrute.size
    assert(recall >= 0.8, s"planted-neighbor ANN-PQ recall $recall < 0.8")
  }

  test("ann_ivfpq_topk recall >= 0.8 on sf0.1 embeddings with planted neighbors", Slow) {
    assume(present)
    // declared-query parameters (k=5, nCells=16, nprobe=4, nSub=4, nCodes=16)
    val ivfpq = top(Similarity.ivfPqAnnTopK(annCorpus, annQids, k = 5))
    val recall = (annBrute intersect ivfpq).size.toDouble / annBrute.size
    assert(recall >= 0.8, s"planted-neighbor ANN-IVFPQ recall $recall < 0.8")
  }

  // shared 8000-vector kNN-graph fixture + exact ground truth (see note
  // above): 2000 real base vectors x (1 + 3 twins), the same scale the
  // declared query runs at, with knowable top-3 ground truth
  private def edges(df: DataFrame) =
    df.select("src", "dst").as[(Long, Long)].collect().toSet
  private lazy val knnCorpus: DataFrame = withTwins(
    spark.read.parquet(s"$sfDir/embeddings.parquet").where(col("vec_id") < 2000),
    0L until 2000L, nTwins = 3)
  private lazy val knnExact: Set[(Long, Long)] =
    edges(Similarity.knnGraph(knnCorpus, k = 3))

  test("knn_graph_lsh edge recall >= 0.8 at bench scale with planted neighbors", Slow) {
    assume(present)
    // declared-query parameters (k=3, nBits=autoBits(n, 64), nTables=2)
    val lsh = edges(Similarity.knnGraphLSH(knnCorpus, k = 3,
      nBits = Similarity.autoBits(8000, targetBucket = 64), nTables = 2))
    val recall = (knnExact intersect lsh).size.toDouble / knnExact.size
    assert(recall >= 0.8, s"planted-neighbor kNN-graph-LSH recall $recall < 0.8")
  }

  test("knn_graph_lsh REDUCED operating point (maxBucket=64, nTables=1): " +
    "recall holds at bench scale with planted neighbors", Slow) {
    assume(present)
    // The declared single-box fallback for scratch-constrained sf100 runs
    // (SCALE.md §13): nTables 2->1 and maxBucket 256->64 cut the shuffle
    // bound n·probes·cap 8x (and nTables=1 additionally elides the
    // pair-dedupe exchange — see knnGraphLSH). Single-table SRP at nBits=8
    // with 1-bit multiprobe gives P(candidate) ≈ p^8 + 8·p^7(1-p) ≈ 0.81
    // for planted twins at cosine 0.95 — the recall THIS operating point
    // trades for its volume, asserted here so the sf100 measurement in
    // SCALE.md §13 has a pinned quality bound (the full config's 0.8 floor
    // stays in the test above). Measured: 0.750 at maxBucket=64; dropping
    // the cap further to 32 measured 0.614 (the cap binds on hot cells at
    // this occupancy) — rejected as the declared point for that reason.
    val lsh = edges(Similarity.knnGraphLSH(knnCorpus, k = 3,
      nBits = Similarity.autoBits(8000, targetBucket = 64),
      nTables = 1, maxBucket = 64))
    val recall = (knnExact intersect lsh).size.toDouble / knnExact.size
    info(f"reduced-operating-point recall = $recall%.3f")
    assert(recall >= 0.7, s"reduced-point kNN-graph-LSH recall $recall < 0.7")
  }

  test("knn_graph_lsh reduced point + probeDepth=2: multiprobe depth recovers " +
    "the full-config recall floor without a second table", Slow) {
    assume(present)
    // r10 verdict #2: the reduced point (nTables=1, maxBucket=64) measured
    // recall 0.750 vs the >= 0.8 full-config floor. Depth-2 multiprobe
    // raises single-table candidate probability to
    // P ≈ p^8 + 8·p^7(1-p) + 28·p^6(1-p)² ≈ 0.96 for twins at cosine 0.95
    // while keeping the elided-dedupe shape (probe keys stay distinct
    // buckets) and shuffle at O(n·probes) — no merge stage, no second
    // table's bucketing scan.
    val lsh = edges(Similarity.knnGraphLSH(knnCorpus, k = 3,
      nBits = Similarity.autoBits(8000, targetBucket = 64),
      nTables = 1, maxBucket = 64, probeDepth = 2))
    val recall = (knnExact intersect lsh).size.toDouble / knnExact.size
    info(f"reduced-point depth-2 recall = $recall%.3f")
    assert(recall >= 0.8, s"depth-2 reduced-point recall $recall < 0.8")
  }

  test("emb_cosine_neardup_lsh: precision 1, recall >= 0.8 on raw sf0.1 embeddings", Slow) {
    assume(present)
    val exact = pairs("emb_cosine_neardup", ("id_a", "id_b"))
    val lsh = pairs("emb_cosine_neardup_lsh", ("id_a", "id_b"))
    assume(exact.nonEmpty)
    assert(lsh.subsetOf(exact), "LSH tier emitted a pair the exact tier rejects")
    val recall = (exact intersect lsh).size.toDouble / exact.size
    assert(recall >= 0.8, s"sf0.1 cosine-near-dup-LSH recall $recall < 0.8")
  }

  test("dedup_near_minhash: precision 1, recall >= 0.8 vs exact Jaccard on sf0.1 docs", Slow) {
    assume(new java.io.File(s"$sfDir/documents.parquet").exists())
    val exact = pairs("dedup_ngram_jaccard_documents", ("id_a", "id_b"))
    val mh = pairs("dedup_near_minhash", ("id_a", "id_b"))
    assume(exact.nonEmpty)
    // minHashNearDup verifies candidates with exact Jaccard => precision 1
    assert(mh.subsetOf(exact), "MinHash tier emitted a pair exact Jaccard rejects")
    val recall = (exact intersect mh).size.toDouble / exact.size
    assert(recall >= 0.8, s"sf0.1 MinHash near-dup recall $recall < 0.8")
  }
}
