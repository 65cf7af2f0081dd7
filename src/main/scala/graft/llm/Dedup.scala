package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, n-gram
  * Jaccard, MinHash/LSH, and SimHash near-duplicate detection.
  *
  * Scale design:
  *   - Exact dedup is one hash aggregate (map-side combine) — the optimal
  *     distributed shape; at 100 TB consider `xxhash64(text)` as the grouping
  *     key to shrink shuffle rows to 8-byte hashes.
  *   - All-pairs n-gram Jaccard is exact but inherently candidate-join-bound;
  *     it is the small-N verifier. The scale path is [[minHashNearDup]]:
  *     signatures are fixed-width (k longs) regardless of document size, and
  *     LSH banding turns the O(n²) pair space into per-bucket joins.
  *   - Buckets with pathological sizes (boilerplate shingles) are capped to
  *     bound the worst-case join fan-out — the standard skew guard.
  */
object Dedup {

  /** Per-source exact-duplicate stats: total docs vs distinct texts.
    * `count(DISTINCT text)` is a two-phase exact distinct — partial
    * de-duplication happens map-side, so the shuffle carries distinct
    * (source, text) pairs, not raw rows. */
  def exactStats(docs: DataFrame): DataFrame =
    docs.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      count_distinct(col("text")).as("n_distinct"),
      (count(lit(1)) - count_distinct(col("text"))).as("n_dups")
    ).orderBy("source")

  /** Keep one representative row per exact-duplicate group (min doc_id wins).
    * Shuffle key is the 64-bit text hash, not the full text. */
  def dropExactDups(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(xxhash64(col(textCol))).orderBy(col(idCol))
    docs.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
  }

  /** Distinct token n-gram (shingle) set per document, as an array column.
    * w=3 word shingles are the classic near-dup unit (Broder '97). Documents
    * shorter than w tokens yield an empty set. */
  def shingles(text: Column, w: Int = 3): Column = {
    val toks = TextAnalysis.tokens(text)
    val grams = transform(sequence(lit(1), size(toks) - lit(w - 1)),
      i => array_join(slice(toks, i, lit(w)), " "))
    when(size(toks) >= w, array_distinct(grams)).otherwise(array().cast("array<string>"))
  }

  /** Exact n-gram Jaccard near-duplicate pairs (similarity >= threshold).
    *
    * Shape: explode shingles → self-join on shingle → count intersections →
    * |A∪B| = |A|+|B|−|A∩B|. Exact and oracle-checkable; candidate generation
    * through the shingle join means only pairs sharing ≥1 shingle are ever
    * materialized. For 100 TB use [[minHashNearDup]] (this operator is the
    * verifier for its candidates). */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double = 0.8, w: Int = 3,
                        idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sh = docs.select(col(idCol).as("id"), shingles(col(textCol), w).as("sh"))
      .where(size(col("sh")) > 0)
    val sizes = sh.select(col("id"), size(col("sh")).as("n"))
    val ex = sh.select(col("id"), explode(col("sh")).as("s"))
    val inter = ex.as("a").join(ex.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n", "n_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n", "n_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        (col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter"))).as("jaccard"))
      .where(col("jaccard") >= threshold)
      .orderBy("id_a", "id_b")
  }

  /** Positive-hash of a shingle into [0, P): base for the MinHash family. */
  private val P = 2147483647L // 2^31 - 1, prime
  private def baseHash(s: Column): Column = pmod(xxhash64(s), lit(P))

  /** Deterministic affine permutation parameters (a_i, b_i) derived from a
    * fixed seed via a splitmix-style scramble — reproducible across runs. */
  private def perms(k: Int, seed: Long): (Seq[Long], Seq[Long]) = {
    val rnd = new scala.util.Random(seed)
    val a = Seq.fill(k)(1L + rnd.nextLong().abs % (P - 1))
    val b = Seq.fill(k)(rnd.nextLong().abs % P)
    (a, b)
  }

  /** MinHash signatures: k minimums of affine permutations of shingle hashes.
    * Signature width is constant (k longs) regardless of document length —
    * that constancy is what makes the LSH join scale. Pure HOF expressions:
    * `transform(0..k-1, i -> array_min(transform(hashes, h -> (a_i*h+b_i) mod P)))`.
    * No overflow: a_i, h < 2^31 so a_i*h < 2^62. */
  def minHashSignature(shingleArr: Column, k: Int = 128, seed: Long = 42L): Column = {
    val (a, b) = perms(k, seed)
    val aLit = typedLit(a)
    val bLit = typedLit(b)
    val hashes = transform(shingleArr, s => baseHash(s))
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(hashes,
        h => pmod(element_at(aLit, i + 1) * h + element_at(bLit, i + 1), lit(P)))))
  }

  /** MinHash + LSH banding near-duplicate pairs, verified with exact Jaccard.
    *
    * k=128 hashes in b=16 bands × r=8 rows: collision threshold
    * (1/b)^(1/r) ≈ 0.71, so ≥0.8-similar pairs collide in ≥1 band with
    * probability ~0.98+. Candidates from per-band bucket self-joins, then a
    * single exact-Jaccard verification pass over candidates only.
    *
    * Scale notes: bucket join is shuffle-on-(band, band_hash); skewed buckets
    * (boilerplate) are dropped above `maxBucket` — the standard guard that
    * bounds fan-out at web scale. Signatures are computed in one map-only
    * pass over the scan. */
  def minHashNearDup(docs: DataFrame, threshold: Double = 0.8, k: Int = 128,
                     bands: Int = 16, seed: Long = 42L, maxBucket: Int = 1000,
                     idCol: String = "doc_id", textCol: String = "text", w: Int = 3): DataFrame = {
    require(k % bands == 0, "k must be divisible by bands")
    val r = k / bands
    val sh = docs.select(col(idCol).as("id"), shingles(col(textCol), w).as("sh"))
      .where(size(col("sh")) > 0)
    val sig = sh.select(col("id"), col("sh"), minHashSignature(col("sh"), k, seed).as("sig"))
    val bandStructs = (0 until bands).map(bIdx =>
      struct(lit(bIdx).as("band"), xxhash64(slice(col("sig"), bIdx * r + 1, r)).as("bh")))
    val banded = sig.select(col("id"), col("sh"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("id"), col("sh"), col("bb.band").as("band"), col("bb.bh").as("bh"))
    // Skew guard: drop pathological buckets before the self-join.
    val bucketed = banded.withColumn("__bsz",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("band", "bh")))
      .where(col("__bsz") <= maxBucket).drop("__bsz")
    val cand = bucketed.as("a").join(bucketed.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sh").as("sh_a"), col("b.sh").as("sh_b"))
      .dropDuplicates("id_a", "id_b")
    cand.select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
      .where(col("jaccard") >= threshold)
      .orderBy("id_a", "id_b")
  }

  /** Bit masks 2^0 .. 2^63 as an array literal — HOF lambdas cannot take a
    * Column shift amount, so bit tests go through `element_at` instead. */
  private val bitMasks = typedLit((0 until 64).map(j => 1L << j))

  /** 64-bit SimHash over the token multiset: for each bit j, sum +1/−1 by bit
    * j of xxhash64(token); the sign vector packs into one long. Pure HOF fold
    * (one map-only pass); near-dups are pairs within small Hamming distance,
    * found via the 4×16-bit pigeonhole banding (hd ≤ 3 ⇒ ≥1 equal chunk). */
  def simHash(text: Column): Column = {
    val toks = TextAnalysis.tokens(text)
    val hashes = transform(toks, t => xxhash64(t))
    val zeros = array_repeat(lit(0L), 64)
    val sums = aggregate(hashes, zeros,
      (acc, h) => zip_with(acc, sequence(lit(0), lit(63)),
        (a, j) => a + when(h.bitwiseAND(element_at(bitMasks, j + 1)) =!= 0L, lit(1L)).otherwise(lit(-1L))))
    aggregate(zip_with(sums, sequence(lit(0), lit(63)),
      (s, j) => when(s > 0, element_at(bitMasks, j + 1)).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc.bitwiseOR(v))
  }

  /** SimHash near-duplicate pairs within `maxHamming` (default 3), candidates
    * via 16-bit chunk equality (pigeonhole), exact Hamming verification. */
  def simHashNearDup(docs: DataFrame, maxHamming: Int = 3,
                     idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val withSig = docs.select(col(idCol).as("id"), simHash(col(textCol)).as("sig"))
    val chunkStructs = (0 until 4).map(c => struct(lit(c).as("chunk"),
      shiftright(col("sig"), c * 16).bitwiseAND(lit(0xFFFFL)).as("cv")))
    val chunked = withSig.select(col("id"), col("sig"), explode(array(chunkStructs: _*)).as("cc"))
      .select(col("id"), col("sig"), col("cc.chunk").as("chunk"), col("cc.cv").as("cv"))
    val cand = chunked.as("a").join(chunked.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.cv") === col("b.cv") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .dropDuplicates("id_a", "id_b")
    cand.select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .orderBy("id_a", "id_b")
  }
}
