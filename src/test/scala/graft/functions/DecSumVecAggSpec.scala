package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

import graft.SparkSpec

/** Parity spec for [[DecSumVecAgg]]: the one-buffer decimal sum/matvec
  * aggregate must reproduce the 64-independent-`sum(cast(...))` formulation
  * it replaced in [[graft.llm.Similarity.topPrincipalComponent]] BIT-FOR-BIT
  * — including null-element semantics and partitioning invariance. */
class DecSumVecAggSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8

  /** The pre-r16 expression tree: per-dim independent decimal sums. */
  private def oldMeanSums(df: org.apache.spark.sql.DataFrame): Array[Any] = {
    val sumDec = (c: org.apache.spark.sql.Column) =>
      sum(c.cast("decimal(28,8)")).cast("double")
    val aggs = (0 until dim).map(j =>
      sumDec(col("v").getItem(j).cast("double")).as(s"s$j"))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    Array.tabulate(dim)(j => if (r.isNullAt(j)) null else r.getDouble(j))
  }

  private def oldMatvecSums(df: org.apache.spark.sql.DataFrame,
                            mean: Array[Double], w: Array[Double]): Array[Any] = {
    val sumDec = (c: org.apache.spark.sql.Column) =>
      sum(c.cast("decimal(28,8)")).cast("double")
    val s = (0 until dim).map(j =>
      (col("v").getItem(j).cast("double") - lit(mean(j))) * lit(w(j)))
      .reduce(_ + _)
    val aggs = (0 until dim).map(j =>
      sumDec((col("v").getItem(j).cast("double") - lit(mean(j))) * col("s")).as(s"u$j"))
    val r = df.select(col("v"), s.as("s")).agg(aggs.head, aggs.tail: _*).head()
    Array.tabulate(dim)(j => if (r.isNullAt(j)) null else r.getDouble(j))
  }

  private def newSums(df: org.apache.spark.sql.DataFrame,
                      mean: Array[Double], w: Array[Double]): (Array[Any], Long) = {
    val r = df.agg(DecSumVecAgg.dec_sum_vec(col("v"), dim, mean, w).as("s"),
      count(lit(1)).as("cnt")).head()
    val s = r.getSeq[Any](0)
    (Array.tabulate(dim)(j => s(j)), r.getLong(1))
  }

  private def vecs(seed: Long, n: Int): Seq[Seq[java.lang.Float]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(Seq.fill(dim)(java.lang.Float.valueOf(
      (rnd.nextFloat() * 20f - 10f))))
  }

  test("mean pass matches the per-dim sum(cast(decimal)) tree bit-for-bit") {
    val df = vecs(1L, 500).toDF("v")
    val (got, cnt) = newSums(df, null, null)
    assert(cnt === 500L)
    assert(got.toSeq === oldMeanSums(df).toSeq)
  }

  test("matvec pass matches the 64-literal aggregate tree bit-for-bit") {
    val df = vecs(2L, 500).toDF("v")
    val rnd = new scala.util.Random(3L)
    val mean = Array.fill(dim)(rnd.nextDouble() * 2 - 1)
    val w = Array.fill(dim)(rnd.nextDouble() * 2 - 1)
    val (got, _) = newSums(df, mean, w)
    assert(got.toSeq === oldMatvecSums(df, mean, w).toSeq)
  }

  test("null elements: mean skips only the null dim, matvec skips the row") {
    val rows = Seq(
      Seq[java.lang.Float](1f, 2f, 3f, 4f, 5f, 6f, 7f, 8f),
      Seq[java.lang.Float](1f, null, 3f, 4f, 5f, 6f, 7f, 8f),
      Seq[java.lang.Float](2f, 1f, 0f, -1f, -2f, -3f, 4.5f, 0.25f))
    val df = rows.toDF("v")
    val mean = Array.fill(dim)(0.5)
    val w = Array.fill(dim)(1.0)
    val (gotMean, cnt) = newSums(df, null, null)
    assert(cnt === 3L)
    assert(gotMean.toSeq === oldMeanSums(df).toSeq)
    val (gotMv, _) = newSums(df, mean, w)
    assert(gotMv.toSeq === oldMatvecSums(df, mean, w).toSeq)
  }

  test("empty input and all-null dims yield SQL-sum NULLs") {
    val df = Seq.empty[Seq[java.lang.Float]].toDF("v")
    val (got, cnt) = newSums(df, null, null)
    assert(cnt === 0L)
    assert(got.forall(_ == null))
    val oneAllNull = Seq(Seq[java.lang.Float](null, 1f, 1f, 1f, 1f, 1f, 1f, 1f))
      .toDF("v")
    val (got2, _) = newSums(oneAllNull, null, null)
    assert(got2(0) == null && got2(1) == 1.0)
  }

  test("partitioning-invariant: 1 vs 7 partitions, identical digits") {
    val base = vecs(4L, 1000)
    val df1 = spark.createDataFrame(
      spark.sparkContext.parallelize(base.map(Row(_)), 1),
      new org.apache.spark.sql.types.StructType().add("v", "array<float>"))
    val df7 = spark.createDataFrame(
      spark.sparkContext.parallelize(base.map(Row(_)), 7),
      new org.apache.spark.sql.types.StructType().add("v", "array<float>"))
    val rnd = new scala.util.Random(5L)
    val mean = Array.fill(dim)(rnd.nextDouble())
    val w = Array.fill(dim)(rnd.nextDouble() * 2 - 1)
    assert(newSums(df1, mean, w)._1.toSeq === newSums(df7, mean, w)._1.toSeq)
    assert(newSums(df1, null, null)._1.toSeq === newSums(df7, null, null)._1.toSeq)
  }

  test("dec_term_sums matches sum(cast(term as decimal(38,8))) per slot") {
    val rnd = new scala.util.Random(7L)
    val rows = Seq.fill(800)((rnd.nextDouble() * 2e6 - 1e6,
      rnd.nextDouble() * 1e-4, rnd.nextGaussian()))
    val df = rows.toDF("a", "b", "c").repartition(5)
    val terms = Seq(col("a"), col("a") * col("a"), col("b") * col("c"),
      col("c") * col("c") * col("c"))
    val old = df.agg(
      sum(terms(0).cast("decimal(38,8)")).cast("double").as("t0"),
      sum(terms(1).cast("decimal(38,8)")).cast("double").as("t1"),
      sum(terms(2).cast("decimal(38,8)")).cast("double").as("t2"),
      sum(terms(3).cast("decimal(38,8)")).cast("double").as("t3")).head()
    val got = df.select(array(terms: _*).as("_t"))
      .agg(DecTermSumsAgg.dec_term_sums(col("_t"), 4, 38).as("s"))
      .head().getSeq[Any](0)
    assert((0 until 4).map(got(_)) === (0 until 4).map(old.get(_)))
  }

  test("dec_term_sums null terms skip their slot only; empty slot is NULL") {
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (1.5, null), (2.25, null), (null, null)).toDF("a", "b")
    val got = df.select(array(col("a"), col("b")).as("_t"))
      .agg(DecTermSumsAgg.dec_term_sums(col("_t"), 2, 38).as("s"))
      .head().getSeq[Any](0)
    assert(got(0) === 3.75 && got(1) == null)
    // precision-28 tier: a term over 20 integer digits is unrepresentable
    // in decimal(28,8) — the slot skips it (the non-ANSI cast's NULL; the
    // ANSI tree this replaces would have thrown there, so the behavior is
    // only MORE defined, never a different value on representable data)
    val big = Seq((1e25, 2.0)).toDF("a", "b")
    val got28 = big.select(array(col("a"), col("b")).as("_t"))
      .agg(DecTermSumsAgg.dec_term_sums(col("_t"), 2, 28).as("s"))
      .head().getSeq[Any](0)
    assert(got28(0) == null && got28(1) === 2.0)
  }

  test("long-overflow escalation stays exact (serialize/merge roundtrip)") {
    // magnitudes near the long cap at scale 8: 9.2e10 per term
    val big = Seq.fill(40)(Seq.fill(dim)(java.lang.Float.valueOf(3.0e10f)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(big.map(Row(_)), 5),
      new org.apache.spark.sql.types.StructType().add("v", "array<float>"))
    val (got, cnt) = newSums(df, null, null)
    assert(cnt === 40L)
    // per-term unscaled ≈ 3e18, 40 terms ⇒ Σ ≈ 1.2e20 > Long.MaxValue: the
    // long lane must escalate to BigInteger and still match the built-in
    // decimal(38,8) sum digit-for-digit across the 5-partition merge
    assert(got.forall(_ != null))
    assert(got.toSeq === oldMeanSums(df).toSeq)
  }
}
