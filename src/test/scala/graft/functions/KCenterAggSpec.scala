package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KCenterAggSpec extends SparkSpec {
  import spark.implicits._

  private def axis(i: Int, dim: Int = 8): Seq[Float] =
    Seq.tabulate(dim)(j => if (j == i) 1.0f else 0.0f)

  test("doubling-algorithm hand check: identical vectors fold at r=0, " +
    "overflow doubles to the min pairwise distance and re-merges") {
    val st = new KCenterAgg.State(3)
    // three e0 copies: one center, weight 3 (d=0 <= 2r=0 folds)
    st.add(0L, axis(0).toArray, 1L)
    st.add(1L, axis(0).toArray, 1L)
    st.add(2L, axis(0).toArray, 1L)
    assert(st.centers.length == 1 && st.centers.head.weight == 3L && st.r == 0.0)
    // two more axes: distinct centers, still no overflow at k=3
    st.add(10L, axis(1).toArray, 1L)
    st.add(20L, axis(2).toArray, 1L)
    assert(st.centers.length == 3 && st.r == 0.0)
    // a fourth axis overflows: min pairwise distance among the four
    // mutually-orthogonal centers is sqrt(2), so r jumps to sqrt(2) and
    // the greedy insertion-order merge folds everything into the first
    st.add(30L, axis(3).toArray, 1L)
    assert(st.centers.length == 1, s"expected full fold, got ${st.centers.length}")
    assert(st.centers.head.id == 0L && st.centers.head.weight == 6L)
    assert(math.abs(st.r - math.sqrt(2.0)) < 1e-12, s"r = ${st.r}")
  }

  test("zero-norm and null-safe inputs are skipped like the batch tiers") {
    val st = new KCenterAgg.State(2)
    st.add(0L, Array.fill(4)(0.0f), 1L)
    assert(st.centers.isEmpty)
    st.add(1L, axis(0, 4).toArray, 1L)
    assert(st.centers.length == 1)
  }

  test("mixed-dim vectors are skipped after the first (first-seen dim wins), " +
    "so serialize/deserialize round-trips cleanly") {
    val st = new KCenterAgg.State(4)
    st.add(0L, axis(0, 8).toArray, 1L)
    st.add(1L, axis(0, 12).toArray, 1L) // longer: would overflow the buffer
    st.add(2L, axis(1, 4).toArray, 1L)  // shorter: would corrupt the stream
    st.add(3L, axis(1, 8).toArray, 1L)  // matching dim: kept
    assert(st.centers.length == 2, s"got ${st.centers.map(_.id)}")
    assert(st.centers.forall(_.unit.length == 8))
    val agg = KCenterAgg(
      org.apache.spark.sql.graftbridge.Bridge.expression(lit(0L)),
      org.apache.spark.sql.graftbridge.Bridge.expression(lit(null)), 4)
    val rt = agg.deserialize(agg.serialize(st))
    assert(rt.centers.map(_.id).toSeq == Seq(0L, 3L))
    assert(rt.centers.forall(_.unit.length == 8))
  }

  test("vectors containing null elements are skipped by update, matching " +
    "the batch tiers' null contract") {
    val rows = Seq(
      (0L, Seq[java.lang.Float](1.0f, 0.0f, 0.0f)),
      (1L, Seq[java.lang.Float](0.0f, null, 1.0f)), // null element: skipped
      (2L, Seq[java.lang.Float](0.0f, 1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = rows
      .agg(KCenterAgg.k_center_agg(col("vec_id"), col("embedding"), 4).as("cs"))
      .select(explode(col("cs.centers")).as("c"))
      .select(col("c.id"), col("c.weight"))
      .collect()
    assert(out.map(_.getLong(0)).toSet == Set(0L, 2L),
      s"null-element row leaked into the coreset: ${out.toSeq}")
    assert(out.map(_.getLong(1)).sum == 2L)
  }

  test("absorb replays weighted centers: merge of disjoint-cluster partials " +
    "keeps both clusters; merged weights are conserved") {
    val a = new KCenterAgg.State(4)
    a.add(0L, axis(0).toArray, 1L); a.add(1L, axis(0).toArray, 1L)
    val b = new KCenterAgg.State(4)
    b.add(10L, axis(1).toArray, 1L); b.add(11L, axis(1).toArray, 1L)
    b.add(12L, axis(1).toArray, 1L)
    a.absorb(b)
    assert(a.centers.length == 2)
    assert(a.centers.map(_.weight).sum == 5L)
  }

  test("batch aggregate over planted clusters: one center per cluster, " +
    "weights conserved, radius stays below the cluster separation") {
    val rnd = new scala.util.Random(13)
    val dim = 16
    val vecs = (for {
      c <- 0 until 4; m <- 0 until 10
    } yield {
      val v = Array.fill(dim)((rnd.nextGaussian() * 0.03).toFloat)
      v(4 * c) = 1.0f
      ((c * 100 + m).toLong, v.toSeq)
    }).toDF("vec_id", "embedding")
    // k = 8 headroom: early overflows settle r at ~2x the within-cluster
    // spread, far below the sqrt(2) cross-cluster distance, so clusters
    // never merge (the doubling algorithm's operating regime)
    val out = vecs.repartition(4)
      .agg(KCenterAgg.k_center_agg(col("vec_id"), col("embedding"), 8).as("cs"))
      .select(col("cs.radius").as("radius"), explode(col("cs.centers")).as("c"))
      .select(col("radius"), col("c.id"), col("c.weight"), col("c.center"))
      .collect()
    assert(out.length <= 8, s"center count ${out.length} exceeds k")
    val clusters = out.map(_.getLong(1) / 100).toSet
    assert(clusters == Set(0L, 1L, 2L, 3L),
      s"coreset missed a planted cluster: ${out.map(_.getLong(1)).toSeq}")
    assert(out.map(_.getLong(2)).sum == 40L, "fold weights not conserved")
    val r = out.head.getDouble(0)
    assert(r < 1.0, s"radius $r reached cross-cluster scale (sqrt(2))")
    // every center's unit vector points into exactly one planted cluster
    out.foreach { row =>
      val u = row.getSeq[Float](3)
      val c = (row.getLong(1) / 100).toInt
      assert(u(4 * c) > 0.9f, s"center ${row.getLong(1)} drifted off its cluster axis")
    }
  }
}
