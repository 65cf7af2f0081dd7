package graft.plans

import graft.SparkSpec

class IntervalJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def a = Seq((1L, 0.0, 10.0), (2L, 20.0, 30.0), (3L, 5.0, 25.0))
    .toDF("aid", "a_lo", "a_hi")
  private def b = Seq((10L, 8.0, 12.0), (20L, 30.0, 35.0), (30L, 40.0, 50.0))
    .toDF("bid", "b_lo", "b_hi")

  private def naive = a.join(b, $"a_lo" <= $"b_hi" && $"b_lo" <= $"a_hi")

  test("rewrites a naive overlap join to the cell equi-join, exactly once per pair") {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ IntervalJoinRewrite
    try {
      spark.conf.set(IntervalJoinRewrite.cellWidthConf, "4.0")
      val out = naive
      val got = out.select("aid", "bid").as[(Long, Long)].collect()
      // exactly-once even though overlaps span multiple cells
      assert(got.length == got.toSet.size, "duplicate pairs emitted")
      assert(got.toSet == Set((1L, 10L), (2L, 20L), (3L, 10L)))
      val optimized = out.queryExecution.optimizedPlan.toString
      assert(optimized.contains("__graft_icell"), s"rewrite did not fire:\n$optimized")
      val physical = out.queryExecution.executedPlan.toString
      assert(!physical.contains("BroadcastNestedLoopJoin") && !physical.contains("CartesianProduct"),
        s"still a nested-loop join:\n$physical")
    } finally {
      spark.conf.unset(IntervalJoinRewrite.cellWidthConf)
      spark.experimental.extraOptimizations = prev
    }
  }

  test("stays off without the conf; skips equi-key joins") {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ IntervalJoinRewrite
    try {
      assert(!naive.queryExecution.optimizedPlan.toString.contains("__graft_icell"))
      spark.conf.set(IntervalJoinRewrite.cellWidthConf, "4.0")
      val keyed = a.withColumn("k", $"aid" % 2)
        .join(b.withColumn("k", $"bid" % 2), Seq("k"))
        .where($"a_lo" <= $"b_hi" && $"b_lo" <= $"a_hi")
      assert(!keyed.queryExecution.optimizedPlan.toString.contains("__graft_icell"))
    } finally {
      spark.conf.unset(IntervalJoinRewrite.cellWidthConf)
      spark.experimental.extraOptimizations = prev
    }
  }

  test("ambiguous pairings (2D box overlap) are left untouched, not mis-rewritten") {
    // x-overlap AND y-overlap gives two candidate conjuncts per direction;
    // an arbitrary pick could pair a.x_lo with b.y_hi, building reversed
    // synthetic intervals that make Sequence throw at runtime. The rule
    // must skip the join entirely and produce the naive (correct) answer.
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ IntervalJoinRewrite
    try {
      val boxesA = Seq((1L, 0.0, 10.0, 100.0, 110.0), (2L, 20.0, 30.0, 0.0, 5.0))
        .toDF("aid", "ax_lo", "ax_hi", "ay_lo", "ay_hi")
      val boxesB = Seq((10L, 8.0, 12.0, 105.0, 120.0), (20L, 25.0, 28.0, 50.0, 60.0))
        .toDF("bid", "bx_lo", "bx_hi", "by_lo", "by_hi")
      def boxJoin = boxesA.join(boxesB,
        $"ax_lo" <= $"bx_hi" && $"bx_lo" <= $"ax_hi" &&
        $"ay_lo" <= $"by_hi" && $"by_lo" <= $"ay_hi")
      spark.conf.set(IntervalJoinRewrite.cellWidthConf, "4.0")
      val out = boxJoin
      assert(!out.queryExecution.optimizedPlan.toString.contains("__graft_icell"),
        "ambiguous multi-conjunct join was rewritten")
      // and it still runs — no 'Illegal sequence boundaries' from a
      // cross-dimension synthetic interval
      assert(out.select("aid", "bid").as[(Long, Long)].collect().toSet ==
        Set((1L, 10L)))
    } finally {
      spark.conf.unset(IntervalJoinRewrite.cellWidthConf)
      spark.experimental.extraOptimizations = prev
    }
  }

  test("rewrite equals the naive join on random intervals (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ IntervalJoinRewrite
    try {
      val ivGen = (n: Int) => Gen.listOfN(n, for {
        lo <- Gen.chooseNum(-40.0, 40.0)
        w <- Gen.chooseNum(0.0, 20.0)
      } yield (lo, lo + w))
      for (trial <- 0 until 5) {
        val seed = Seed(7000L + trial)
        val av = ivGen(25).apply(Gen.Parameters.default, seed).get
        val bv = ivGen(15).apply(Gen.Parameters.default, seed.next).get
        val adf = av.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
          .toDF("aid", "a_lo", "a_hi")
        val bdf = bv.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
          .toDF("bid", "b_lo", "b_hi")
        def join = adf.join(bdf, $"a_lo" <= $"b_hi" && $"b_lo" <= $"a_hi")
          .select("aid", "bid").as[(Long, Long)]
        spark.conf.unset(IntervalJoinRewrite.cellWidthConf)
        val expect = join.collect().toSet
        spark.conf.set(IntervalJoinRewrite.cellWidthConf, "6.0")
        val got = join.collect()
        assert(got.length == got.toSet.size, s"trial $trial: duplicates")
        assert(got.toSet == expect, s"trial $trial diverged")
      }
    } finally {
      spark.conf.unset(IntervalJoinRewrite.cellWidthConf)
      spark.experimental.extraOptimizations = prev
    }
  }
}
