package graft.plans

import graft.SparkSpec

/** BoxJoinRewrite: the 2-D sibling of IntervalJoinRewrite. Same spec shape —
  * plan fires + exactly-once + no BNLJ, conf-off/equi-key skips, equality
  * vs the naive join — plus the 2-D-specific hazards: the crossed-pairing
  * branch (conjunct order permuted so the straight candidate mixes axes)
  * and the ambiguity refusal (no name affinity → Catalyst's plan stands). */
class BoxJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  // rectangles: a1 overlaps b1 only; a2 overlaps b2 only; a3 overlaps both
  private def boxesA = Seq(
    (1L, 0.0, 10.0, 0.0, 10.0),
    (2L, 20.0, 30.0, 20.0, 30.0),
    (3L, 5.0, 25.0, 5.0, 25.0))
    .toDF("aid", "ax_lo", "ax_hi", "ay_lo", "ay_hi")
  private def boxesB = Seq(
    (10L, 8.0, 12.0, 2.0, 6.0),
    (20L, 22.0, 40.0, 24.0, 50.0))
    .toDF("bid", "bx_lo", "bx_hi", "by_lo", "by_hi")

  private def armed[T](wx: Double, wy: Double)(body: => T): T = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      (prev :+ BoxJoinRewrite).distinct
    try {
      spark.conf.set(BoxJoinRewrite.cellWidthXConf, wx.toString)
      spark.conf.set(BoxJoinRewrite.cellWidthYConf, wy.toString)
      body
    } finally {
      spark.conf.unset(BoxJoinRewrite.cellWidthXConf)
      spark.conf.unset(BoxJoinRewrite.cellWidthYConf)
      spark.experimental.extraOptimizations = prev
    }
  }

  test("rewrites the naive 4-inequality box join: exactly once, no BNLJ") {
    armed(4.0, 4.0) {
      val out = boxesA.join(boxesB,
        $"ax_lo" <= $"bx_hi" && $"bx_lo" <= $"ax_hi" &&
        $"ay_lo" <= $"by_hi" && $"by_lo" <= $"ay_hi")
      val got = out.select("aid", "bid").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, "duplicate pairs emitted")
      assert(got.toSet == Set((1L, 10L), (2L, 20L), (3L, 10L), (3L, 20L)))
      val optimized = out.queryExecution.optimizedPlan.toString
      assert(optimized.contains("__graft_bcell"), s"rewrite did not fire:\n$optimized")
      val physical = out.queryExecution.executedPlan.toString
      assert(!physical.contains("BroadcastNestedLoopJoin") &&
        !physical.contains("CartesianProduct"), s"still a nested-loop join:\n$physical")
    }
  }

  test("crossed conjunct order still pairs axes by name affinity") {
    armed(4.0, 4.0) {
      // the two left-to-right conjuncts name DIFFERENT axes than their
      // syntactic partners: the straight candidate would build synthetic
      // intervals like [ax_lo, ay_hi]; the crossed pairing must win
      val out = boxesA.join(boxesB,
        $"ax_lo" <= $"bx_hi" && $"ay_lo" <= $"by_hi" &&
        $"by_lo" <= $"ay_hi" && $"bx_lo" <= $"ax_hi")
      val optimized = out.queryExecution.optimizedPlan.toString
      assert(optimized.contains("__graft_bcell"), s"crossed pairing not taken:\n$optimized")
      val got = out.select("aid", "bid").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size)
      assert(got.toSet == Set((1L, 10L), (2L, 20L), (3L, 10L), (3L, 20L)))
    }
  }

  test("stays off without the confs; skips equi-key joins; refuses ambiguous names") {
    // conf off (armed() unset them after every other test) → untouched
    val bare = boxesA.join(boxesB,
      $"ax_lo" <= $"bx_hi" && $"bx_lo" <= $"ax_hi" &&
      $"ay_lo" <= $"by_hi" && $"by_lo" <= $"ay_hi")
    assert(!bare.queryExecution.optimizedPlan.toString.contains("__graft_bcell"))
    armed(4.0, 4.0) {
      // an equi-conjunct means Catalyst already has a hash join — skip
      val keyed = boxesA.withColumn("k", $"aid" % 2)
        .join(boxesB.withColumn("k", $"bid" % 2), Seq("k"))
        .where($"ax_lo" <= $"bx_hi" && $"bx_lo" <= $"ax_hi" &&
          $"ay_lo" <= $"by_hi" && $"by_lo" <= $"ay_hi")
      assert(!keyed.queryExecution.optimizedPlan.toString.contains("__graft_bcell"))
      // single-letter bound names carry zero affinity either way — a tie;
      // mispairing would build reversed synthetic intervals, so refuse
      val ta = Seq((1L, 0.0, 10.0, 0.0, 10.0)).toDF("aid", "u", "v", "w", "x")
      val tb = Seq((2L, 5.0, 15.0, 5.0, 15.0)).toDF("bid", "p", "q", "r", "s")
      val tied = ta.join(tb,
        $"u" <= $"q" && $"p" <= $"v" && $"w" <= $"s" && $"r" <= $"x")
      assert(!tied.queryExecution.optimizedPlan.toString.contains("__graft_bcell"),
        "tie-affinity naming must refuse the rewrite")
      assert(tied.count() == 1) // and the naive plan still answers correctly
    }
  }

  test("rewrite equals the naive join on random rectangles (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val rectGen = (n: Int) => Gen.listOfN(n, for {
      xlo <- Gen.chooseNum(-40.0, 40.0)
      wx <- Gen.chooseNum(0.0, 15.0)
      ylo <- Gen.chooseNum(-40.0, 40.0)
      wy <- Gen.chooseNum(0.0, 15.0)
    } yield (xlo, xlo + wx, ylo, ylo + wy))
    for (trial <- 0 until 4) {
      val seed = Seed(9100L + trial)
      val av = rectGen(20).apply(Gen.Parameters.default, seed).get
      val bv = rectGen(12).apply(Gen.Parameters.default, seed.next).get
      val adf = av.zipWithIndex.map { case ((a, b, c, d), i) => (i.toLong, a, b, c, d) }
        .toDF("aid", "ax_lo", "ax_hi", "ay_lo", "ay_hi")
      val bdf = bv.zipWithIndex.map { case ((a, b, c, d), i) => (i.toLong, a, b, c, d) }
        .toDF("bid", "bx_lo", "bx_hi", "by_lo", "by_hi")
      def join = adf.join(bdf,
        $"ax_lo" <= $"bx_hi" && $"bx_lo" <= $"ax_hi" &&
        $"ay_lo" <= $"by_hi" && $"by_lo" <= $"ay_hi")
        .select("aid", "bid").as[(Long, Long)]
      val expect = join.collect().toSet // confs off: naive plan
      armed(6.0, 6.0) {
        val got = join.collect()
        assert(got.length == got.toSet.size, s"trial $trial: duplicates")
        assert(got.toSet == expect, s"trial $trial diverged")
      }
    }
  }
}
