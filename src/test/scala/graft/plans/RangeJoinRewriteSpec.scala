package graft.plans

import graft.SparkSpec

class RangeJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def pts = Seq((1L, 0.0), (2L, 5.0), (3L, 10.0), (4L, 15.0), (5L, 25.0))
    .toDF("pid", "x")
  private def ivs = Seq((0, 0.0, 10.0), (1, 5.0, 20.0), (2, 30.0, 40.0))
    .toDF("iv", "lo", "hi")

  private def naiveJoin = pts.join(ivs, $"x" >= $"lo" && $"x" <= $"hi")

  test("rewrites a naive range join to the cell equi-join when enabled") {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ RangeJoinRewrite
    try {
      spark.conf.set(RangeJoinRewrite.cellWidthConf, "4.0")
      val out = naiveJoin
      val got = out.select("pid", "iv").as[(Long, Int)].collect().toSet
      assert(got == Set((1L, 0), (2L, 0), (2L, 1), (3L, 0), (3L, 1), (4L, 1)))
      val optimized = out.queryExecution.optimizedPlan.toString
      assert(optimized.contains("__graft_cell"), s"rewrite did not fire:\n$optimized")
      val physical = out.queryExecution.executedPlan.toString
      assert(!physical.contains("BroadcastNestedLoopJoin") && !physical.contains("CartesianProduct"),
        s"still a nested-loop join:\n$physical")
    } finally {
      spark.conf.unset(RangeJoinRewrite.cellWidthConf)
      spark.experimental.extraOptimizations = prev
    }
  }

  test("stays off without the conf; skips joins that already have an equi-key") {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ RangeJoinRewrite
    try {
      // conf unset: plan untouched (still a BNLJ)
      assert(!naiveJoin.queryExecution.optimizedPlan.toString.contains("__graft_cell"))
      // equi-key present: hash-joinable as written, no rewrite
      spark.conf.set(RangeJoinRewrite.cellWidthConf, "4.0")
      val withKey = pts.withColumn("k", $"pid" % 2)
        .join(ivs.withColumn("k", ($"iv" % 2).cast("long")),
          Seq("k")).where($"x" >= $"lo" && $"x" <= $"hi")
      assert(!withKey.queryExecution.optimizedPlan.toString.contains("__graft_cell"))
    } finally {
      spark.conf.unset(RangeJoinRewrite.cellWidthConf)
      spark.experimental.extraOptimizations = prev
    }
  }

  test("rewritten join equals the naive join on random data (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ RangeJoinRewrite
    try {
      for (trial <- 0 until 4) {
        val seed = Seed(7L + trial)
        val ptVals = Gen.listOfN(50, Gen.chooseNum(-40.0, 40.0))
          .apply(Gen.Parameters.default, seed).get
        val ivVals = Gen.listOfN(20, for {
          lo <- Gen.chooseNum(-45.0, 42.0); w <- Gen.chooseNum(0.0, 25.0)
        } yield (lo, lo + w)).apply(Gen.Parameters.default, seed.next).get
        val p = ptVals.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("pid", "x")
        val v = ivVals.zipWithIndex.map { case ((lo, hi), i) => (i, lo, hi) }
          .toDF("iv", "lo", "hi")
        val cond = p("x") >= v("lo") && p("x") <= v("hi")
        spark.conf.unset(RangeJoinRewrite.cellWidthConf)
        val naive = p.join(v, cond).select("pid", "iv").as[(Long, Int)].collect().toSet
        spark.conf.set(RangeJoinRewrite.cellWidthConf, "3.0")
        val rewritten = p.join(v, cond).select("pid", "iv").as[(Long, Int)].collect().toSet
        assert(rewritten == naive, s"trial $trial diverged")
      }
    } finally {
      spark.conf.unset(RangeJoinRewrite.cellWidthConf)
      spark.experimental.extraOptimizations = prev
    }
  }
}
