package graft.dist

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("quantiles interpolates linearly (hand-computed on 0..100)") {
    val df = spark.range(101).select($"id".cast("double").as("x")).toDF()
    val r = Stats.quantiles(df, "x", Seq(0.25, 0.5, 0.75, 0.99)).collect()(0)
    assert(r.getDouble(0) == 25.0 && r.getDouble(1) == 50.0 &&
      r.getDouble(2) == 75.0 && r.getDouble(3) == 99.0)
    // interpolation between ranks: p50 of {0,1,2,3} = 1.5
    val r2 = Stats.quantiles(Seq(0.0, 1.0, 2.0, 3.0).toDF("x"), "x", Seq(0.5)).collect()(0)
    assert(r2.getDouble(0) == 1.5)
  }

  test("quantilesApprox tracks the exact tier within rank-error bounds") {
    // skewed data so rank error actually bites if the sketch is wrong
    val df = spark.range(20000).select((pow($"id".cast("double"), 2.0)).as("x")).toDF()
    val exact = Stats.quantiles(df, "x", Seq(0.25, 0.5, 0.75, 0.99)).collect()(0)
    val approx = Stats.quantilesApprox(df, "x", Seq(0.25, 0.5, 0.75, 0.99)).collect()(0)
    for (i <- 0 until 4) {
      val (e, a) = (exact.getDouble(i), approx.getDouble(i))
      // accuracy=10000 on 20k rows => rank error <= 2 ranks; on x=id^2 a
      // 2-rank slip moves the value by < 1% at these percentiles
      assert(math.abs(a - e) <= math.max(1.0, e * 0.01), s"p$i: approx $a vs exact $e")
    }
  }

  test("approxDistinct is within HLL error of exact counts, one row out") {
    val df = spark.range(50000).select(
      ($"id" % 1000).as("a"), ($"id" % 17).as("b"), $"id".as("c")).toDF()
    val r = Stats.approxDistinct(df, Seq("a", "b", "c")).collect()
    assert(r.length == 1)
    val (na, nb, nc) = (r(0).getLong(0), r(0).getLong(1), r(0).getLong(2))
    assert(math.abs(na - 1000) <= 1000 * 0.15, s"a: $na")
    assert(nb == 17, s"b: $nb (small cardinalities are exact in HLL++)")
    assert(math.abs(nc - 50000) <= 50000 * 0.15, s"c: $nc")
  }

  test("revenue_by_nation plan broadcasts nation and prunes fact columns") {
    val plan = graft.SparkEntry.queries("revenue_by_nation")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    // lineitem scan must read only the 3 needed columns of 11
    val scanLine = plan.linesIterator.find(l => l.contains("lineitem") && l.contains("ReadSchema"))
    assert(scanLine.exists(l => l.contains("l_orderkey") && !l.contains("l_shipdate")),
      s"lineitem scan not pruned: $scanLine")
  }
}
