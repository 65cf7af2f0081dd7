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

  test("weightedQuantileBy: hand-computed lower weighted median, ties, null drop") {
    // group a: values 1,2,3 with weights 1,1,4 → total 6, half 3; cum at
    // v=1 is 1, v=2 is 2, v=3 is 6 → first v with cum>=3 is 3.
    // group b: tied values 5,5 (w 1,3) then 7 (w 1) → total 5, half 2.5;
    // RANGE frame gives BOTH v=5 rows cum=4 >= 2.5 → wmedian 5 regardless
    // of intra-tie order.
    val df = Seq(
      ("a", 1.0, 1.0), ("a", 2.0, 1.0), ("a", 3.0, 4.0),
      ("b", 5.0, 1.0), ("b", 5.0, 3.0), ("b", 7.0, 1.0)
    ).toDF("g", "v", "w")
      .union(Seq(("a", Double.NaN, 9.0)).toDF("g", "v", "w")) // dropped
    val r = Stats.weightedQuantileBy(df, "v", "w", "g", 0.5, "wm")
      .collect().map(x => (x.getString(0), x.getDouble(1))).toMap
    assert(r == Map("a" -> 3.0, "b" -> 5.0))
    // p=1.0 is the weighted max; equal weights degrade to the plain
    // lower median (v where cum >= n/2)
    val rMax = Stats.weightedQuantileBy(df, "v", "w", "g", 1.0, "wm")
      .collect().map(x => (x.getString(0), x.getDouble(1))).toMap
    assert(rMax == Map("a" -> 3.0, "b" -> 7.0))
    val eq = Seq(("a", 1.0, 1.0), ("a", 2.0, 1.0), ("a", 3.0, 1.0), ("a", 4.0, 1.0))
      .toDF("g", "v", "w")
    val rEq = Stats.weightedQuantileBy(eq, "v", "w", "g", 0.5, "wm").collect()
    assert(rEq(0).getDouble(1) == 2.0)
  }

  test("weightedQuantileBy: non-binary-exact p lands on the decimal boundary") {
    // p=0.1 is not binary-exact: BigDecimal(0.1) would expand to
    // 0.1000000000000000055511151231257827, making the threshold for a
    // total weight of 10 equal 1.000000000000000055... > 1, so the v=1 row
    // (cum exactly 1) would NOT qualify and the answer would flip to 2.
    // With BigDecimal("0.1") the threshold is exactly 1 and v=1 qualifies —
    // the same boundary a SQL oracle's `tot * 0.1` lands on.
    val df = Seq(("a", 1.0, 1.0), ("a", 2.0, 9.0)).toDF("g", "v", "w")
    val r = Stats.weightedQuantileBy(df, "v", "w", "g", 0.1, "wq").collect()
    assert(r(0).getDouble(1) == 1.0)
    // p=0.3 boundary: weights 3 then 7 — cum at v=1 is exactly 3 = tot*0.3
    val df2 = Seq(("a", 1.0, 3.0), ("a", 2.0, 7.0)).toDF("g", "v", "w")
    val r2 = Stats.weightedQuantileBy(df2, "v", "w", "g", 0.3, "wq").collect()
    assert(r2(0).getDouble(1) == 1.0)
  }

  test("weightedQuantileBinned brackets the exact weighted quantile (sketch tier)") {
    // random grouped weighted data: the exact tier's answer must lie inside
    // the sketch tier's bin bracket for every group and several p values,
    // and the bracket width must equal one bin width
    val rnd = new scala.util.Random(4242)
    val rows = (0 until 3000).map { i =>
      (s"g${i % 4}", rnd.nextDouble() * 1000 - 200, (rnd.nextInt(9) + 1).toDouble)
    }
    val df = rows.toDF("g", "v", "w")
    val bounds = df.agg(min("v"), max("v")).head()
    val width = (bounds.getDouble(1) - bounds.getDouble(0)) / 100
    for (p <- Seq(0.1, 0.5, 0.9)) {
      val exact = Stats.weightedQuantileBy(df, "v", "w", "g", p, "wq")
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val binned = Stats.weightedQuantileBinned(df, "v", "w", "g", p, nBins = 100)
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      assert(binned.length == 4)
      binned.foreach { case (g, qlo, qhi) =>
        assert(qlo <= exact(g) && exact(g) <= qhi,
          s"p=$p group $g: exact ${exact(g)} outside bracket [$qlo, $qhi]")
        assert(qhi - qlo <= width + 1e-9, s"bracket wider than one bin: ${qhi - qlo}")
      }
    }
    // degenerate group (all values equal): bracket still contains the value
    val one = Seq(("a", 7.0, 2.0), ("a", 7.0, 3.0)).toDF("g", "v", "w")
    val rb = Stats.weightedQuantileBinned(one, "v", "w", "g", 0.5, nBins = 10).collect()
    assert(rb(0).getDouble(1) <= 7.0 && 7.0 <= rb(0).getDouble(2))
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

  test("quantilesKll tracks the exact tier within its provable rank-error bound") {
    // same skewed shape as the GK test: a rank slip moves the value visibly
    val df = spark.range(20000).select((pow($"id".cast("double"), 2.0)).as("x")).toDF()
    val exact = Stats.quantiles(df, "x", Seq(0.25, 0.5, 0.75, 0.99)).collect()(0)
    val kll = Stats.quantilesKll(df, "x", Seq(0.25, 0.5, 0.75, 0.99)).collect()(0)
    for (i <- 0 until 4) {
      val (e, a) = (exact.getDouble(i), kll.getDouble(i))
      // k=800 => normalized rank error < 0.4%; on x=id^2 a 0.4% rank slip
      // moves the value by < ~2% at these percentiles
      assert(math.abs(a - e) <= math.max(1.0, e * 0.02), s"p$i: kll $a vs exact $e")
    }
  }

  test("quantilesKllBy: per-group sketches track the exact per-group tier") {
    val df = spark.range(30000).select(
      ($"id" % 3).cast("string").as("g"),
      (pow($"id".cast("double"), 1.5) + ($"id" % 3).cast("double") * 1e5).as("x")).toDF()
    val exact = Stats.quantilesBy(df, "x", "g", Seq(0.25, 0.5, 0.75))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val kll = Stats.quantilesKllBy(df, "x", "g", Seq(0.25, 0.5, 0.75))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(kll.keySet == exact.keySet)
    exact.foreach { case (g, (e1, e2, e3)) =>
      val (a1, a2, a3) = kll(g)
      Seq((e1, a1), (e2, a2), (e3, a3)).foreach { case (e, a) =>
        assert(math.abs(a - e) <= math.max(1.0, math.abs(e) * 0.02), s"$g: $a vs $e")
      }
    }
  }

  test("quantilesKll ignores nulls and NaNs like the exact tier") {
    val df = Seq(Some(1.0), Some(2.0), Some(3.0), Some(4.0), None,
      Some(Double.NaN)).toDF("x")
    val r = Stats.quantilesKll(df, "x", Seq(0.5)).collect()(0)
    // 4 clean values; KLL at this size is exact-mode: p50 ∈ {2.0, 3.0}
    assert(r.getDouble(0) == 2.0 || r.getDouble(0) == 3.0, r.toString)
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

  test("histogramEquiDepth: quartile edges on 1..8, two rows per bin") {
    val df = (1 to 8).map(_.toDouble).toDF("x")
    val r = Binning.histogramEquiDepth(df, "x", n = 4)
      .as[(Int, Double, Double, Long)].collect().toSeq
    // p25 of 1..8 interpolates to 2.75 (idx 0.25*7 = 1.75), etc.
    assert(r == Seq((0, 1.0, 2.75, 2L), (1, 2.75, 4.5, 2L),
      (2, 4.5, 6.25, 2L), (3, 6.25, 8.0, 2L)))
    // colliding edges (mass at one value) must fail fast, not mis-bin
    val heavy = Seq(5.0, 5.0, 5.0, 5.0, 9.0).toDF("x")
    intercept[IllegalArgumentException] {
      Binning.histogramEquiDepth(heavy, "x", n = 4)
    }
  }

  test("correlation: perfect positive/negative pairs, constant column null") {
    val df = (1 to 10).map(i => (i.toDouble, 2.0 * i, -1.0 * i, 7.0))
      .toDF("x", "y", "z", "c")
    val r = Stats.correlation(df, Seq("c", "x", "y", "z"))
      .collect().map(row => ((row.getString(0), row.getString(1)),
        if (row.isNullAt(2)) None else Some(row.getDouble(2)))).toMap
    assert(r(("x", "y")).get == 1.0)
    assert(r(("x", "z")).get == -1.0)
    assert(r(("y", "z")).get == -1.0)
    // zero-variance column: undefined correlation -> null, not NaN/error
    assert(r(("c", "x")).isEmpty && r(("c", "y")).isEmpty && r(("c", "z")).isEmpty)
  }

  test("correlation matches an in-memory Pearson reference on random data") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = Gen.listOfN(200, for {
      x <- Gen.chooseNum(-100.0, 100.0); e <- Gen.chooseNum(-20.0, 20.0)
    } yield (x, 0.7 * x + e))
    for (trial <- 0 until 4) {
      val pts = gen.apply(Gen.Parameters.default, Seed(11L + trial)).get
        // keep inputs on the 2-decimal grid the decimal(38,8) moments hold exactly
        .map { case (x, y) => (math.round(x * 100) / 100.0, math.round(y * 100) / 100.0) }
      val df = pts.toDF("x", "y")
      val got = Stats.correlation(df, Seq("x", "y")).collect()(0).getDouble(2)
      val n = pts.size.toDouble
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val sxx = pts.map(p => p._1 * p._1).sum
      val syy = pts.map(p => p._2 * p._2).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val ref = (n * sxy - sx * sy) /
        math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
      assert(math.abs(got - ref) < 1e-6, s"trial $trial: $got vs $ref")
      assert(got >= -1.0 && got <= 1.0)
    }
  }

  test("chiSquare: hand-computed 2x2 table and the independent case") {
    // table: (x,1)=30 (x,2)=10 / (y,1)=10 (y,2)=30 -> chi2 = 20, V = sqrt(20/80)
    val rows = Seq.fill(30)(("x", "1")) ++ Seq.fill(10)(("x", "2")) ++
      Seq.fill(10)(("y", "1")) ++ Seq.fill(30)(("y", "2"))
    val r = Stats.chiSquare(rows.toDF("a", "b"), "a", "b")
      .as[(Double, Int, Long, Double)].collect().head
    assert(math.abs(r._1 - 20.0) < 1e-9 && r._2 == 1 && r._3 == 80L)
    assert(math.abs(r._4 - math.sqrt(0.25)) < 1e-9)
    // perfectly independent table -> chi2 = 0
    val ind = Seq(("x", "1"), ("x", "2"), ("y", "1"), ("y", "2"))
    val r2 = Stats.chiSquare(ind.toDF("a", "b"), "a", "b")
      .as[(Double, Int, Long, Double)].collect().head
    assert(r2._1 == 0.0 && r2._4 == 0.0)
  }

  test("histogramEquiDepthApprox tracks near-equal bin populations on skewed data") {
    val df = spark.range(20000).select((pow($"id".cast("double"), 2.0)).as("x")).toDF()
    val r = Binning.histogramEquiDepthApprox(df, "x", n = 10)
      .as[(Int, Double, Double, Long)].collect().toSeq
    assert(r.size == 10)
    assert(r.map(_._4).sum == 20000L)
    // accuracy=10000 on 20k rows => rank error ~2 per edge; 1% slack
    assert(r.forall(b => math.abs(b._4 - 2000L) <= 200), r.map(_._4).toString)
  }

  test("cdf: running counts and fractions over a histogram (hand-computed)") {
    // values 1..4 into 2 bins over [1,4]: [1,2.5) -> 2, [2.5,4] -> 2
    val h = Binning.histogram(Seq(1.0, 2.0, 3.0, 4.0).toDF("x"), "x", Bins.Count(2))
    val c = Binning.cdf(h).select("bin_id", "cum_cnt", "cdf")
      .as[(Int, Long, Double)].collect()
    assert(c.toSeq == Seq((0, 2L, 0.5), (1, 4L, 1.0)))
  }

  test("distributionDistance: hand-computed TVD over three groups") {
    // 2 bins over [0,1]: g1 = (2,2), g2 = (1,3), g3 = g1
    val df = Seq(
      ("g1", 0.0), ("g1", 0.0), ("g1", 1.0), ("g1", 1.0),
      ("g2", 0.0), ("g2", 1.0), ("g2", 1.0), ("g2", 1.0),
      ("g3", 0.0), ("g3", 0.0), ("g3", 1.0), ("g3", 1.0)
    ).toDF("grp", "x")
    val r = Stats.distributionDistance(df, "x", "grp", n = 2, range = Some((0.0, 1.0)))
      .as[(String, String, Double, Double)].collect().toSeq
    // TVD(g1,g2) = 0.5*(|2/4-1/4| + |2/4-3/4|) = 0.25; g3 == g1
    // KS(g1,g2): cums (2,4) vs (1,4) -> max(|2-1|/4, 0) = 0.25
    assert(r == Seq(("g1", "g2", 0.25, 0.25), ("g1", "g3", 0.0, 0.0),
      ("g2", "g3", 0.25, 0.25)))
  }

  test("zscoreOutliers: exact moments, tail row kept, constant group silent") {
    // group a: mean 2.5, var 18.75 -> z(10) = 7.5/sqrt(18.75) ~ 1.732
    val df = Seq(
      (1L, "a", 0.0), (2L, "a", 0.0), (3L, "a", 0.0), (4L, "a", 10.0),
      (5L, "b", 7.0), (6L, "b", 7.0) // zero variance: z is NaN, never kept
    ).toDF("event_id", "grp", "x")
    val r = Stats.zscoreOutliers(df, "x", "grp", zThresh = 1.5, keepCols = Seq("event_id"))
      .select("event_id", "z").as[(Long, Double)].collect()
    assert(r.length == 1 && r(0)._1 == 4L)
    assert(math.abs(r(0)._2 - 7.5 / math.sqrt(18.75)) < 1e-8)
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
  test("moments: hand-computed mean/variance/skewness/kurtosis; null/NaN dropped") {
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, 5.0), (2.0, 5.0), (3.0, null), (4.0, Double.NaN)
    ).toDF("a", "c0")
    val r = Stats.moments(df, Seq("a", "c0")).collect()
    val a = r.find(_.getString(0) == "a").get
    assert(a.getLong(1) == 4L)
    assert(a.getDouble(2) == 2.5)        // mean
    assert(a.getDouble(3) == 1.25)       // population variance
    assert(a.getDouble(4) == 0.0)        // symmetric -> zero skew
    assert(math.abs(a.getDouble(5) - (2.5625 / 1.5625 - 3.0)) < 1e-9) // excess kurtosis
    val c = r.find(_.getString(0) == "c0").get
    assert(c.getLong(1) == 2L && c.getDouble(3) == 0.0) // clean n=2, zero variance
    assert(c.isNullAt(4) && c.isNullAt(5))               // null skew/kurt at zero variance
  }

  test("momentsFast agrees with exact moments to 1e-9 relative (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = Gen.listOfN(400, Gen.chooseNum(-1000.0, 1000.0))
    for (trial <- 0 until 3) {
      val xs = gen.apply(Gen.Parameters.default, Seed(900L + trial)).get
      // round to the 2-decimal grid so the exact tier is a true reference
      val df = xs.map(x => math.rint(x * 100) / 100).toDF("a").repartition(4)
      val exact = Stats.moments(df, Seq("a")).collect().head
      val fast = Stats.momentsFast(df, Seq("a")).collect().head
      assert(fast.getLong(1) == exact.getLong(1))
      for (i <- 2 to 5) {
        val (e, f) = (exact.getDouble(i), fast.getDouble(i))
        val tol = 1e-9 * math.max(1.0, math.abs(e))
        assert(math.abs(f - e) <= tol, s"trial $trial field $i: fast=$f exact=$e")
      }
    }
    // schemas are interchangeable between the tiers
    val df1 = Seq(1.0, 2.0).toDF("a")
    assert(Stats.momentsFast(df1, Seq("a")).schema ==
      Stats.moments(df1, Seq("a")).schema)
  }

  test("correlationFast agrees with exact correlation to 1e-9 (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = Gen.listOfN(400, Gen.zip(
      Gen.chooseNum(-1000.0, 1000.0), Gen.chooseNum(-1000.0, 1000.0)))
    for (trial <- 0 until 3) {
      val xs = gen.apply(Gen.Parameters.default, Seed(910L + trial)).get
      // 2-decimal grid + correlated second column so corr is far from 0
      val df = xs.map { case (a, b) =>
        val ar = math.rint(a * 100) / 100
        (ar, math.rint((ar + b) * 100) / 100)
      }.toDF("a", "b").repartition(4)
      val exact = Stats.correlation(df, Seq("a", "b")).collect().head
      val fast = Stats.correlationFast(df, Seq("a", "b")).collect().head
      val (e, f) = (exact.getDouble(2), fast.getDouble(2))
      assert(math.abs(f - e) <= 1e-9, s"trial $trial: fast=$f exact=$e")
    }
    val df1 = Seq((1.0, 2.0), (2.0, 5.0)).toDF("a", "b")
    assert(Stats.correlationFast(df1, Seq("a", "b")).schema ==
      Stats.correlation(df1, Seq("a", "b")).schema)
    // zero-variance column: both tiers must yield null (under ANSI mode the
    // unguarded built-in corr would instead throw DIVIDE_BY_ZERO here)
    val const = Seq((1.0, 7.0), (2.0, 7.0), (3.0, 7.0)).toDF("a", "b")
    val fr = Stats.correlationFast(const, Seq("a", "b")).collect().head
    val er = Stats.correlation(const, Seq("a", "b")).collect().head
    assert(fr.isNullAt(2) && er.isNullAt(2))
  }

  test("momentsBy: per-group moments match the single-column operator per slice") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
                 ("b", 5.0), ("b", 5.0)).toDF("g", "v")
    val r = Stats.momentsBy(df, "v", "g").collect()
    val a = r.find(_.getString(0) == "a").get
    assert(a.getLong(1) == 4L && a.getDouble(2) == 2.5 && a.getDouble(3) == 1.25)
    assert(a.getDouble(4) == 0.0)
    val b = r.find(_.getString(0) == "b").get
    assert(b.getLong(1) == 2L && b.getDouble(3) == 0.0 && b.isNullAt(4) && b.isNullAt(5))
  }

  test("entropy: uniform = ln k, constant = 0, nulls excluded") {
    val df = Seq(("x", "c", "p"), ("y", "c", "p"), ("z", "c", null), ("w", "c", "q"))
      .toDF("u", "k", "s")
    val r = Stats.entropy(df, Seq("u", "k", "s")).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(r("u") == ((4L, 4L, math.rint(math.log(4.0) * 1e9) / 1e9))) // uniform over 4
    assert(r("k") == ((4L, 1L, 0.0)))                                  // constant column
    // s: nulls dropped -> {p:2, q:1}, H = ln3 - (2 ln2)/3
    val hs = math.log(3.0) - 2.0 * math.log(2.0) / 3.0
    assert(math.abs(r("s")._3 - hs) < 1e-8 && r("s")._1 == 3L && r("s")._2 == 2L)
  }

  test("keySkew: uniform keys give factor 1, a hot key dominates") {
    val uni = (0 until 100).map(i => (i % 10, i)).toDF("k", "v")
    val r = Stats.keySkew(uni, "k").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)) == ((100L, 10L, 10L, 1.0)))
    val hot = ((0 until 91).map(_ => (1, 0)) ++ (2 until 11).map(i => (i, 0))).toDF("k", "v")
    val h = Stats.keySkew(hot, "k").head()
    assert(h.getLong(2) == 91L && h.getDouble(3) == 91.0 * 10.0 / 100.0)
  }

  test("profile: counts, nulls, cardinality, range, exact mean per column") {
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, 10.0), (2.0, null), (2.0, 30.0), (null, 10.0))
      .toDF("a", "b")
    val r = Stats.profile(df, Seq("a", "b")).collect()
      .map(x => x.getString(0) -> x).toMap
    val a = r("a")
    assert(a.getLong(1) == 4L && a.getLong(2) == 3L && a.getLong(3) == 2L)
    assert(a.getDouble(4) == 1.0 && a.getDouble(5) == 2.0)
    assert(math.abs(a.getDouble(6) - 5.0 / 3.0) < 1e-12)
    val b = r("b")
    assert(b.getLong(1) == 4L && b.getLong(2) == 3L && b.getLong(3) == 2L)
    assert(b.getDouble(4) == 10.0 && b.getDouble(5) == 30.0)
    assert(math.abs(b.getDouble(6) - 50.0 / 3.0) < 1e-12)
  }

  test("mutualInformation: zero for independent, ln k for identical columns") {
    // independent 2x2 uniform: MI = 0, NMI = 0
    val ind = Seq(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q")).toDF("a", "b")
    val ri = Stats.mutualInformation(ind, "a", "b").head()
    assert(ri.getLong(0) == 4L && math.abs(ri.getDouble(1)) < 1e-9)
    assert(math.abs(ri.getDouble(2) - math.log(2.0)) < 1e-8)
    assert(math.abs(ri.getDouble(4)) < 1e-9)
    // identical columns, 3 uniform values: MI = H = ln 3, NMI = 1
    val dep = Seq(("x", "x"), ("y", "y"), ("z", "z")).toDF("a", "b")
    val rd = Stats.mutualInformation(dep, "a", "b").head()
    assert(math.abs(rd.getDouble(1) - math.log(3.0)) < 1e-8)
    assert(math.abs(rd.getDouble(4) - 1.0) < 1e-9)
  }

  test("gini: 0 for equal weights, closed-form for concentrated mass") {
    val eq = Seq(5L, 5L, 5L, 5L).toDF("w")
    val re = Stats.gini(eq, "w").head()
    assert(re.getLong(0) == 4L && re.getLong(1) == 20L && re.getDouble(2) == 0.0)
    // {0,0,0,10}: sorted ranks 1..4, sum(i*w) = 40, G = 80/(4*10) - 5/4 = 0.75
    val hot = Seq(0L, 0L, 10L, 0L).toDF("w")
    val rh = Stats.gini(hot, "w").head()
    assert(rh.getLong(1) == 10L && rh.getDouble(2) == 0.75)
    // mixed with duplicate weights: {1,1,2}: sum(i*w) = 1+2+6 = 9
    // G = 18/(3*4) - 4/3 = 1.5 - 1.3333... = 0.166666667
    val rm = Stats.gini(Seq(1L, 2L, 1L).toDF("w"), "w").head()
    assert(math.abs(rm.getDouble(2) - (18.0 / 12.0 - 4.0 / 3.0)) < 1e-9)
  }

  test("entropyBy: per-group mix entropy, uniform vs constant hand-checked") {
    val df = Seq(
      ("s1", "en"), ("s1", "de"), ("s1", "fr"), ("s1", "es"), // uniform over 4
      ("s2", "en"), ("s2", "en"), ("s2", "en"),               // constant
      ("s3", "en"), ("s3", "en"), ("s3", "de")                // 2:1 mix
    ).toDF("source", "lang")
    val r = Stats.entropyBy(df, "lang", "source").collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(r("s1") == ((4L, 4L, math.rint(math.log(4.0) * 1e9) / 1e9)))
    assert(r("s2") == ((3L, 1L, 0.0)))
    val h3 = math.log(3.0) - 2.0 * math.log(2.0) / 3.0
    assert(math.abs(r("s3")._3 - h3) < 1e-8 && r("s3")._2 == 2L)
  }

  test("madOutliers: robust flags where mean/stddev would be dragged") {
    // group "a": 20 values near 10 plus one wild point at 1000 — classic
    // case where the outlier inflates stddev but not the MAD
    val a = (1 to 20).map(i => ("a", 10.0 + (i % 5 - 2) * 0.5)) :+ (("a", 1000.0))
    // group "b": constant values -> MAD 0, any deviation flags
    val b = Seq(("b", 5.0), ("b", 5.0), ("b", 5.0), ("b", 7.0))
    val r = Stats.madOutliers((a ++ b).toDF("event_type", "value"), "value", "event_type")
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getDouble(2), x.getDouble(3), x.getLong(4)))).toMap
    val (na, medA, madA, outA) = r("a")
    assert(na == 21L && medA == 10.0 && madA == 0.5 && outA == 1L)
    val (nb, medB, madB, outB) = r("b")
    assert(nb == 4L && medB == 5.0 && madB == 0.0 && outB == 1L)
  }

  test("hllByGroup + hllUnionEstimate: merged sketches track exact distincts") {
    // 3 "days" with overlapping user sets; union must dedupe across groups
    val rows = (0 until 3).flatMap(day =>
      (0 until 400).map(i => (day, (day * 200 + i).toLong))) // overlap 200
    val df = rows.toDF("day", "user_id")
    val daily = Stats.hllByGroup(df, "user_id", col("day"), "day")
    assert(daily.count() == 3L)
    val perDay = daily.select(col("day"),
        hll_sketch_estimate(col("sketch")).as("est"))
      .as[(Int, Double)].collect().toMap
    (0 until 3).foreach(d =>
      assert(math.abs(perDay(d) - 400.0) / 400.0 < 0.05, s"day $d: ${perDay(d)}"))
    // exact distinct overall = 200*3 + 200 = 800
    val total = Stats.hllUnionEstimate(daily).as[Double].head()
    assert(math.abs(total - 800.0) / 800.0 < 0.05, s"union estimate $total")
  }

  test("winsorize: interpolated bounds, tail clip counts, exact means") {
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val r = Stats.winsorize(df, "v", 0.01, 0.99).head()
    // sorted 1..100: p01 = 1 + 0.99 = 1.99, p99 = 99 + 0.01 = 99.01
    assert(math.abs(r.getDouble(0) - 1.99) < 1e-12)
    assert(math.abs(r.getDouble(1) - 99.01) < 1e-12)
    assert(r.getLong(2) == 1L && r.getLong(3) == 1L) // only 1 and 100 clip
    assert(r.getDouble(4) == 50.5)
    // clip moves 1 -> 1.99 (+0.99) and 100 -> 99.01 (-0.99): mean unchanged
    assert(math.abs(r.getDouble(5) - 50.5) < 1e-12)
  }

  test("benfordAudit: integer-cents digit binning, shares, sub-cent drop") {
    val df = Seq(1.23, 19.5, 0.05, 25.0, 999.99, 0.001, -3.0)
      .toDF("amount")
    // digits: 123->1, 1950->1, 5->5, 2500->2, 99999->9;
    // 0.001 rounds to 0 cents (dropped), -3.0 dropped (non-positive)
    val r = Stats.benfordAudit(df, "amount")
      .as[(Int, Long, Double, Double, Double)].collect()
      .map(x => x._1 -> x).toMap
    assert(r.keySet == Set(1, 2, 5, 9))
    assert(r(1)._2 == 2L && r(2)._2 == 1L && r(5)._2 == 1L && r(9)._2 == 1L)
    assert(r(1)._3 == 0.4) // 2 of 5
    assert(r(1)._4 == Stats.benfordShares.head)
    assert(r(1)._5 == math.rint(0.4 / Stats.benfordShares.head * 1e9) / 1e9)
  }

  test("psiMatrix: identical groups score 0; shift matches the hand formula") {
    // two bins over [0,10); a balanced 5/5, b skewed 8/2, c identical to a
    val rows = (Seq.fill(5)(2.0) ++ Seq.fill(5)(7.0)).map(("a", _)) ++
      (Seq.fill(8)(2.0) ++ Seq.fill(2)(7.0)).map(("b", _)) ++
      (Seq.fill(5)(2.0) ++ Seq.fill(5)(7.0)).map(("c", _))
    val r = Stats.psiMatrix(rows.toDF("g", "v"), "v", "g",
        n = 2, range = Some((0.0, 10.0)))
      .select("grp_a", "grp_b", "psi").as[(String, String, Double)]
      .collect().map(x => (x._1, x._2) -> x._3).toMap
    assert(r(("a", "c")) == 0.0) // identical histograms: exactly zero
    def share(c: Long) = (c + 0.5) / 11.0 // tot 10 + 2 bins * eps 0.5
    def term(ca: Long, cb: Long) = {
      val (p, q) = (share(ca), share(cb))
      math.rint((p - q) * math.log(p / q) * 1e9) / 1e9
    }
    val expect = BigDecimal(term(5, 8)) + BigDecimal(term(5, 2))
    assert(r(("a", "b")) == expect.toDouble)
    assert(r(("b", "c")) == expect.toDouble) // PSI is symmetric
    assert(r(("a", "b")) > 0.1) // a genuine shift reads as drift
  }

  test("skyline2d: hand case — dominance, x-ties, exact duplicates") {
    // minimize x, maximize y. (1,5) and (3,7) survive; (2,4) is dominated by
    // (1,5); (3,6) dominated by (3,7) via the x-tie; (1,5) duplicate row
    // collapses to multiplicity 2, not a dominance casualty
    val df = Seq((1.0, 5.0), (1.0, 5.0), (2.0, 4.0), (3.0, 7.0), (3.0, 6.0))
      .toDF("x", "y")
    val r = Stats.skyline2d(df, "x", "y").as[(Double, Double, Long)]
      .collect().toSeq
    assert(r == Seq((1.0, 5.0, 2L), (3.0, 7.0, 1L)))
  }

  test("skyline2d matches the NOT-EXISTS dominance definition on random points") {
    val rnd = new scala.util.Random(11)
    val pts = Seq.fill(400)((rnd.nextInt(30).toDouble, rnd.nextInt(30).toDouble))
    val dist = pts.distinct
    val brute = dist.filter { case (x, y) =>
      !dist.exists { case (px, py) =>
        px <= x && py >= y && (px < x || py > y)
      }
    }.sorted
    val got = Stats.skyline2d(pts.toDF("x", "y"), "x", "y")
      .as[(Double, Double, Long)].collect().toSeq
    assert(got.map(p => (p._1, p._2)).sorted == brute)
    // multiplicities: every skyline point carries its full duplicate count
    val counts = pts.groupBy(identity).view.mapValues(_.size.toLong).toMap
    got.foreach(p => assert(p._3 == counts((p._1, p._2))))
    // result is invariant to partitioning (the local prune is sound)
    val got1 = Stats.skyline2d(pts.toDF("x", "y").repartition(13), "x", "y")
      .as[(Double, Double, Long)].collect().toSeq
    assert(got1 == got)
  }
}
