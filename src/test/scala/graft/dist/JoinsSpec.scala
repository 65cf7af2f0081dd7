package graft.dist

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain join on a pathologically skewed key") {
    // 90% of the big side lands on key 0 — the AQE-resistant single-hot-key shape
    val big = (0 until 1000).map(i => (if (i < 900) 0L else i.toLong % 7, s"v$i"))
      .toDF("k", "payload")
    val small = (0L until 7L).map(k => (k, s"dim$k")).toDF("k", "dim")
    val plain = big.join(small, Seq("k")).select("k", "payload", "dim")
      .collect().map(_.toSeq).toSet
    val salted = Joins.saltedJoin(big, small, Seq("k"), salts = 4)
      .select("k", "payload", "dim").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(salted.size == 1000) // every big row matched exactly once
  }

  test("saltedJoin splits a hot key across multiple partitions") {
    // AQE off for the assertion: its coalescing would legitimately re-merge
    // these tiny partitions and hide the salt's effect
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      // force a shuffle join so partitioning is by (k, salt), not input layout
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val big = (0 until 400).map(_ => (0L, "x")).toDF("k", "payload").coalesce(1)
      val small = Seq((0L, "dim")).toDF("k", "dim")
      val parts = Joins.saltedJoin(big, small, Seq("k"), salts = 4)
        .groupBy(spark_partition_id().as("pid")).count()
        .where(col("count") > 0).count()
      assert(parts > 1, "hot key should spread over more than one partition")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prev)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  test("asOfJoin matches the latest right row at-or-before each left ts, per key") {
    val left = Seq(
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "c"), // 5 precedes any right row
      (2L, 10L, "d")                                 // key 2 has no right rows at all
    ).toDF("k", "ts", "tag")
    val right = Seq(
      (1L, 8L, 100L, 1.5), (1L, 10L, 101L, 2.5), (1L, 15L, 102L, 3.5)
    ).toDF("k", "ts", "rid", "rv")
    val out = Joins.asOfJoin(left, right, Seq("k"), "ts",
        rightPayload = Seq("rid", "rv"), tieBreak = Some("rid"))
      .select("k", "ts", "tag", "r_rid", "r_rv").orderBy("k", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), if (r.isNullAt(4)) -1.0 else r.getDouble(4))).toSeq
    assert(out == Seq(
      (1L, 5L, "c", -1L, -1.0),    // before first right row: no match
      (1L, 10L, "a", 101L, 2.5),   // ts-equality matches (right sorts first)
      (1L, 20L, "b", 102L, 3.5),   // latest at-or-before wins
      (2L, 10L, "d", -1L, -1.0)))  // key absent on the right: no match
  }

  test("asOfJoin tie-break picks the max tie column among equal right ts; payload fields come from one row") {
    val left = Seq((1L, 10L)).toDF("k", "ts")
    val right = Seq((1L, 10L, 7L, 0.7), (1L, 10L, 9L, 0.9), (1L, 10L, 8L, 0.8))
      .toDF("k", "ts", "rid", "rv")
    val r = Joins.asOfJoin(left, right, Seq("k"), "ts", Seq("rid", "rv"), Some("rid"))
      .select("r_rid", "r_rv").collect()
    assert(r.length == 1 && r(0).getLong(0) == 9L && r(0).getDouble(1) == 0.9)
  }

  test("asOfJoin plans a single shuffle (one Exchange over the union)") {
    val left = Seq((1L, 10L, "a")).toDF("k", "ts", "tag")
    val right = Seq((1L, 8L, 100L)).toDF("k", "ts", "rid")
    val plan = Joins.asOfJoin(left, right, Seq("k"), "ts", Seq("rid"))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1, plan)
  }

  test("rangeJoin: overlapping intervals, inclusive bounds, equi-join plan") {
    val pts = Seq((1L, 0.0), (2L, 5.0), (3L, 10.0), (4L, 15.0), (5L, 25.0))
      .toDF("pid", "x")
    val ivs = Seq((0, 0.0, 10.0), (1, 5.0, 20.0), (2, 30.0, 40.0))
      .toDF("iv", "lo", "hi")
    val out = Joins.rangeJoin(pts, "x", ivs, "lo", "hi", cellWidth = 4.0)
    val got = out.select("pid", "iv").as[(Long, Int)].collect().toSet
    // 10.0 is inclusive in [0,10]; 5.0 matches both overlapping bands
    assert(got == Set((1L, 0), (2L, 0), (2L, 1), (3L, 0), (3L, 1), (4L, 1)))
    // the whole point: a hash equi-join on the cell id, never a BNLJ
    val naive = pts.crossJoin(ivs).where($"x" >= $"lo" && $"x" <= $"hi")
      .select("pid", "iv").as[(Long, Int)].collect().toSet
    assert(got == naive)
    assert(!out.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
  }

  test("rangeJoin equals the naive cross-filter on random data (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val ptsGen = Gen.listOfN(60, Gen.chooseNum(-50.0, 50.0))
    val ivsGen = Gen.listOfN(25, for {
      lo <- Gen.chooseNum(-60.0, 55.0)
      w <- Gen.chooseNum(0.0, 30.0)
    } yield (lo, lo + w))
    val widthGen = Gen.chooseNum(0.5, 20.0)
    for (trial <- 0 until 8) {
      val seed = Seed(42L + trial)
      val ptVals = ptsGen.apply(Gen.Parameters.default, seed).get
      val ivVals = ivsGen.apply(Gen.Parameters.default, seed.next).get
      val w = widthGen.apply(Gen.Parameters.default, seed.next.next).get
      val pts = ptVals.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("pid", "x")
      val ivs = ivVals.zipWithIndex.map { case ((lo, hi), i) => (i, lo, hi) }
        .toDF("iv", "lo", "hi")
      val got = Joins.rangeJoin(pts, "x", ivs, "lo", "hi", w)
        .select("pid", "iv").as[(Long, Int)].collect().toSet
      val naive = pts.crossJoin(ivs).where($"x" >= $"lo" && $"x" <= $"hi")
        .select("pid", "iv").as[(Long, Int)].collect().toSet
      assert(got == naive, s"trial $trial (cellWidth $w) diverged from naive join")
    }
  }
  test("intervalJoin: overlap pairs exactly once, closed bounds, equi-join plan") {
    val a = Seq((1L, 0.0, 10.0), (2L, 20.0, 30.0), (3L, 5.0, 25.0))
      .toDF("aid", "a_lo", "a_hi")
    val b = Seq((10L, 8.0, 12.0), (20L, 30.0, 35.0), (30L, 40.0, 50.0))
      .toDF("bid", "b_lo", "b_hi")
    val out = Joins.intervalJoin(a, "a_lo", "a_hi", b, "b_lo", "b_hi", cellWidth = 4.0)
    val got = out.select("aid", "bid").as[(Long, Long)].collect().toSeq.sorted
    // (1,10): [0,10]∩[8,12]; (3,10): [5,25]∩[8,12]; (2,20): touch at 30
    assert(got == Seq((1L, 10L), (2L, 20L), (3L, 10L)))
    assert(!out.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
  }

  test("intervalJoin equals the naive cross-filter on random intervals (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val ivGen = (n: Int) => Gen.listOfN(n, for {
      lo <- Gen.chooseNum(-60.0, 55.0)
      w <- Gen.chooseNum(0.0, 25.0)
    } yield (lo, lo + w))
    val widthGen = Gen.chooseNum(0.5, 20.0)
    for (trial <- 0 until 8) {
      val seed = Seed(1042L + trial)
      val aVals = ivGen(30).apply(Gen.Parameters.default, seed).get
      val bVals = ivGen(20).apply(Gen.Parameters.default, seed.next).get
      val w = widthGen.apply(Gen.Parameters.default, seed.next.next).get
      val a = aVals.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
        .toDF("aid", "a_lo", "a_hi")
      val b = bVals.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
        .toDF("bid", "b_lo", "b_hi")
      val got = Joins.intervalJoin(a, "a_lo", "a_hi", b, "b_lo", "b_hi", w)
        .select("aid", "bid").as[(Long, Long)].collect()
      // exactly-once: no duplicate pairs from multi-cell overlaps
      assert(got.length == got.toSet.size, s"trial $trial emitted duplicates")
      val naive = a.crossJoin(b).where($"a_lo" <= $"b_hi" && $"b_lo" <= $"a_hi")
        .select("aid", "bid").as[(Long, Long)].collect().toSet
      assert(got.toSet == naive, s"trial $trial (cellWidth $w) diverged from naive")
    }
  }

  test("boxJoin: intersecting rectangles exactly once, closed bounds, equi-join plan") {
    val a = Seq(
      (1L, 0.0, 10.0, 0.0, 10.0),   // overlaps b10 in both dims
      (2L, 20.0, 30.0, 20.0, 30.0), // corner-touches b20 at (30, 30)
      (3L, 5.0, 25.0, 40.0, 50.0)   // x overlaps b10/b20, y only b30
    ).toDF("aid", "a_xlo", "a_xhi", "a_ylo", "a_yhi")
    val b = Seq(
      (10L, 8.0, 12.0, 6.0, 14.0),
      (20L, 30.0, 35.0, 30.0, 36.0),
      (30L, 0.0, 50.0, 45.0, 55.0)
    ).toDF("bid", "b_xlo", "b_xhi", "b_ylo", "b_yhi")
    val out = Joins.boxJoin(a, "a_xlo", "a_xhi", "a_ylo", "a_yhi",
      b, "b_xlo", "b_xhi", "b_ylo", "b_yhi", cellWidthX = 4.0, cellWidthY = 7.0)
    val got = out.select("aid", "bid").as[(Long, Long)].collect().toSeq.sorted
    // (1,10): both dims overlap; (2,20): closed-bound corner touch;
    // (3,30): y-overlap with x inside the wide box. (1,30) fails y; (3,10) fails y.
    assert(got == Seq((1L, 10L), (2L, 20L), (3L, 30L)))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  test("boxJoin equals the naive cross-filter on random rectangles (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val boxGen = (n: Int) => Gen.listOfN(n, for {
      xlo <- Gen.chooseNum(-60.0, 55.0); xw <- Gen.chooseNum(0.0, 25.0)
      ylo <- Gen.chooseNum(-60.0, 55.0); yw <- Gen.chooseNum(0.0, 25.0)
    } yield (xlo, xlo + xw, ylo, ylo + yw))
    val widthGen = Gen.chooseNum(0.5, 20.0)
    for (trial <- 0 until 6) {
      val seed = Seed(2042L + trial)
      val aVals = boxGen(25).apply(Gen.Parameters.default, seed).get
      val bVals = boxGen(15).apply(Gen.Parameters.default, seed.next).get
      val wx = widthGen.apply(Gen.Parameters.default, seed.next.next).get
      val wy = widthGen.apply(Gen.Parameters.default, seed.next.next.next).get
      val a = aVals.zipWithIndex.map { case ((xl, xh, yl, yh), i) => (i.toLong, xl, xh, yl, yh) }
        .toDF("aid", "a_xlo", "a_xhi", "a_ylo", "a_yhi")
      val b = bVals.zipWithIndex.map { case ((xl, xh, yl, yh), i) => (i.toLong, xl, xh, yl, yh) }
        .toDF("bid", "b_xlo", "b_xhi", "b_ylo", "b_yhi")
      val got = Joins.boxJoin(a, "a_xlo", "a_xhi", "a_ylo", "a_yhi",
          b, "b_xlo", "b_xhi", "b_ylo", "b_yhi", wx, wy)
        .select("aid", "bid").as[(Long, Long)].collect()
      // exactly-once: the first-shared-cell rule must hold in BOTH dims
      assert(got.length == got.toSet.size, s"trial $trial emitted duplicates")
      val naive = a.crossJoin(b)
        .where($"a_xlo" <= $"b_xhi" && $"b_xlo" <= $"a_xhi" &&
          $"a_ylo" <= $"b_yhi" && $"b_ylo" <= $"a_yhi")
        .select("aid", "bid").as[(Long, Long)].collect().toSet
      assert(got.toSet == naive, s"trial $trial (cells $wx x $wy) diverged from naive")
    }
  }

  test("cell-bucketing joins refuse inputs carrying their reserved working columns") {
    // withColumn would silently REPLACE a pre-existing working column and
    // corrupt the join; all three operators must refuse loudly instead
    val iv = Seq((1L, 0.0, 10.0)).toDF("id", "lo", "hi")
    val pts = Seq((1L, 5.0)).toDF("pid", "p")
    def msg(t: Throwable) = Option(t.getMessage).getOrElse("")
    val e1 = intercept[IllegalArgumentException] {
      Joins.intervalJoin(iv.withColumn("__cell", lit(0L)), "lo", "hi", iv, "lo", "hi", 4.0)
    }
    assert(msg(e1).contains("__cell"))
    val e2 = intercept[IllegalArgumentException] {
      Joins.rangeJoin(pts.withColumn("__cell", lit(0L)), "p", iv, "lo", "hi", 4.0)
    }
    assert(msg(e2).contains("__cell"))
    val box = Seq((1L, 0.0, 1.0, 0.0, 1.0)).toDF("id", "xlo", "xhi", "ylo", "yhi")
    val e3 = intercept[IllegalArgumentException] {
      Joins.boxJoin(box, "xlo", "xhi", "ylo", "yhi",
        box.withColumn("__cy", lit(0L)), "xlo", "xhi", "ylo", "yhi", 1.0, 1.0)
    }
    assert(msg(e3).contains("__cy"))
  }

  test("asOfJoinForward: earliest at-or-after match, inclusive at equal ts, ties by tieBreak") {
    val left = Seq((1L, 10L, 100L), (1L, 25L, 101L), (2L, 5L, 102L))
      .toDF("k", "ts", "lid")
    val right = Seq(
      (1L, 10L, 900L, 1.0),  // equal ts -> visible to (1, 10)
      (1L, 10L, 901L, 2.0),  // same ts: tieBreak picks 900
      (1L, 30L, 902L, 3.0),
      (2L, 3L, 903L, 4.0)    // strictly before -> invisible to (2, 5)
    ).toDF("k", "ts", "rid", "rv")
    val r = Joins.asOfJoinForward(left, right, Seq("k"), "ts",
        rightPayload = Seq("rid", "rv"), tieBreak = Some("rid"))
      .select("lid", "r_rid", "r_rv").collect()
      .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
    assert(r(100L) == 900L) // equal-ts inclusive + tiebreak
    assert(r(101L) == 902L) // next at-or-after
    assert(r(102L) == -1L)  // nothing after -> null
  }

  test("bloomSemiJoin equals the plain semi-join exactly") {
    val fact = (0L until 2000L).map(i => (i, i % 37)).toDF("row_id", "fk")
    val dim = Seq(1L, 5L, 17L, 36L).toDF("k")
    val got = Joins.bloomSemiJoin(fact, dim, "fk", "k")
      .select("row_id").as[Long].collect().toSet
    val want = fact.join(dim, col("fk") === col("k"), "left_semi")
      .select("row_id").as[Long].collect().toSet
    assert(got == want && want.nonEmpty)
  }

  test("bloomAntiJoin equals the plain anti-join, keeps null keys, survives an empty drop list") {
    val fact = ((0L until 50L).map(k => (Some(k), s"row$k")) :+ (None, "rownull"))
      .toDF("k", "payload")
    val drop = Seq(3L, 7L, 11L, 999L).toDF("dk")
    val plain = fact.join(drop, fact("k") === drop("dk"), "left_anti")
      .select("k", "payload").collect().map(_.toSeq).toSet
    val bloomed = Joins.bloomAntiJoin(fact, drop, "k", "dk")
      .select("k", "payload").collect().map(_.toSeq).toSet
    assert(bloomed == plain)
    assert(bloomed.exists(_(1) == "rownull"), "null-key row must be kept")
    assert(bloomed.size == 48) // 51 rows - 3 present drop keys
    // empty drop list: the null bloom must not empty the output
    val none = Joins.bloomAntiJoin(fact, drop.where(lit(false)), "k", "dk")
    assert(none.count() == 51)
  }

  test("bloomAntiJoin stays exact under a saturated (all-positive) bloom") {
    // 1-bit-ish bloom: every probe is positive, so the fast clean path is
    // empty and correctness rests entirely on the exact anti-join
    val fact = (0L until 100L).map(k => (k, s"r$k")).toDF("k", "payload")
    val drop = (0L until 100L by 10L).toDF("dk")
    val out = Joins.bloomAntiJoin(fact, drop, "k", "dk",
      expectedItems = 4L, numBits = 8L)
    assert(out.count() == 90)
    assert(out.where(col("k") % 10 === 0).count() == 0)
  }

  test("bloomSemiJoin stays exact even when the bloom is saturated with false positives") {
    // 64-bit bloom for 500 keys: nearly every probe passes; the exact
    // semi-join must still strip every false positive
    val fact = (0L until 2000L).map(i => (i, i)).toDF("row_id", "fk")
    val dim = (0L until 1000L by 2).toDF("k") // even keys only
    val got = Joins.bloomSemiJoin(fact, dim, "fk", "k",
        expectedItems = 500L, numBits = 64L)
      .select("row_id").as[Long].collect().toSet
    assert(got == (0L until 1000L by 2).toSet)
  }

  test("bloomSemiJoin probes the bloom in a fact-side filter before the join") {
    // a file source, not a LocalRelation: the optimizer eagerly evaluates
    // deterministic filters over local data, folding the probe away
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom").toString
    (0L until 100L).map(i => (i, i)).toDF("row_id", "fk")
      .write.mode("overwrite").parquet(dir)
    val dim = Seq(1L, 2L).toDF("k")
    val df = Joins.bloomSemiJoin(spark.read.parquet(dir), dim, "fk", "k")
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("might_contain"),
      s"expected a might_contain probe in the plan:\n$plan")
  }

}
