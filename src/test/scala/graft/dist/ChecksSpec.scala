package graft.dist

import graft.SparkSpec
import graft.dist.Checks._

class ChecksSpec extends SparkSpec {
  import spark.implicits._

  private def run(df: org.apache.spark.sql.DataFrame, cs: Seq[Check]) =
    Checks.validate(df, cs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap

  test("row-local rules: null/NaN, range bounds inclusive, predicate nulls violate") {
    val df = Seq(
      (Some(1L), Some(5.0)), (Some(2L), Some(Double.NaN)), (None, Some(50.0)),
      (Some(4L), None), (Some(5L), Some(51.0))
    ).toDF("id", "v")
    val r = run(df, Seq(NotNull("id"), NotNull("v"),
      InRange("v", 0, 50), Satisfies("v < 100", "v_small")))
    assert(r("not_null(id)") == ((5L, 1L, 0.2, false)))
    // v is double: NaN counts as a null-rule violation alongside the null
    assert(r("not_null(v)") == ((5L, 2L, 0.4, false)))
    // range: 50.0 is INSIDE [0,50]; null and NaN don't violate range; 51 does
    assert(r("in_range(v,0.0,50.0)") == ((5L, 1L, 0.2, false)))
    // predicate: a null verdict (v null) counts as a violation via the
    // coalesce-to-false, and NaN < 100 is plain false — both rows violate
    assert(r("satisfies(v_small)")._2 == 2L)
  }

  test("unique and referential integrity rules") {
    val df = Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "c"), (9L, "d"))
      .toDF("k", "s")
    val ref = Seq(1L, 2L, 3L).toDF("rk")
    val r = run(df, Seq(Unique(Seq("k", "s")), Unique(Seq("k")),
      SubsetOf("k", ref, "rk")))
    // (1,a) appears twice -> 1 overflow row
    assert(r("unique(k,s)") == ((5L, 1L, 0.2, false)))
    // k=1 appears 3 times -> 2 overflow rows
    assert(r("unique(k)") == ((5L, 2L, 0.4, false)))
    // 9 has no referent
    assert(r("subset_of(k)") == ((5L, 1L, 0.2, false)))
  }

  test("tolerance gates pass/fail; all-clean frame passes everything") {
    val df = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 999.0))
      .toDF("id", "v")
    val strict = run(df, Seq(InRange("v", 0, 100)))
    assert(strict("in_range(v,0.0,100.0)") == ((4L, 1L, 0.25, false)))
    val lax = run(df, Seq(InRange("v", 0, 100, tolerance = 0.25)))
    assert(lax("in_range(v,0.0,100.0)")._4) // 0.25 <= 0.25 passes
    val clean = run(df.where($"v" < 100),
      Seq(NotNull("id"), InRange("v", 0, 100), Unique(Seq("id"))))
    assert(clean.values.forall(_._4))
  }

  test("0-row frame: zero violations everywhere, not NULL counts") {
    val df = Seq((1L, 2.0)).toDF("id", "v").where($"id" < 0)
    val r = run(df, Seq(NotNull("id"), InRange("v", 0, 10),
      Unique(Seq("id")), SubsetOf("id", Seq(1L).toDF("rk"), "rk")))
    r.values.foreach { case (n, v, m, pass) =>
      assert(n == 0L && v == 0L && m == 0.0 && pass)
    }
  }

  test("NotNull counts NaN on float columns too, not just double") {
    val df = Seq(Some(1.0f), Some(Float.NaN), None).toDF("f")
    val r = run(df, Seq(NotNull("f")))
    assert(r("not_null(f)") == ((3L, 2L, round2(2.0 / 3), false)))
  }

  private def round2(x: Double) = math.rint(x * 1e9) / 1e9

  test("row-local rules share one aggregate: a single scan of the source") {
    val df = Seq((1L, 2.0)).toDF("id", "v")
    val plan = Checks.validate(df,
      Seq(NotNull("id"), NotNull("v"), InRange("v", 0, 10),
        Satisfies("v > 0", "pos"))).queryExecution.optimizedPlan.toString
    // 4 row-local rules but exactly one scan of the local relation
    assert("LocalRelation|LogicalRDD".r.findAllIn(plan).length == 1, plan)
  }
}
