package graft.dist

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def dim(rows: Seq[(Long, Long, Long, Option[Long])]) =
    rows.toDF("k", "h", "valid_from_ms", "valid_to_ms")
  private def batch(rows: Seq[(Long, Long)]) = rows.toDF("k", "h")

  test("applyChanges: keep, close+open, insert, and history passthrough") {
    val d = dim(Seq(
      (1L, 10L, 0L, None),           // unchanged by the batch
      (2L, 20L, 0L, None),           // will change: hash 20 -> 21
      (2L, 19L, -5L, Some(0L)),      // closed history: must pass through
      (3L, 30L, 0L, None)))          // absent from batch: passes through
    val b = batch(Seq((1L, 10L), (2L, 21L), (4L, 40L)))
    val out = Scd.applyChanges(d, b, "k", "h", asOfMs = 100L)
      .as[(Long, Long, Long, Option[Long])].collect().toSet
    assert(out == Set(
      (1L, 10L, 0L, None),           // same hash: untouched
      (2L, 19L, -5L, Some(0L)),      // history intact
      (2L, 20L, 0L, Some(100L)),     // superseded version closed at asOf
      (2L, 21L, 100L, None),         // new current version opened
      (3L, 30L, 0L, None),           // no change row: untouched
      (4L, 40L, 100L, None)))        // brand-new key
  }

  test("applyChanges is idempotent: re-applying the same batch is a no-op") {
    val d = dim(Seq((1L, 10L, 0L, None), (2L, 20L, 0L, None)))
    val b = batch(Seq((1L, 11L), (3L, 30L)))
    val once = Scd.applyChanges(d, b, "k", "h", asOfMs = 50L)
    val twice = Scd.applyChanges(once, b, "k", "h", asOfMs = 99L)
    assert(twice.collect().toSet == once.collect().toSet)
    // exactly one current version per key after any number of applications
    val perKey = twice.where(col("valid_to_ms").isNull)
      .groupBy("k").count().as[(Long, Long)].collect().toMap
    assert(perKey == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("applyChanges: null-key rows are never dropped and never misclassified") {
    // a null business key joins nothing: the null-key current row passes
    // through untouched and the null-key change row opens its own version
    val d = Seq((Option(1L), 10L, 0L, None: Option[Long]),
        (None: Option[Long], 77L, 0L, None: Option[Long]))
      .toDF("k", "h", "valid_from_ms", "valid_to_ms")
    val b = Seq((None: Option[Long], 88L)).toDF("k", "h")
    val out = Scd.applyChanges(d, b, "k", "h", asOfMs = 100L)
      .as[(Option[Long], Long, Long, Option[Long])].collect().toSet
    assert(out == Set(
      (Some(1L), 10L, 0L, None),
      (None, 77L, 0L, None),    // untouched, NOT closed, NOT nulled out
      (None, 88L, 100L, None))) // the change row survives as an insert
  }

  test("applyChanges rejects duplicate keys within one changes batch") {
    // MERGE INTO cardinality: two rows for key 2 would close the same
    // current version twice and open two concurrent versions — the in-plan
    // guard must fire at execution time
    val d = dim(Seq((1L, 10L, 0L, None), (2L, 20L, 0L, None)))
    val b = batch(Seq((2L, 21L), (2L, 22L)))
    val ex = intercept[Exception] {
      Scd.applyChanges(d, b, "k", "h", asOfMs = 100L).collect()
    }
    assert(ex.getMessage.contains("duplicate"))
    // duplicate NULL keys are exempt: each matches nothing, each inserts
    val dn = Seq((Option(1L), 10L, 0L, None: Option[Long]))
      .toDF("k", "h", "valid_from_ms", "valid_to_ms")
    val bn = Seq((None: Option[Long], 88L), (None: Option[Long], 99L)).toDF("k", "h")
    val out = Scd.applyChanges(dn, bn, "k", "h", asOfMs = 100L)
      .as[(Option[Long], Long, Long, Option[Long])].collect().toSet
    assert(out == Set(
      (Some(1L), 10L, 0L, None),
      (None, 88L, 100L, None),
      (None, 99L, 100L, None)))
  }

  test("applyChanges rejects a dimension whose schema drifts from the batch") {
    val d = dim(Seq((1L, 10L, 0L, None))).withColumnRenamed("h", "hash")
    intercept[IllegalArgumentException] {
      Scd.applyChanges(d, batch(Seq((1L, 10L))), "k", "h", asOfMs = 1L)
    }
  }
}
