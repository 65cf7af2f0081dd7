package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
import org.apache.spark.sql.functions._

/** r13 verdict #1: the ObjectHashAggregate sort-fallback threshold fix must
  * ride the LIBRARY'S integration paths, not just this repo's mains. An
  * untuned session planning a graft object aggregate past 128 keys per
  * partition silently replaces the bounded-state hash combine with a full
  * external sort of the aggregate input — the exact sf100 ENOSPC class
  * fixed in r13. This suite drives both consumer paths on FRESH sessions
  * (no tuneSession anywhere) and proves the hash path at runtime via the
  * operator's own `numTasksFallBacked` metric. */
class SessionTuningSpec extends SparkSpec {

  private val FallbackKey = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"

  /** Build a genuinely fresh session over the shared SparkContext —
    * getOrCreate returns the shared one unless active+default are cleared
    * first; always restore them so later suites see the tuned session. */
  private def withFreshSession[A](build: SparkSession.Builder => SparkSession.Builder)
                                 (body: SparkSession => A): A = {
    spark.sparkContext // force the shared context to exist
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val fresh = build(SparkSession.builder()).getOrCreate()
      assert(fresh ne spark, "builder returned the shared session — test is vacuous")
      body(fresh)
    } finally {
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }

  /** Group 1000 distinct keys in ONE partition through TopKAgg — 8x past
    * the 128-key Spark default, so an untuned session WOULD fall back. */
  private def thousandKeyTopK(s: SparkSession) = {
    import s.implicits._
    (0 until 4000).map(i => (i % 1000L, i.toDouble)).toDF("id", "x")
      .coalesce(1)
      .groupBy("id")
      .agg(TopKAgg.top_k_by(col("x"), col("id"), 2).as("top"))
  }

  /** Sum of `numTasksFallBacked` across every ObjectHashAggregate in the
    * EXECUTED plan (AQE final plan included). */
  private def fallbackTasks(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    // AQE wraps the final plan in leaf nodes `collect` will not descend
    // into (AdaptiveSparkPlanExec and the per-stage QueryStageExec both
    // hold their subtree as a field, not a child) — recurse explicitly
    def nodes(p: org.apache.spark.sql.execution.SparkPlan): Seq[ObjectHashAggregateExec] =
      p.collect {
        case o: ObjectHashAggregateExec => Seq(o)
        case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => nodes(q.plan)
      }.flatten
    val ns = nodes(df.queryExecution.executedPlan)
    assert(ns.nonEmpty, "no ObjectHashAggregate in the executed plan — " +
      "the agg planned differently and this assertion proves nothing:\n" +
      df.queryExecution.executedPlan)
    ns.map(_.metrics("numTasksFallBacked").value).sum
  }

  test("the metric harness itself detects the 128-key fallback (guards " +
    "against a metric rename making this suite vacuous)") {
    val saved = spark.conf.get(FallbackKey)
    // build FIRST: the facade re-tunes a default-valued session at build
    // time (that is the feature), so forcing 128 must happen afterwards —
    // the threshold is read at execution
    val df = thousandKeyTopK(spark)
    spark.conf.set(FallbackKey, "128")
    try {
      assert(fallbackTasks(df) > 0,
        "1000 keys/partition at threshold 128 did not trip the fallback " +
          "metric — the runtime assertion below proves nothing")
    } finally spark.conf.set(FallbackKey, saved)
  }

  test("extensions-only session (the documented production wiring) gets the " +
    "threshold and runs a >128-key object agg with ZERO sort-fallback tasks") {
    withFreshSession(_.withExtensions(new GraftExtensions)) { fresh =>
      // the rule builders (our per-session hook) run when the optimizer is
      // first assembled — any query triggers it
      fresh.range(1).collect()
      assert(fresh.conf.get(FallbackKey) == SessionTuning.fallbackThreshold.toString,
        "GraftExtensions did not deliver the object-agg tuning")
      assert(fallbackTasks(thousandKeyTopK(fresh)) == 0L,
        "extensions-wired session still degraded to sort-based aggregation")
    }
  }

  test("vanilla untuned session calling an operator facade gets the " +
    "threshold at query build time") {
    withFreshSession(identity) { fresh =>
      assert(fresh.conf.get(FallbackKey) == "128", "fresh session not at default")
      val df = thousandKeyTopK(fresh) // facade runs ensureActiveSession()
      assert(fresh.conf.get(FallbackKey) == SessionTuning.fallbackThreshold.toString,
        "facade path did not deliver the object-agg tuning")
      assert(fallbackTasks(df) == 0L)
    }
  }

  test("a user-set non-default threshold is respected, never overridden") {
    withFreshSession(identity) { fresh =>
      fresh.conf.set(FallbackKey, "777")
      thousandKeyTopK(fresh).collect()
      assert(fresh.conf.get(FallbackKey) == "777",
        "SessionTuning clobbered an explicit user setting")
    }
  }
}
