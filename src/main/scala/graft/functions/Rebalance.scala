package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical._

/** THE shared starvation-gated rebalance (hoisted from the llm package in
  * r15 so the exact/decimal verifier tiers in `graft.dist` can use the same
  * single policy — guide §2: make partitioning scale-adaptive, never a
  * constant tuned for one deployment).
  *
  * Every bench fixture ships as ONE parquet row group, so a scan arrives as
  * ONE split no matter how `maxPartitionBytes` is set, and any per-row-heavy
  * map work (DECIMAL power sums, percentile buffering, shingle explosion)
  * runs on 1 of N cores. Spreading is gated on BOTH measured thresholds:
  *
  *   1. size: optimizer-stats estimated bytes > `minBytes` (stats-only — no
  *      job). Small frames stay put: a spread makes every downstream job pay
  *      a defaultParallelism-task scheduling floor, the wrong trade until
  *      per-row compute dominates (measured both ways at sf0.1/sf100,
  *      SCALE.md §16). Tiers whose per-row cost dwarfs one exchange of the
  *      rows at ANY size (exact all-pairs, 128-bit decimal sums, percentile
  *      buffering) pass `minBytes = 0` and let starvation alone decide.
  *   2. starvation: the planned frame arrives in fewer partitions than the
  *      cluster's parallelism — at corpus scale thousands of scan splits
  *      saturate every core and the gate NEVER fires, so the at-scale plan
  *      shape is untouched.
  *
  * The starvation probe is restricted to NARROW scan-rooted plans
  * (projections/filters/generates over file scans, checkpoints, local
  * relations): there `df.rdd` builds lineage without running a job, and the
  * build-time split count IS the execution-time one. Any frame with a
  * shuffle boundary in its lineage (join/aggregate/window/repartition)
  * returns unchanged — under AQE a `df.rdd` probe there would eagerly
  * materialize the upstream query stages in a throwaway execution (real
  * jobs at DataFrame-BUILD time, recomputed again by the actual action —
  * ADVICE r15), and post-shuffle partitioning is AQE's to manage anyway.
  *
  * Results are unaffected by construction at every call site: only
  * partitioning-invariant computations (exact decimal sums, percentile over
  * the full multiset, min-winners) sit downstream of a spread.
  */
object Rebalance {

  /** One scan split's worth of bytes — the measured size threshold below
    * which a rebalance costs more than the starvation it cures. Reads the
    * session's actual `spark.sql.files.maxPartitionBytes` (a deployment that
    * tunes split size moves this gate with it — ADVICE r15); 128 MiB
    * fallback matches Spark's default. */
  def oneScanSplitBytes(df: DataFrame): Long =
    try df.sparkSession.conf.get("spark.sql.files.maxPartitionBytes").toLong
    catch { case _: Throwable => 134217728L }

  /** True iff every path from `plan`'s root to its leaves crosses only
    * narrow, partitioning-preserving operators — the shapes the public
    * operators hand in (slim projections/filters over a source). On these,
    * `df.rdd` is a pure lineage build (no shuffle stage exists to
    * materialize, so AQE has nothing to execute eagerly). */
  private def narrowScanRooted(plan: LogicalPlan): Boolean = plan match {
    case _: LeafNode => true
    case r: Repartition if !r.shuffle => narrowScanRooted(r.child) // coalesce
    case p @ (_: Project | _: Filter | _: Generate | _: Expand |
              _: Sample | _: Union | _: SubqueryAlias) =>
      p.children.forall(narrowScanRooted)
    case _ => false
  }

  def spreadGated(df: DataFrame, minBytes: Long = -1L): DataFrame = {
    val threshold = if (minBytes >= 0) minBytes else oneScanSplitBytes(df)
    val plan = df.queryExecution.optimizedPlan
    val gated = narrowScanRooted(plan) &&
      plan.stats.sizeInBytes > BigInt(threshold) &&
      df.rdd.getNumPartitions < df.sparkSession.sparkContext.defaultParallelism
    if (gated) df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    else df
  }
}
