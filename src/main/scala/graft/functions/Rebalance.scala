package graft.functions

import org.apache.spark.sql.DataFrame

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
  * Results are unaffected by construction at every call site: only
  * partitioning-invariant computations (exact decimal sums, percentile over
  * the full multiset, min-winners) sit downstream of a spread.
  */
object Rebalance {

  /** One scan split's worth of bytes (`spark.sql.files.maxPartitionBytes`
    * default) — the measured size threshold below which a rebalance costs
    * more than the starvation it cures. */
  val oneScanSplitBytes: Long = 134217728L

  def spreadGated(df: DataFrame, minBytes: Long = oneScanSplitBytes): DataFrame = {
    val gated =
      df.queryExecution.optimizedPlan.stats.sizeInBytes > BigInt(minBytes) &&
        df.rdd.getNumPartitions < df.sparkSession.sparkContext.defaultParallelism
    if (gated) df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    else df
  }
}
