package graft

import org.apache.spark.sql.DataFrame

package object llm {

  /** Spread a frame entering an O(n²) pair pipeline (cosineTopK,
    * embCosineNearDup) across the session's default parallelism. A
    * single-file parquet table otherwise arrives as ONE partition and the
    * whole pair join runs as a single task on one core — measured 3× on the
    * bench embeddings pair join.
    *
    * Unconditional repartition, deliberately: the callers are the exact
    * all-pairs tier, only sane at driver-enumerable n, where one extra
    * exchange of the raw input rows is noise next to the n² compute it
    * parallelizes. (A conditional `df.rdd.getNumPartitions` probe would
    * build the frame's RDD lineage just to count partitions — plan-freezing
    * work on every call — and the 100 TB bucketed operators never call
    * this helper at all.)
    */
  private[llm] def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
}
