package graft

import org.apache.spark.sql.DataFrame

package object llm {

  /** Ensure a frame entering a map-heavy pipeline (tokenize/shingle/hash/
    * dot-product) has at least the session's default parallelism. A
    * single-file parquet table otherwise arrives as ONE partition and the
    * whole expression pipeline runs as a single task on one core — measured
    * 3× on the bench embeddings pair join and similar on the documents
    * operators. No-op when the input is already partitioned (the 100 TB
    * case), so it never forces a gratuitous full shuffle; when it does fire,
    * it shuffles the raw input rows once, BEFORE the expensive per-row work.
    */
  private[llm] def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
