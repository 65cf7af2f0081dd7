package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming face of [[graft.dist.Scd]]: maintain a Type-2 dimension from a
  * change stream. The batch operator is the MERGE; this is the sink loop
  * around it — `foreachBatch` applies each micro-batch as one SCD2 merge
  * and persists the dimension as VERSIONED parquet snapshots
  * (`dimDir/v=<batchId>`), which is what makes restart exactly-once:
  *
  *   - a replayed batch N rebuilds from the newest version BELOW N and
  *     overwrites `v=N` — a partially-written `v=N` from the failed run is
  *     never read, and the rebuild is deterministic (same base + same
  *     batch ⇒ same snapshot);
  *   - point-in-time readers pin a version directory; the change stream
  *     can keep committing under them (the streaming sibling of
  *     [[graft.dist.Scd]]'s as-of lookups).
  *
  * Scale shape: each micro-batch costs one |dim| + |batch| merge (the
  * batch operator's churn-sized join) plus a full dimension rewrite — the
  * parquet-snapshot equivalent of a warehouse MERGE INTO target table.
  * At 100 TB dimension scale the rewrite amortizes by partitioning the
  * dimension on a stable key prefix and rewriting only touched partitions
  * (dynamic partition overwrite); the versioning and replay contract here
  * is unchanged by that refinement. */
object ScdStream {

  /** Newest committed snapshot version strictly below `beforeId`, if any.
    * "Committed" means the directory carries the `_SUCCESS` marker the
    * parquet job committer writes LAST — a sink crash mid-write of `v=N`
    * leaves a partial directory with no marker, and selecting it would
    * hand external readers a torn snapshot. Non-numeric `v=*` dirnames
    * (foreign tooling, temp dirs) are skipped via `toLongOption` instead
    * of throwing. */
  private[streaming] def latestVersionBefore(spark: SparkSession, dimDir: String,
                                             beforeId: Long): Option[Long] = {
    val p = new Path(dimDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else fs.listStatus(p).toSeq
      .filter(_.isDirectory)
      .flatMap(s => s.getPath.getName match {
        case n if n.startsWith("v=") =>
          n.drop(2).toLongOption.filter(_ =>
            fs.exists(new Path(s.getPath, "_SUCCESS")))
        case _ => None
      })
      .filter(_ < beforeId)
      .sorted.lastOption
  }

  /** Read the newest committed dimension snapshot (for asserts / consumers);
    * None when no batch has committed yet. */
  def latestDim(spark: SparkSession, dimDir: String): Option[DataFrame] =
    latestVersionBefore(spark, dimDir, Long.MaxValue)
      .map(v => spark.read.parquet(s"$dimDir/v=$v"))

  /** One micro-batch as one SCD2 merge. Within-batch MERGE cardinality is
    * restored by keeping the LAST change per key (event-time order, hash
    * tiebreak — deterministic under replay); [[graft.dist.Scd]]'s in-plan
    * guard then sees unique keys. Null-key rows are dropped at this
    * boundary: a dimension key must identify an entity, and a streaming
    * null key is a malformed CDC record, not an insert. `asOf` for the
    * merge is the max event time over the surviving keyed rows —
    * deterministic on replay, unlike wall-clock. Empty batches commit no
    * version. */
  private[streaming] def applyScdBatch(batch: DataFrame, batchId: Long, dimDir: String,
                                       keyCol: String, hashCol: String,
                                       tsCol: String): Unit = {
    val spark = batch.sparkSession
    val keyed = batch.where(col(keyCol).isNotNull)
    if (keyed.isEmpty) return
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).desc, col(hashCol).desc)
    val deduped = keyed.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
    val asOf = keyed.agg(max(unix_millis(col(tsCol)))).head().getLong(0)
    val base = latestVersionBefore(spark, dimDir, batchId) match {
      case Some(v) => spark.read.parquet(s"$dimDir/v=$v")
      case None => deduped.where(lit(false))
        .withColumn("valid_from_ms", lit(0L))
        .withColumn("valid_to_ms", lit(null).cast("long"))
    }
    graft.dist.Scd.applyChanges(base, deduped, keyCol, hashCol, asOf)
      .write.mode("overwrite").parquet(s"$dimDir/v=$batchId")
  }

  /** Start the change-stream → SCD2-dimension sink. `changes` must carry
    * the key, the payload hash, and an event-time column; the dimension
    * snapshot schema is the change schema + `valid_from_ms`/`valid_to_ms`. */
  def scd2Sink(changes: DataFrame, dimDir: String, checkpoint: String,
               keyCol: String = "doc_id", hashCol: String = "h",
               tsCol: String = "ts"): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) =>
        applyScdBatch(b, id, dimDir, keyCol, hashCol, tsCol)
      }
      .start()
}
