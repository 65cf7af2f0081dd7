package graft.dist

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (Type 2) maintenance: apply an upsert batch to
  * a versioned dimension, closing superseded versions and opening new ones,
  * with full history retained. The warehouse-side sibling of
  * [[graft.llm.Dedup.snapshotDiff]] — diff tells you WHAT changed, SCD2
  * keeps every version queryable as-of any time.
  *
  * Contract: the dimension carries `valid_from_ms` / `valid_to_ms` columns
  * over the change-batch schema; a row is current ⟺ `valid_to_ms` is null.
  * Change detection compares a caller-supplied hash column (xxhash64 of the
  * payload in the query tier), so the payload itself never feeds the
  * comparison — the same collision caveat as snapshotDiff.
  *
  * Scale shape: closed history passes through untouched (no shuffle); only
  * current rows full-outer-join the batch on the key, and every joined row
  * expands to its 1-2 output versions in ONE pass (array + explode — a
  * union of per-case re-selects would let Catalyst clone the join per
  * branch). Output volume is |dim| + |changed or new|, i.e. churn-sized
  * growth, exactly like a MERGE INTO. */
object Scd {

  /** Apply `changes` (same schema as the dimension minus the validity
    * columns) to `dim` as of `asOfMs`:
    *   - keys absent from the batch, and keys whose hash is unchanged,
    *     pass through;
    *   - changed keys: the current version closes (`valid_to_ms = asOfMs`)
    *     and a new current version opens;
    *   - unseen keys: a new current version opens;
    *   - already-closed history rows always pass through. */
  def applyChanges(dim: DataFrame, changes: DataFrame, keyCol: String,
                   hashCol: String, asOfMs: Long): DataFrame = {
    val payload = changes.columns.toSeq
    require(dim.columns.toSeq == payload ++ Seq("valid_from_ms", "valid_to_ms"),
      s"dim schema must be the change schema + valid_from_ms/valid_to_ms; " +
        s"got dim=${dim.columns.mkString(",")} changes=${payload.mkString(",")}")
    val hist = dim.where(col("valid_to_ms").isNotNull)
    // side-presence markers, not key-null tests: a NULL business key joins
    // nothing, and without the markers a null-key change row would read as
    // "no change" and emit an all-null version while the upsert vanished.
    // With them it classifies as an insert: a null key is a key that
    // matches nothing, and no row is ever dropped.
    val cur = dim.where(col("valid_to_ms").isNull)
      .withColumn("__cur_present", lit(true))
    // MERGE INTO cardinality: a key may appear at most once per batch — a
    // duplicate would fan out the full-outer join, closing one current
    // version twice and opening concurrent versions for a single key.
    // Enforced lazily in-plan (assert_true fires at execution, like ANSI
    // MERGE's cardinality violation); the guard rides inside the
    // __c_present marker every downstream branch reads, so projection
    // pruning can never drop it, and its window partitioning is the same
    // key the join shuffles on. Null keys are exempt: each null-key row
    // matches nothing and is an independent insert.
    val dupCnt = count(lit(1)).over(
      org.apache.spark.sql.expressions.Window.partitionBy(s"__c_$keyCol"))
    val ch = payload.foldLeft(changes)((d, n) => d.withColumnRenamed(n, s"__c_$n"))
      .withColumn("__c_present",
        when(assert_true(col(s"__c_$keyCol").isNull || dupCnt <= 1,
          concat(lit(s"Scd.applyChanges: duplicate $keyCol in changes batch: "),
            col(s"__c_$keyCol").cast("string"))).isNull, lit(true)))
    val j = cur.join(ch, col(keyCol) === col(s"__c_$keyCol"), "full_outer")
    val noChange = col("__c_present").isNull
    val isNew = col("__cur_present").isNull
    val same = col(hashCol) === col(s"__c_$hashCol")
    def version(cols: Seq[Column], vf: Column, vt: Column) =
      struct((cols :+ vf.as("valid_from_ms") :+ vt.as("valid_to_ms")): _*)
    val nullTo = lit(null).cast("long")
    val curKeep = version(payload.map(col), col("valid_from_ms"), nullTo)
    val curClosed = version(payload.map(col), col("valid_from_ms"), lit(asOfMs))
    val opened = version(payload.map(n => col(s"__c_$n").as(n)),
      lit(asOfMs), nullTo)
    val versions = when(noChange || same, array(curKeep))
      .when(isNew, array(opened))
      .otherwise(array(curClosed, opened))
    hist.unionByName(
      j.select(explode(versions).as("e")).select(col("e.*")))
  }
}
