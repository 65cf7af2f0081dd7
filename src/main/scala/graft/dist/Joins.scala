package graft.dist

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join-side scale tooling: explicit skew handling.
  *
  * AQE's skew-join splitting handles moderate skew automatically (and stays
  * on in this engine's sessions); salting is the explicit tool for the case
  * AQE cannot fix — a SINGLE key so hot that one task cannot hold its rows.
  * The classic web-scale examples are the null/default key and boilerplate
  * join keys in training-data pipelines. */
object Joins {

  /** Salted equi-join: the skewed (big) side gets a uniform salt in
    * [0, salts); the small side is replicated once per salt value; the join
    * key becomes (key, salt), splitting each hot key across `salts` tasks.
    *
    * Output equals `big.join(small, keys, "inner")` exactly — the salt only
    * changes the partitioning, never the match set (every (key, salt)
    * combination of the big side finds the same small-side rows). Cost: the
    * small side shuffles `salts`× larger — size `salts` to the skew, not
    * higher. The salt is `rand(seed)`-derived: per-row, uniform, and needs
    * no semantic meaning because correctness never depends on its value. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salts: Int = 8, seed: Long = 42L): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    val saltedBig = big.withColumn("__salt", (rand(seed) * salts).cast("int"))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(replicatedSmall, keys :+ "__salt").drop("__salt")
  }

  /** As-of join: each left row is matched to the LATEST right row with
    * `right.ts <= left.ts` in the same key group (the time-series join Spark
    * has no native operator for — quotes-to-trades, sensor-to-event, …).
    *
    * Implementation is the union-window technique, not a range join: tag the
    * sides, union them, sort each key group by `(ts, side, tie)` with right
    * rows first at equal ts (so equality matches), and carry the right
    * payload forward with `last(payload_struct, ignoreNulls)` over an
    * unbounded-preceding row frame. The payload rides in ONE struct so all
    * its fields come from the SAME right row (per-column `last` could mix
    * rows when payload fields are null).
    *
    * Scale: one shuffle of both inputs on `keys` + a sort — the cost of a
    * sort-merge join, with no candidate-pair explosion (a naive
    * `ts BETWEEN`-style range join is O(left×right) per key). Rows stream
    * through the running window in sorted order, so memory per task is O(1)
    * beyond the sort. `tieBreak` (a right-side column) makes the choice
    * among equal-ts right rows deterministic; pass it whenever right ts
    * values can collide within a key. */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String], tsCol: String,
               rightPayload: Seq[String], tieBreak: Option[String] = None): DataFrame = {
    val leftRest = left.columns.toSeq.filterNot(c => keys.contains(c) || c == tsCol)
    val payloadStruct = struct(rightPayload.map(col): _*)
    val l2 = left.select(
      keys.map(col) ++ Seq(col(tsCol), lit(1).as("__side")) ++ leftRest.map(col) ++
        Seq(lit(null).cast(right.select(payloadStruct).schema.head.dataType).as("__pay"),
          lit(null).cast("long").as("__tie")): _*)
    val r2 = right.select(
      keys.map(col) ++ Seq(col(tsCol), lit(0).as("__side")) ++
        leftRest.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(payloadStruct.as("__pay"),
          tieBreak.map(col(_).cast("long")).getOrElse(lit(0L)).as("__tie")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc, col("__tie").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l2.unionByName(r2)
      .withColumn("__match", last(col("__pay"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(keys.map(col) ++ Seq(col(tsCol)) ++ leftRest.map(col) ++
        rightPayload.map(c => col(s"__match.$c").as(s"r_$c")): _*)
  }

  /** Forward as-of join: each left row matched to the EARLIEST right row
    * at-or-after its timestamp within the key ("what happened next") — the
    * mirror of [[asOfJoin]], same union-window shape: one shuffle on the
    * key, no pair explosion, O(1) running state per task. At equal ts the
    * left row sees the same-ts right row (at-or-AFTER is inclusive);
    * `tieBreak` picks the smallest among equal right timestamps. */
  def asOfJoinForward(left: DataFrame, right: DataFrame, keys: Seq[String], tsCol: String,
                      rightPayload: Seq[String], tieBreak: Option[String] = None): DataFrame = {
    val leftRest = left.columns.toSeq.filterNot(c => keys.contains(c) || c == tsCol)
    val payloadStruct = struct(rightPayload.map(col): _*)
    val l2 = left.select(
      keys.map(col) ++ Seq(col(tsCol), lit(0).as("__side")) ++ leftRest.map(col) ++
        Seq(lit(null).cast(right.select(payloadStruct).schema.head.dataType).as("__pay"),
          lit(null).cast("long").as("__tie")): _*)
    val r2 = right.select(
      keys.map(col) ++ Seq(col(tsCol), lit(1).as("__side")) ++
        leftRest.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(payloadStruct.as("__pay"),
          tieBreak.map(col(_).cast("long")).getOrElse(lit(0L)).as("__tie")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc, col("__tie").asc_nulls_last)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    l2.unionByName(r2)
      .withColumn("__match", first(col("__pay"), ignoreNulls = true).over(w))
      .where(col("__side") === 0)
      .select(keys.map(col) ++ Seq(col(tsCol)) ++ leftRest.map(col) ++
        rightPayload.map(c => col(s"__match.$c").as(s"r_$c")): _*)
  }

  /** Range join: match each point row to every interval row with
    * `lo <= point <= hi` (both ends inclusive) — points-to-intervals is the
    * other join Spark lacks natively (IP-to-geolocation blocks, values to
    * overlapping bands, timestamps to campaign windows).
    *
    * Implementation is cell bucketing, not a nested-loop join: intervals
    * explode to the fixed-width cells they cover, points map to their ONE
    * containing cell, the sides equi-join on the cell id (hash join — the
    * naive `BETWEEN` condition plans as an O(points × intervals) BNLJ), and
    * the exact predicate filters inside the join. A point lives in exactly
    * one cell, so no dedup is needed. `cellWidth` trades replication for
    * selectivity: intervals replicate `(hi-lo)/cellWidth + 1` times, points
    * never replicate — size it near the typical interval width. A single
    * enormous interval (≫ cellWidth) replicates proportionally; cap or
    * split such outliers upstream. */
  def rangeJoin(points: DataFrame, ptCol: String, intervals: DataFrame,
                loCol: String, hiCol: String, cellWidth: Double): DataFrame = {
    require(cellWidth > 0, "cellWidth must be positive")
    val cellOf = (c: Column) => floor(c.cast("double") / lit(cellWidth)).cast("long")
    val iv = intervals.withColumn("__cell",
      explode(sequence(cellOf(col(loCol)), cellOf(col(hiCol)))))
    val pt = points.withColumn("__cell", cellOf(col(ptCol)))
    pt.join(iv, Seq("__cell"))
      .where(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("__cell")
  }
}
