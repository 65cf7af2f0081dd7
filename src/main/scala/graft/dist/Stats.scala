package graft.dist

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-statistics operators beyond histograms: quantiles and distinct
  * counts, each in an exact tier and a sketch tier.
  *
  * The two-tier pattern mirrors the dedup/ANN design: the exact tier is the
  * small-N verifier with a cross-engine oracle; the sketch tier is the
  * 100 TB path — single-pass, mergeable partial states (map-side combine),
  * bounded memory per group — at the cost of engine-specific results that
  * are property-tested against the exact tier instead of oracle-compared. */
object Stats {

  /** Exact interpolated quantiles (SQL `percentile`, linear interpolation —
    * the same contract as DuckDB's `quantile_cont`). One aggregate buffers
    * the column per group: correct and oracle-checkable, but memory is O(n)
    * per group, so this is the verifier tier; use [[quantilesApprox]] at
    * scale. */
  def quantiles(df: DataFrame, colName: String, ps: Seq[Double]): DataFrame =
    quantileCols(df, percentile(col(colName).cast("double"), array(ps.map(lit): _*)), ps)

  /** Approximate quantiles (Greenwald-Khanna sketch): single pass, mergeable
    * partials, worst-case rank error n/accuracy — the scale tier. Results
    * are sketch-algorithm-specific (no cross-engine oracle); property-tested
    * against [[quantiles]]. */
  def quantilesApprox(df: DataFrame, colName: String, ps: Seq[Double],
                      accuracy: Int = 10000): DataFrame =
    quantileCols(df,
      approx_percentile(col(colName).cast("double"), array(ps.map(lit): _*), lit(accuracy)), ps)

  private def quantileCols(df: DataFrame, agg: Column, ps: Seq[Double]): DataFrame = {
    val arr = df.agg(agg.as("qs"))
    arr.select(ps.zipWithIndex.map { case (p, i) =>
      element_at(col("qs"), i + 1).as(s"p${(p * 100).round}")
    }: _*)
  }

  /** HyperLogLog++ distinct counts for several columns in ONE scan:
    * fixed-size mergeable registers per column, map-side combined — the
    * 100 TB distinct-count shape (exact `count_distinct` shuffles every
    * distinct value). Default `rsd` 5%; property-tested against exact
    * counts. */
  def approxDistinct(df: DataFrame, cols: Seq[String], rsd: Double = 0.05): DataFrame =
    df.agg(
      approx_count_distinct(col(cols.head), rsd).as(s"n_${cols.head}"),
      cols.tail.map(c => approx_count_distinct(col(c), rsd).as(s"n_$c")): _*)
}
