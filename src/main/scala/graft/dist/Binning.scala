package graft.dist

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bin specification: either a bin count (edges derived from data min/max or
  * an explicit range) or an explicit, validated boundary list.
  *
  * Semantics reproduce PySpark's `RDD.histogram`
  * (pyspark/core/rdd.py:2214-2366), which is the engine the reference library
  * (Bergvca/pyspark_dist_explore, pyspark_dist_explore.py ~L100-160) delegates
  * all bucketing math to. See SURVEY.md §2.3 for the line-exact rule table.
  */
sealed trait Bins
object Bins {
  /** n equal-width bins over [min, max] (or an explicit range). */
  final case class Count(n: Int) extends Bins { require(n >= 1, "bins must be >= 1") }
  /** Explicit boundaries: n+1 edges for n bins. Validated per rdd.py:2315-2326. */
  final case class Edges(edges: Seq[Double]) extends Bins
}

/** Distributed histogram core.
  *
  * Design (SURVEY.md §3/§4): everything stays in the DataFrame world — the
  * scan is vectorized parquet, the null/range filter and the bin expression
  * are codegen'd `Column`s, counting is one `groupBy(bin_id).count()` (hash
  * aggregate, partial+final, shuffle of at most n_bins × n_series rows), and
  * the dense-bin fill is a broadcast join against a tiny spine. Two Spark
  * jobs total regardless of series count: one combined min/max agg, one
  * counting job. This shape is scale-invariant: at 100 TB the scan dominates
  * and both passes are embarrassingly parallel with O(n_bins) shuffle.
  */
object Binning {

  /** Output schema of every histogram: (bin_id INT, bin_lo DOUBLE,
    * bin_hi DOUBLE, cnt BIGINT), dense (zero-count bins present), sorted. */
  val schemaDoc: String = "(bin_id INT, bin_lo DOUBLE, bin_hi DOUBLE, cnt BIGINT)"

  /** Engine session tuning. `InferFiltersFromGenerate` is excluded because it
    * inserts `size(e) > 0 && isnotnull(e)` filters before every explode,
    * re-inlining the generator's (expensive) expression tree into a pushed
    * filter — the tokenize+shingle chain then evaluates ~3× per row instead
    * of once (measured 40% slowdown on the shingle-based dedup operators).
    * Generate with outer=false already skips null/empty inputs, so the
    * exclusion is semantics-neutral. */
  def tuneSession(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.conf.set("spark.sql.optimizer.excludedRules",
      "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
    // ObjectHashAggregate sort-fallback fix — shared, consumer-path-complete
    // delivery since r14 (see graft.functions.SessionTuning for the full
    // r13 sf100 ENOSPC story and the checked bounded-state contract)
    graft.functions.SessionTuning.ensureObjectAggHashPath(spark)
    // the engine's rewrite rules, for sessions built without
    // spark.sql.extensions=graft.functions.GraftExtensions; each is a
    // no-op unless its spark.graft.*.cellWidth conf is set (idempotent add)
    val rules = Seq(graft.plans.RangeJoinRewrite,
      graft.plans.IntervalJoinRewrite, graft.plans.BoxJoinRewrite)
    val cur = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = cur ++ rules.filterNot(cur.contains)
  }

  /** Equal-width edges: `[i*inc + lo for i in 0 until n] :+ hi` — the last
    * edge is the exact max, absorbing float error (rdd.py:2311-2312). The
    * integer-width nicety (rdd.py:2306-2309) is automatic in IEEE doubles:
    * when (hi-lo) is an integer divisible by n, (hi-lo)/n is exact. */
  def equalWidthEdges(lo: Double, hi: Double, n: Int): Vector[Double] = {
    require(n >= 1, "bins must be >= 1")
    require(!lo.isNaN && !hi.isNaN && lo <= hi, s"invalid range [$lo, $hi]")
    if (lo == hi || n == 1) Vector(lo, hi)
    else {
      val inc = (hi - lo) / n
      (0 until n).map(i => i * inc + lo).toVector :+ hi
    }
  }

  /** Boundary validation per rdd.py:2315-2326: at least 2 edges, strictly
    * increasing (sorted, no duplicates), no NaN. */
  def validateEdges(edges: Seq[Double]): Unit = {
    require(edges.size >= 2, "buckets should have more than one value")
    require(!edges.exists(_.isNaN), "can not have NaN in buckets")
    require(edges.sliding(2).forall(p => p(0) < p(1)),
      "buckets should be sorted and should not contain duplicated values")
  }

  /** Even-width detection tolerance per rdd.py:2340-2342. */
  def isEvenWidth(edges: Seq[Double]): Boolean = {
    val steps = edges.sliding(2).map(p => p(1) - p(0)).toVector
    steps.max - steps.min < 1e-10
  }

  /** Bin-id expression for a value column against fixed edges.
    *
    * Even widths (rdd.py:2352-2354 fast path):
    *   `least(floor((x - lo) / step), n-1)` — the `least` clamp folds the
    *   overflow slot for x == max into the last bucket, reproducing the
    *   closed last bucket `[e_{n-1}, e_n]` (rdd.py:2218-2222, 2358-2360).
    * Uneven widths (rdd.py:2355-2356 bisect path):
    *   `bisect_right(edges, x) - 1` as a CASE chain, ELSE = last bucket.
    * Caller must already have filtered to non-null, non-NaN, in-range values
    * (rdd.py:2350-2351: out-of-range and null/NaN are silently dropped).
    */
  def binId(x: Column, edges: Seq[Double]): Column = {
    val n = edges.size - 1
    if (n == 1) lit(0)
    else if (isEvenWidth(edges)) {
      val lo = edges.head
      val step = (edges.last - edges.head) / n
      least(floor((x - lit(lo)) / lit(step)), lit(n - 1)).cast("int")
    } else {
      var c = when(x < edges(1), 0)
      for (i <- 2 until n) c = c.when(x < edges(i), i - 1)
      c.otherwise(n - 1).cast("int")
    }
  }

  /** Null/NaN/range filter (rdd.py:2275-2282, 2350-2351). */
  private def cleaned(df: DataFrame, colName: String): DataFrame =
    df.select(col(colName).cast("double").as("x"))
      .where(col("x").isNotNull && !isnan(col("x")))

  /** bin_lo / bin_hi expressions for even-width bins, written so the exact
    * same arithmetic is expressible in the DuckDB oracle (bit-identical
    * doubles): lo_i = i*step + lo; hi_i = hi for the last bin else
    * (i+1)*step + lo. */
  private def evenEdgeCols(binId: Column, lo: Double, hi: Double, n: Int): (Column, Column) = {
    val step = (hi - lo) / n
    val binLo = binId * lit(step) + lit(lo)
    val binHi = when(binId === lit(n - 1), lit(hi)).otherwise((binId + lit(1)) * lit(step) + lit(lo))
    (binLo.as("bin_lo"), binHi.as("bin_hi"))
  }

  /** Dense spine of bin ids 0..n-1 (tiny; the post-agg join against it is a
    * broadcast over at most n rows — never a scale concern). */
  private def spine(df: DataFrame, n: Int): DataFrame =
    df.sparkSession.range(n).select(col("id").cast("int").as("bin_id"))

  /** Histogram of one numeric column. Returns a dense, sorted DataFrame
    * `(bin_id, bin_lo, bin_hi, cnt)`.
    *
    * `range` overrides the data-derived min/max (reference `range=` kwarg);
    * explicit `Bins.Edges` ignores `range` (edges win). Degenerate min==max
    * (or n==1) yields the single closed bucket `[v, v]` (rdd.py:2295-2296).
    * Empty input with derived range raises (rdd.py:2290-2292).
    */
  def histogram(df: DataFrame, colName: String, bins: Bins = Bins.Count(10),
                range: Option[(Double, Double)] = None): DataFrame = {
    val clean = cleaned(df, colName)
    bins match {
      case Bins.Edges(es) =>
        validateEdges(es)
        histogramWithEdges(clean, es.toVector)
      case Bins.Count(n) =>
        val (lo, hi) = range.getOrElse(minMaxOf(clean))
        require(lo <= hi, s"invalid range [$lo, $hi]")
        if (lo == hi || n == 1) singleBucket(clean, lo, hi)
        else evenHistogram(clean, lo, hi, n)
    }
  }

  /** One combined min/max job (SURVEY.md §3 design target: the reference ran
    * 2 collect jobs per series; we run 1 total). */
  private[dist] def minMaxOf(clean: DataFrame): (Double, Double) = {
    val r = clean.agg(min("x"), max("x")).head()
    if (r.isNullAt(0))
      throw new IllegalArgumentException("can not generate buckets from empty RDD") // rdd.py:2290-2292
    (r.getDouble(0), r.getDouble(1))
  }

  private def evenHistogram(clean: DataFrame, lo: Double, hi: Double, n: Int): DataFrame = {
    val inRange = clean.where(col("x") >= lit(lo) && col("x") <= lit(hi))
    val counts = inRange
      .groupBy(binId(col("x"), equalWidthEdges(lo, hi, n)).as("bin_id"))
      .agg(count(lit(1)).as("cnt"))
    val (binLo, binHi) = evenEdgeCols(col("bin_id"), lo, hi, n)
    spine(clean, n).join(counts, Seq("bin_id"), "left")
      .na.fill(0L, Seq("cnt"))
      .select(col("bin_id"), binLo, binHi, col("cnt"))
      .orderBy("bin_id")
  }

  private def histogramWithEdges(clean: DataFrame, es: Vector[Double]): DataFrame = {
    val n = es.size - 1
    val inRange = clean.where(col("x") >= lit(es.head) && col("x") <= lit(es.last))
    val counts = inRange
      .groupBy(binId(col("x"), es).as("bin_id"))
      .agg(count(lit(1)).as("cnt"))
    val loArr = typedLit(es.dropRight(1))
    val hiArr = typedLit(es.drop(1))
    spine(clean, n).join(counts, Seq("bin_id"), "left")
      .na.fill(0L, Seq("cnt"))
      .select(col("bin_id"),
        element_at(loArr, col("bin_id") + 1).as("bin_lo"),
        element_at(hiArr, col("bin_id") + 1).as("bin_hi"),
        col("cnt"))
      .orderBy("bin_id")
  }

  /** Degenerate single bucket [lo, hi] counting all in-range values
    * (rdd.py:2295-2296). */
  private def singleBucket(clean: DataFrame, lo: Double, hi: Double): DataFrame =
    clean.where(col("x") >= lit(lo) && col("x") <= lit(hi))
      .agg(count(lit(1)).as("cnt"))
      .select(lit(0).cast("int").as("bin_id"), lit(lo).as("bin_lo"), lit(hi).as("bin_hi"), col("cnt"))

  /** Single-pass histogram: identical output contract to [[histogram]], but
    * counting runs as one [[graft.functions.HistogramAgg]] typed aggregate —
    * a dense per-partition count vector merged element-wise (the
    * rdd.py:2347-2366 distributed shape inside Tungsten). No per-row shuffle,
    * no spine join: the shuffle carries ONE n_bins-long vector per partition,
    * the minimum possible traffic. Data-derived ranges still take the
    * min/max pre-pass (unavoidable; SURVEY.md §4). */
  def histogramOnePass(df: DataFrame, colName: String, bins: Bins = Bins.Count(10),
                       range: Option[(Double, Double)] = None): DataFrame = {
    val clean = cleaned(df, colName)
    val es: Vector[Double] = bins match {
      case Bins.Edges(e) => validateEdges(e); e.toVector
      case Bins.Count(n) =>
        val (lo, hi) = range.getOrElse(minMaxOf(clean))
        require(lo <= hi, s"invalid range [$lo, $hi]")
        equalWidthEdges(lo, hi, n)
    }
    if (es.head == es.last) return singleBucket(clean, es.head, es.last) // min==max degenerate
    // range predicate stays in the plan for parquet pushdown; the aggregate
    // re-checks (and drops) out-of-range values regardless
    val inRange = clean.where(col("x") >= lit(es.head) && col("x") <= lit(es.last))
    inRange.agg(graft.functions.HistogramAgg.hist_counts(col("x"), es).as("cnts"))
      .select(posexplode(col("cnts")).as(Seq("bin_id", "cnt")))
      .select(col("bin_id").cast("int").as("bin_id"),
        element_at(typedLit(es.dropRight(1)), col("bin_id") + 1).as("bin_lo"),
        element_at(typedLit(es.drop(1)), col("bin_id") + 1).as("bin_hi"),
        col("cnt"))
      .orderBy("bin_id")
  }

  /** Multi-series histogram with a SHARED range across all series — the
    * reference's only cross-series interaction (global min of mins / max of
    * maxes unless `range=` given; pyspark_dist_explore.py ~L100-118).
    *
    * One tagged union → one min/max agg job → one counting job with
    * `pivot(series)` (explicit value list for deterministic column order).
    * Output: (bin_id, bin_lo, bin_hi, <label>_cnt ...), dense, sorted.
    */
  def histogramMany(series: Seq[(DataFrame, String, String)], n: Int = 10,
                    range: Option[(Double, Double)] = None): DataFrame =
    histogramManyBins(series, Bins.Count(n), range)

  /** [[histogramMany]] generalized to any [[Bins]] spec (explicit edges skip
    * the min/max job entirely, mirroring the reference's `bins=list`). */
  def histogramManyBins(series: Seq[(DataFrame, String, String)], bins: Bins,
                        range: Option[(Double, Double)] = None): DataFrame = {
    require(series.nonEmpty, "at least one series required")
    val labels = dedupeLabels(series.map(_._3))
    val tagged = series.zip(labels).map { case ((df, c, _), lbl) =>
      df.select(col(c).cast("double").as("x"), lit(lbl).as("series"))
    }.reduce(_ unionByName _)
    val clean = tagged.where(col("x").isNotNull && !isnan(col("x")))
    val es: Vector[Double] = bins match {
      case Bins.Edges(e) => validateEdges(e); e.toVector
      case Bins.Count(nn) =>
        val (lo, hi) = range.getOrElse(minMaxOf(clean))
        require(lo <= hi, s"invalid range [$lo, $hi]")
        equalWidthEdges(lo, hi, nn)
    }
    val (lo, hi) = (es.head, es.last)
    val nb = es.size - 1
    val inRange = clean.where(col("x") >= lit(lo) && col("x") <= lit(hi))
    val counts = inRange
      .groupBy(binId(col("x"), es).as("bin_id"))
      .pivot("series", labels)
      .count()
    val cntCols = labels.map(l => coalesce(col(s"`$l`"), lit(0L)).as(s"${l}_cnt"))
    // user-supplied edges are echoed back verbatim (element_at literals);
    // derived edges keep the oracle-parity even-width arithmetic
    val (binLo, binHi) = bins match {
      case Bins.Edges(_) =>
        (element_at(typedLit(es.dropRight(1)), col("bin_id") + 1).as("bin_lo"),
          element_at(typedLit(es.drop(1)), col("bin_id") + 1).as("bin_hi"))
      case _ => evenEdgeCols(col("bin_id"), lo, hi, nb)
    }
    spine(clean, nb).join(counts, Seq("bin_id"), "left")
      .select(Seq(col("bin_id"), binLo, binHi) ++ cntCols: _*)
      .orderBy("bin_id")
  }

  /** Multi-column histogram over ONE frame in ONE scan: the reference's
    * `add_data(multi_col_df)` splits into per-column series with a SHARED
    * range; here all N columns ride a single pass — one combined min/max agg
    * (shared lo/hi = min of mins / max of maxes), then one aggregate
    * producing a dense [[graft.functions.HistogramAgg]] count vector per
    * column. Two jobs total for any N (SURVEY.md §3 target), N× fewer scans
    * than the union formulation. Output: (bin_id, bin_lo, bin_hi,
    * <col>_cnt ...), dense, sorted. */
  def histogramColumns(df: DataFrame, cols: Seq[String], n: Int = 10,
                       range: Option[(Double, Double)] = None): DataFrame = {
    require(cols.nonEmpty, "at least one column required")
    val xs = cols.map(c => col(c).cast("double"))
    val (lo, hi) = range.getOrElse {
      // NaN excluded from range resolution (rdd.py:2275-2282); min/max skip
      // nulls, and NaN would otherwise poison max (NaN sorts greatest).
      // least/greatest need >= 2 args — pass through for a single column.
      val nanFree = xs.map(x => when(!isnan(x), x))
      val mins = nanFree.map(min)
      val maxs = nanFree.map(max)
      val loC = if (mins.size == 1) mins.head else least(mins: _*)
      val hiC = if (maxs.size == 1) maxs.head else greatest(maxs: _*)
      val r = df.agg(loC.as("lo"), hiC.as("hi")).head()
      if (r.isNullAt(0))
        throw new IllegalArgumentException("can not generate buckets from empty RDD")
      (r.getDouble(0), r.getDouble(1))
    }
    require(lo <= hi, s"invalid range [$lo, $hi]")
    val es = equalWidthEdges(lo, hi, n)
    val nb = es.size - 1
    if (lo == hi) { // degenerate: one closed bucket [v, v] per column
      val aggs = cols.zip(xs).map { case (c, x) =>
        count(when(!isnan(x) && x === lit(lo), 1)).as(s"${c}_cnt")
      }
      return df.agg(aggs.head, aggs.tail: _*)
        .select(Seq(lit(0).cast("int").as("bin_id"), lit(lo).as("bin_lo"), lit(hi).as("bin_hi")) ++
          cols.map(c => col(s"${c}_cnt")): _*)
    }
    val aggs = cols.zip(xs).map { case (c, x) =>
      // null/NaN/out-of-range drops happen inside the aggregate (rdd.py:2350)
      graft.functions.HistogramAgg.hist_counts(x, es).as(s"__cnts_$c")
    }
    val (binLo, binHi) = evenEdgeCols(col("bin_id"), lo, hi, nb)
    val cntCols = cols.map(c => col("col").getField(s"__cnts_$c").as(s"${c}_cnt"))
    df.agg(aggs.head, aggs.tail: _*)
      .select(posexplode(arrays_zip(cols.map(c => col(s"__cnts_$c")): _*)))
      .select(Seq(col("pos").cast("int").as("bin_id")) ++ cntCols: _*)
      .select(Seq(col("bin_id"), binLo, binHi) ++ cols.map(c => col(s"${c}_cnt")): _*)
      .orderBy("bin_id")
  }

  /** Duplicate series names get " (k)" suffixes, mirroring the reference's
    * add_column de-dupe (pyspark_dist_explore.py ~L80-90). */
  private[dist] def dedupeLabels(names: Seq[String]): Seq[String] = {
    // re-check each candidate against everything issued so far: a naive
    // per-name counter can emit a suffix colliding with a USER-SUPPLIED
    // label (e.g. "a", "a (1)", "a" -> two "a (1)" pivot columns)
    val seen = scala.collection.mutable.Set.empty[String]
    names.map { nm =>
      var cand = nm
      var k = 1
      while (seen(cand)) { cand = s"$nm ($k)"; k += 1 }
      seen += cand
      cand
    }
  }

  /** Grouped histogram: shared global range over the whole column, counts per
    * (group, bin). Dense over distinct-groups × bins.
    *
    * Counting is one [[graft.functions.HistogramAgg]] vector per group — the
    * shuffle carries n_groups fixed-width count vectors instead of
    * n_groups × n_bins rows, and dense bins come free from the buffer (a
    * group with zero in-range rows is back-filled with a literal zero
    * vector), so no bins-spine cross join is needed. */
  def histogramByGroup(df: DataFrame, valueCol: String, groupCol: String, n: Int = 10,
                       range: Option[(Double, Double)] = None): DataFrame = {
    val clean = df.select(col(groupCol).as("grp"), col(valueCol).cast("double").as("x"))
      .where(col("x").isNotNull && !isnan(col("x")))
    val (lo, hi) = range.getOrElse(minMaxOf(clean))
    val es = equalWidthEdges(lo, hi, n)
    val nb = es.size - 1
    if (lo == hi) { // degenerate: fall back to the row formulation
      val counts = clean.where(col("x") === lit(lo))
        .groupBy(col("grp")).agg(count(lit(1)).as("cnt"))
        .select(col("grp"), lit(0).cast("int").as("bin_id"), col("cnt"))
      return df.select(col(groupCol).as("grp")).where(col("grp").isNotNull).distinct()
        .join(counts, Seq("grp"), "left").na.fill(0L, Seq("cnt"))
        .select(col("grp").as(groupCol), coalesce(col("bin_id"), lit(0)).as("bin_id"), col("cnt"))
        .orderBy(groupCol, "bin_id")
    }
    val counts = clean.where(col("x") >= lit(lo) && col("x") <= lit(hi))
      .groupBy(col("grp"))
      .agg(graft.functions.HistogramAgg.hist_counts(col("x"), es).as("cnts"))
    val grpSpine = df.select(col(groupCol).as("grp")).where(col("grp").isNotNull).distinct()
    grpSpine.join(counts, Seq("grp"), "left")
      .withColumn("cnts", coalesce(col("cnts"), typedLit(Vector.fill(nb)(0L))))
      .select(col("grp"), posexplode(col("cnts")).as(Seq("bin_id", "cnt")))
      .select(col("grp").as(groupCol), col("bin_id").cast("int").as("bin_id"), col("cnt"))
      .orderBy(groupCol, "bin_id")
  }

  /** `to_pandas(kind='hist')` label: `"%.2f - %.2f"` over the bin edges
    * (pyspark_dist_explore.py ~L210). Input: any histogram result. */
  def withLabels(hist: DataFrame): DataFrame =
    hist.withColumn("bin_label", format_string("%.2f - %.2f", col("bin_lo"), col("bin_hi")))

  /** `to_pandas(kind='density')` points: bin centers = (e_i + e_{i+1}) / 2
    * (pyspark_dist_explore.py ~L200-230). */
  def densityPoints(hist: DataFrame): DataFrame =
    hist.select(col("bin_id"), ((col("bin_lo") + col("bin_hi")) / 2).as("bin_center"), col("cnt"))
      .orderBy("bin_id")

  /** Equal-frequency (equi-depth) histogram: bin edges at the exact
    * interpolated quantiles 0, 1/n, …, 1 (SQL `percentile` — the same
    * linear-interpolation contract as [[Stats.quantiles]] and DuckDB's
    * `quantile_cont`, so the operator stays oracle-checkable), then the
    * standard explicit-edges binning. Each bin holds ≈ rows/n — the right
    * histogram for heavy-tailed columns where equal-width bins put
    * everything in one bucket.
    *
    * Two jobs, like the data-derived-range path: one quantile aggregate
    * (n+1 doubles to the driver) and one counting pass. The exact
    * percentile buffers the column per partition — at 100 TB compute edges
    * with `approx_percentile` instead (sketch tier, same downstream
    * binning); this is the oracle-checkable verifier tier. Fails fast if
    * edges collide (heavy mass at a single value) — lower `n` there. */
  def histogramEquiDepth(df: DataFrame, colName: String, n: Int = 10): DataFrame = {
    require(n >= 1, "bins must be >= 1")
    val ps = (0 to n).map(_.toDouble / n)
    // starvation-gated spread (r15, guide §2.5): the exact percentile
    // buffers every row map-side; a one-row-group fixture is ONE scan split,
    // so the buffer build ran on 1 of N cores. Multiset-exact — edges are
    // identical under any partitioning; gate off on multi-split inputs.
    val row = graft.functions.Rebalance.spreadGated(cleaned(df, colName), 0)
      .agg(percentile(col("x"), array(ps.map(lit): _*)).as("es")).head()
    if (row.isNullAt(0))
      throw new IllegalArgumentException("can not generate buckets from empty RDD")
    val edges = row.getSeq[Double](0).toVector
    require(edges.distinct.size == edges.size,
      s"equi-depth edges collide (mass concentrated at one value): $edges — reduce n")
    histogram(df, colName, Bins.Edges(edges))
  }

  /** The 100 TB tier of [[histogramEquiDepth]]: edges from the
    * Greenwald-Khanna sketch (`approx_percentile` — single pass, mergeable
    * partials, bounded memory) instead of the exact sort-based percentile.
    * Bin populations are approximately equal within the sketch's rank error
    * (n_rows/accuracy); no cross-engine oracle (sketch-specific edges) —
    * property-tested against the exact tier instead. */
  def histogramEquiDepthApprox(df: DataFrame, colName: String, n: Int = 10,
                               accuracy: Int = 10000): DataFrame = {
    require(n >= 1, "bins must be >= 1")
    val ps = (0 to n).map(_.toDouble / n)
    val row = cleaned(df, colName)
      .agg(approx_percentile(col("x"), array(ps.map(lit): _*), lit(accuracy)).as("es")).head()
    if (row.isNullAt(0))
      throw new IllegalArgumentException("can not generate buckets from empty RDD")
    val edges = row.getSeq[Double](0).toVector
    require(edges.distinct.size == edges.size,
      s"equi-depth edges collide (mass concentrated at one value): $edges — reduce n")
    histogram(df, colName, Bins.Edges(edges))
  }

  /** Cumulative distribution over a histogram: running count and CDF
    * fraction per bin. Input is any `(bin_id, …, cnt)` histogram result —
    * an ALREADY-AGGREGATED n_bins-row frame — so the single-partition window
    * is O(n_bins) driver-adjacent work, not a data-scale sort (the
    * `partitionBy(lit(0))` keeps Spark from logging the no-partition
    * warning). The fraction is an exact-integer running sum over an exact
    * total with one double division per bin: bit-deterministic. */
  def cdf(hist: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val run = Window.partitionBy(lit(0)).orderBy("bin_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(lit(0))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    hist.withColumn("cum_cnt", sum(col("cnt")).over(run))
      .withColumn("cdf", col("cum_cnt").cast("double") / sum(col("cnt")).over(all).cast("double"))
      .orderBy("bin_id")
  }

  /** Log-spaced histogram: n geometric bins over [lo, hi] — the right shape
    * for heavy-tailed positive columns (latencies, prices, document sizes)
    * where equal-width bins dump everything into one bucket. Edge i is
    * `exp(ln lo + i·(ln hi − ln lo)/n)` with the first/last edges pinned to
    * the exact lo/hi (absorbing float error, as the even-width path does);
    * binning is the standard explicit-edges bisect. Non-positive values are
    * dropped with nulls/NaNs (log scale is undefined there — documented
    * divergence from the linear drop rule). Same two-job shape as
    * [[histogram]]. */
  def histogramLog(df: DataFrame, colName: String, n: Int = 10,
                   range: Option[(Double, Double)] = None): DataFrame = {
    require(n >= 1, "bins must be >= 1")
    val clean = cleaned(df, colName).where(col("x") > 0)
    val (lo, hi) = range.getOrElse(minMaxOf(clean))
    require(lo > 0 && lo <= hi, s"log bins need 0 < lo <= hi, got [$lo, $hi]")
    if (lo == hi || n == 1) return singleBucket(clean, lo, hi)
    val (llo, lhi) = (math.log(lo), math.log(hi))
    val edges = (0 to n).map {
      case 0 => lo
      case `n` => hi
      case i => math.exp(llo + i * (lhi - llo) / n)
    }.toVector
    validateEdges(edges)
    histogramWithEdges(clean, edges)
  }

  /** 2-D histogram (heatmap grid): joint counts over an `nx × ny` equal-width
    * grid spanning both columns' data ranges (or explicit ranges). Rows where
    * EITHER value is null/NaN/out-of-range are dropped — the 2-D analogue of
    * the rdd.py:2350-2351 drop rule, applied per axis; each axis keeps the
    * closed-last-bucket clamp.
    *
    * Same two-job shape as the 1-D path: one combined min/max agg for both
    * axes, one counting pass (`groupBy(bin_x, bin_y)` hash-agg — shuffle of
    * at most nx × ny rows), then a dense-grid spine join (tiny broadcast).
    * Degenerate axes (min == max) collapse to a single closed bucket on that
    * axis. Output: (bin_x, bin_y, x_lo, x_hi, y_lo, y_hi, cnt), dense,
    * sorted by (bin_x, bin_y). */
  def histogram2d(df: DataFrame, colX: String, colY: String, nx: Int = 10, ny: Int = 10,
                  rangeX: Option[(Double, Double)] = None,
                  rangeY: Option[(Double, Double)] = None): DataFrame = {
    require(nx >= 1 && ny >= 1, "bins must be >= 1")
    val clean = df.select(col(colX).cast("double").as("x"), col(colY).cast("double").as("y"))
      .where(col("x").isNotNull && !isnan(col("x")) && col("y").isNotNull && !isnan(col("y")))
    val (xlo, xhi, ylo, yhi) = (rangeX, rangeY) match {
      case (Some((a, b)), Some((c, dd))) => (a, b, c, dd)
      case _ =>
        val r = clean.agg(min("x"), max("x"), min("y"), max("y")).head()
        if (r.isNullAt(0))
          throw new IllegalArgumentException("can not generate buckets from empty RDD")
        (rangeX.map(_._1).getOrElse(r.getDouble(0)), rangeX.map(_._2).getOrElse(r.getDouble(1)),
          rangeY.map(_._1).getOrElse(r.getDouble(2)), rangeY.map(_._2).getOrElse(r.getDouble(3)))
    }
    require(xlo <= xhi && ylo <= yhi, s"invalid ranges [$xlo,$xhi] [$ylo,$yhi]")
    val (nxe, nye) = (if (xlo == xhi) 1 else nx, if (ylo == yhi) 1 else ny)
    val xes = equalWidthEdges(xlo, xhi, nxe)
    val yes = equalWidthEdges(ylo, yhi, nye)
    val inRange = clean.where(col("x") >= lit(xlo) && col("x") <= lit(xhi) &&
      col("y") >= lit(ylo) && col("y") <= lit(yhi))
    val counts = inRange
      .groupBy(binId(col("x"), xes).as("bin_x"), binId(col("y"), yes).as("bin_y"))
      .agg(count(lit(1)).as("cnt"))
    val grid = df.sparkSession.range(nxe).select(col("id").cast("int").as("bin_x"))
      .crossJoin(df.sparkSession.range(nye).select(col("id").cast("int").as("bin_y")))
    // equalWidthEdges computes exactly i*step+lo, so echoing the driver-side
    // vectors via element_at literals is bit-identical to the oracle formula
    def edgeCols(b: Column, es: Vector[Double], loN: String, hiN: String) = Seq(
      element_at(typedLit(es.dropRight(1)), b + 1).as(loN),
      element_at(typedLit(es.drop(1)), b + 1).as(hiN))
    grid.join(counts, Seq("bin_x", "bin_y"), "left")
      .na.fill(0L, Seq("cnt"))
      .select(Seq(col("bin_x"), col("bin_y")) ++
        edgeCols(col("bin_x"), xes, "x_lo", "x_hi") ++
        edgeCols(col("bin_y"), yes, "y_lo", "y_hi") ++ Seq(col("cnt")): _*)
      .orderBy("bin_x", "bin_y")
  }

  /** Weighted histogram: per bin, the row count AND the exact sum of a weight
    * column (revenue per price band, bytes per latency bucket, token mass per
    * doc-length bin, …). The value column follows the full §2.3 drop rules;
    * rows with a null/NaN weight still count in `cnt` but contribute nothing
    * to `wsum` (documented asymmetry — the row exists, its weight doesn't).
    *
    * The weight sum aggregates as `decimal(28,6)` casts so it is
    * order-independent under any partitioning (double summation would drift
    * with the shuffle schedule), surfaced as a double. Same two-job,
    * n_bins-row-shuffle shape as [[histogram]]. Output: (bin_id, bin_lo,
    * bin_hi, cnt, wsum), dense, sorted. */
  def histogramWeighted(df: DataFrame, colName: String, weightCol: String,
                        bins: Bins = Bins.Count(10),
                        range: Option[(Double, Double)] = None): DataFrame = {
    val clean = df.select(col(colName).cast("double").as("x"),
        col(weightCol).cast("double").as("w"))
      .where(col("x").isNotNull && !isnan(col("x")))
    val es: Vector[Double] = bins match {
      case Bins.Edges(e) => validateEdges(e); e.toVector
      case Bins.Count(n) =>
        val (lo, hi) = range.getOrElse(minMaxOf(clean))
        require(lo <= hi, s"invalid range [$lo, $hi]")
        if (lo == hi || n == 1) Vector(lo, hi) else equalWidthEdges(lo, hi, n)
    }
    val n = es.size - 1
    val wsum = sum(when(!isnan(col("w")), col("w")).cast("decimal(28,6)"))
      .cast("double").as("wsum")
    val inRange = clean.where(col("x") >= lit(es.head) && col("x") <= lit(es.last))
    val counts = inRange
      .groupBy(binId(col("x"), es).as("bin_id"))
      .agg(count(lit(1)).as("cnt"), wsum)
    spine(clean, n).join(counts, Seq("bin_id"), "left")
      .na.fill(0L, Seq("cnt")).na.fill(0.0, Seq("wsum"))
      .select(col("bin_id"),
        element_at(typedLit(es.dropRight(1)), col("bin_id") + 1).as("bin_lo"),
        element_at(typedLit(es.drop(1)), col("bin_id") + 1).as("bin_hi"),
        col("cnt"), col("wsum"))
      .orderBy("bin_id")
  }

  /** One-job min/max over several columns of one frame (combined agg) —
    * the reference ran 2 collect jobs PER series (SURVEY.md §3 step 2). */
  def minMax(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"${c}_min"),
      max(col(c).cast("double")).as(s"${c}_max")))
    df.agg(aggs.head, aggs.tail: _*)
  }
}
