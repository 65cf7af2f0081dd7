package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge-list DataFrames.
  *
  * Scale design: every iteration is ONE edge-keyed join plus one node-keyed
  * aggregate — the canonical distributed PageRank shape. Nothing ever
  * collects to the driver; per-iteration lineage is truncated with
  * `localCheckpoint` (same posture as [[Dedup.connectedComponents]]) so a
  * 10-iteration plan doesn't compound into a 10-deep shuffle DAG replay on
  * failure. All rank arithmetic runs in DECIMAL(38,18): decimal sums are
  * exact under any partitioning, so ranks are bit-deterministic — float
  * PageRank would drift with shuffle order and be untestable.
  */
object Graphs {

  /** Damped PageRank over a directed edge list.
    *
    * `rank_{t+1}(v) = (1-d) + d * Σ_{u→v} rank_t(u) * w(u→v) / W_out(u)`
    * (the per-node formulation, fixed-point sum = |V| on dangling-free
    * graphs — asserted by the conservation property test).
    *
    * Weights: optional (`weightCol`); non-positive-weight edges carry no
    * vote and are dropped up front (a cosine-weighted kNN graph can carry
    * negative similarities; a negative vote has no PageRank semantics).
    * Dangling nodes (no surviving out-edge) simply contribute nothing —
    * the simplified variant; on kNN graphs every node has exactly k
    * out-edges so no mass is lost. Curation use: rank over a near-dup /
    * similarity graph finds the most central (template-like) documents —
    * high-rank nodes are what boilerplate pruning inspects first. */
  def pageRank(edges: DataFrame, iters: Int = 10, damping: Double = 0.85,
               srcCol: String = "src", dstCol: String = "dst",
               weightCol: Option[String] = None): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(damping > 0 && damping < 1, "damping must be in (0,1)")
    val dec = "decimal(38,18)"
    val w = weightCol.map(c => col(c).cast(dec)).getOrElse(lit(1).cast(dec))
    val e0 = edges.select(col(srcCol).as("esrc"), col(dstCol).as("edst"), w.as("w"))
      .where(col("w") > 0)
    // per-edge vote share, precomputed once: w / W_out(src)
    val outW = e0.groupBy("esrc").agg(sum(col("w")).as("ow"))
    val e = e0.join(outW, "esrc")
      .select(col("esrc"), col("edst"), (col("w") / col("ow")).cast(dec).as("share"))
      .localCheckpoint()
    val nodes = e.select(col("esrc").as("id"))
      .union(e.select(col("edst").as("id"))).distinct().localCheckpoint()
    var ranks = nodes.select(col("id"), lit(1).cast(dec).as("rank"))
    for (i <- 1 to iters) {
      val contribs = e.join(ranks, e("esrc") === ranks("id"))
        .select(col("edst").as("id"), (col("rank") * col("share")).cast(dec).as("c"))
      ranks = nodes.join(contribs.groupBy("id").agg(sum(col("c")).as("s")), Seq("id"), "left")
        .select(col("id"),
          (lit(1 - damping).cast(dec) +
            lit(damping).cast(dec) * coalesce(col("s"), lit(0).cast(dec))).cast(dec).as("rank"))
      // truncate lineage every few rounds; final iteration stays lazy so
      // callers keep a declarative plan to compose further
      if (i % 3 == 0 && i < iters) ranks = ranks.localCheckpoint()
    }
    ranks.select(col("id"), round(col("rank").cast("double"), 9).as("rank"))
      .orderBy("id")
  }
}
