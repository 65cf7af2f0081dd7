package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.Similarity

/** Dev tool (r13 verdict #2, second half): re-check semDedup's Σ|cell|²
  * pair-work claim at the corpus-adaptive C on a real fixture. Replicates
  * the production tier's exact quantizer path — [[Similarity.trainCentroids]]
  * (same default 2 Lloyd rounds) + [[Similarity.kMeansAssign]] (the same
  * literal-centroid argmax semDedup assigns with) — then reports the cell
  * histogram the pair join would pay: Σ m², max m, and the balanced-cells
  * ideal n²/C for comparison. Σ m² IS the pair-dot count of the cid
  * equi-join (each cell contributes m² candidate evaluations before the
  * id_a < id_b filter), so skew shows up directly as Σ m² / ideal.
  *
  * Usage: runMain graft.tools.SemDedupCellProbe <sfDir> [C=0 (auto √(n/2))]
  */
object SemDedupCellProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cArg = args.lift(1).map(_.toInt).getOrElse(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "64"))
      .config("spark.ui.enabled", "false")
      .appName("graft-semdedup-cellprobe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.dist.Binning.tuneSession(spark)
    try {
      val emb = graft.sources.Readers.readEmbeddings(spark, sfDir)
      val n = emb.count()
      val c = if (cArg > 0) cArg
              else math.max(16, math.ceil(math.sqrt(n / 2.0)).toInt)
      val t0 = System.nanoTime()
      val cents = Similarity.trainCentroids(emb, c, iters = 2)
      val tTrain = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val sizes = Similarity.kMeansAssign(emb, cents)
        .groupBy("cid").agg(count(lit(1)).as("m"))
        .agg(count(lit(1)).as("cells"),
          sum(col("m")).as("n"),
          sum(col("m") * col("m")).as("sum_m2"),
          max(col("m")).as("max_m"))
        .collect()(0)
      val tAssign = (System.nanoTime() - t1) / 1e9
      val cells = sizes.getLong(0)
      val total = sizes.getLong(1)
      val sumM2 = sizes.getLong(2)
      val maxM = sizes.getLong(3)
      val ideal = total.toDouble * total / c // balanced cells: C·(n/C)² = n²/C
      val line = f"[cellprobe] sf=$sfDir n=$total C=$c cells_used=$cells " +
        f"sum_m2=$sumM2 ideal_n2_over_C=${ideal}%.3e skew=${sumM2 / ideal}%.2fx " +
        f"max_cell=$maxM train=$tTrain%.1f s assign+hist=$tAssign%.1f s"
      println(line)
      System.out.flush()
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get("target"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"target/semdedup_cellprobe_$c.txt"), line + "\n")
    } finally spark.stop()
  }
}
