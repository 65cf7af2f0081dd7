package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.llm.Similarity

/** Decision instrument for the probe-row-width lever (r11 verdict item
  * #5, SCALE.md §15): would slimming the kNN-LSH probe rows to
  * (src, tbl, bkt) and re-attaching vectors by id AFTER the bucket join
  * reduce total shuffle, or does the id-join's pair-frame exchange cost
  * more than the probe-row savings?
  *
  * The trade is pure arithmetic once two numbers are measured at the
  * operating point, WITHOUT running either join:
  *
  *   - probe-side exchange today:  nProbeRows × wideRow   (vector rides)
  *   - slim variant:               nProbeRows × slimRow
  *                                 + 2 × nCandidatePairs × pairRow
  *     (the deduped (src, dst) pair frame must shuffle through TWO
  *     id-joins — once keyed by src for va, once by dst for vb — before
  *     any exact cosine can rank anything; pairs cannot be k-bounded
  *     before scoring because ranking needs the sims)
  *
  * nCandidatePairs = Σ_cell probeRows(cell)·cappedCand(cell), computable
  * from the two per-cell histograms alone (a bucket-count-sized join, no
  * pair materialization). The lever wins only when mean capped occupancy
  * < (wideRow − slimRow) / (2·pairRow) — i.e. near-empty buckets, the
  * opposite of the autoBits design point.
  *
  * Usage: runMain graft.tools.PairVolumeProbe <sfDir> [nTables=2]
  *          [targetBucket=64] [maxBucket=256] [probeDepth=1]
  * (defaults = the declared knn_graph_lsh full config). */
object PairVolumeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val nTables = args.lift(1).map(_.toInt).getOrElse(2)
    val targetBucket = args.lift(2).map(_.toInt).getOrElse(64)
    val maxBucket = args.lift(3).map(_.toInt).getOrElse(256)
    val probeDepth = args.lift(4).map(_.toInt).getOrElse(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "64"))
      .config("spark.ui.enabled", "false")
      .appName("graft-pairprobe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val emb = graft.sources.Readers.readEmbeddings(spark, sfDir)
      val n = emb.count()
      val nBits = Similarity.autoBits(n, targetBucket)
      val dim = 64
      val base = emb.select(col("vec_id").as("id"), col("embedding").as("v"),
        Similarity.norm(col("embedding")).as("nrm"))
      val e = Similarity.bucketedTables(base, nBits, dim, 42L, nTables)
      // per-cell capped candidate counts (the cand side of the real join)
      val cand = e.groupBy("tbl", "bkt").agg(count(lit(1)).as("m"))
        .withColumn("mc", least(col("m"), lit(maxBucket.toLong)))
      // per-cell probe-row counts (the src side after multiprobe explode)
      val probes = e.select(col("tbl"),
          Similarity.multiprobe(nBits, probeDepth).as("bkt"))
        .groupBy("tbl", "bkt").agg(count(lit(1)).as("p"))
      val joined = probes.join(cand, Seq("tbl", "bkt"))
        .agg(sum(col("p") * col("mc")).as("pairs"),
          sum(col("p")).as("probeRows")).head()
      val pairs = joined.getLong(0)
      val probeRows = joined.getLong(1)
      // row-width model: float vector = 4·dim B + ~20 B row overhead;
      // slim probe row (src, tbl, bkt) ≈ 24 B; slim pair row ≈ 16 B
      val wide = 4L * dim + 20L
      val slim = 24L
      val pairRow = 16L
      val todayB = probeRows * wide
      val slimB = probeRows * slim + 2L * pairs * pairRow
      val f = "%,d"
      println(s"[pairprobe] n=$n nBits=$nBits nTables=$nTables " +
        s"targetBucket=$targetBucket maxBucket=$maxBucket depth=$probeDepth")
      println(s"[pairprobe] probeRows=${f.format(probeRows)} " +
        s"candidatePairs=${f.format(pairs)} " +
        f"meanCappedOcc=${pairs.toDouble / probeRows}%.1f")
      println(f"[pairprobe] probe-side exchange today  = ${todayB / 1e9}%9.2f GB " +
        s"(${f.format(probeRows)} x $wide B)")
      println(f"[pairprobe] slim-probe + 2 id-joins    = ${slimB / 1e9}%9.2f GB " +
        s"(${f.format(probeRows)} x $slim B + 2 x ${f.format(pairs)} x $pairRow B)")
      println(f"[pairprobe] lever ratio (slim/today)   = ${slimB.toDouble / todayB}%9.2f" +
        s"  (<1 means the lever wins; breakeven occupancy = " +
        f"${(wide - slim).toDouble / (2 * pairRow)}%.1f)")
      val line = f"[pairprobe] RESULT sf=$sfDir pairs=$pairs probeRows=$probeRows ratio=${slimB.toDouble / todayB}%.2f%n"
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"target/pairprobe_${nTables}_${targetBucket}_d$probeDepth.txt"),
        line)
    } finally spark.stop()
  }
}
