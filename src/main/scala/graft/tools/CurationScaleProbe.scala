package graft.tools

import org.apache.spark.sql.SparkSession

import graft.llm.Similarity

/** Dev tool: measure the batched greedy curation tiers at an explicit
  * (k, nCells) operating point — the corpus-sized-k design point the
  * batched faces exist for (the declared queries pin the small
  * oracle-comparable config; this instrument measures the scale one).
  *
  * Usage: runMain graft.tools.CurationScaleProbe <sfDir> <kcenter|mmr>
  *          [k=1000] [nCells=64] [shufflePartitions=64]
  */
object CurationScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val op = args(1)
    val k = args.lift(2).map(_.toInt).getOrElse(1000)
    val nCells = args.lift(3).map(_.toInt).getOrElse(64)
    val shuffleParts = args.lift(4).map(_.toInt).getOrElse(64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffleParts)
      .config("spark.ui.enabled", "false")
      .appName("graft-curationprobe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val e = graft.sources.Readers.readEmbeddings(spark, sfDir)
      val t0 = System.nanoTime()
      val df = op match {
        case "kcenter" => Similarity.kCenterSelectBatched(e, k = k, nCells = nCells)
        case "mmr"     => Similarity.mmrSelectBatched(e, k = k, nCells = nCells)
        case other     => sys.error(s"unknown op '$other' (kcenter|mmr)")
      }
      val rows = df.count()
      val dt = (System.nanoTime() - t0) / 1e9
      val line = f"[curationprobe] op=$op sf=$sfDir k=$k nCells=$nCells rows=$rows wall=$dt%8.1f s"
      println(line)
      System.out.flush()
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"target/curationprobe_${op}_${k}_$nCells.txt"),
        line + "\n")
    } finally spark.stop()
  }
}
