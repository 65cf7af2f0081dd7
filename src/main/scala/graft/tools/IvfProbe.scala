package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: phase-level wall-clock breakdown of the IVF ANN path —
  * separates the Lloyd training cost from the assignment scan and the
  * probe-join scoring so a regression names its phase instead of hiding in
  * the end-to-end number. Not part of the library API.
  *
  * Usage: runMain graft.tools.IvfProbe <sfDir>
  */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .appName("graft-ivfprobe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.dist.Binning.tuneSession(spark)
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ivfprobe] $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    try {
      val emb = graft.sources.Readers.readEmbeddings(spark, sfDir)
      timed("corpus count")(emb.count())
      val cents = timed("trainCentroids(16, 2)")(
        graft.llm.Similarity.trainCentroids(emb, 16, 2))
      timed("assignment scan")(
        graft.llm.Similarity.kMeansAssign(emb, cents)
          .write.mode("overwrite").format("noop").save())
      timed("full ivfAnnTopK")(
        graft.llm.Similarity.ivfAnnTopK(emb, 0L until 10L, k = 5)
          .write.mode("overwrite").format("noop").save())
    } finally spark.stop()
  }
}
