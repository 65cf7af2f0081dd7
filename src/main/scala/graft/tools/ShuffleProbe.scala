package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev tool: run declared queries and report their total shuffle WRITE
  * volume (bytes + records, summed over all tasks via a SparkListener).
  * Wall clock on a 32-thread laptop can hide a corpus-sized exchange that
  * dominates at 1000 executors; shuffle volume is the portable signal a
  * "sketch tier beats exact tier at scale" claim actually rests on.
  * Not part of the library API.
  *
  * Usage: runMain graft.tools.ShuffleProbe <sfDir> <queryName> [more...]
  */
object ShuffleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .appName("graft-shuffleprobe").getOrCreate()
    graft.dist.Binning.tuneSession(spark)
    try {
      for (name <- args.drop(1)) {
        var bytes = 0L; var records = 0L
        val listener = new SparkListener {
          override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
            val m = e.taskMetrics
            if (m != null) {
              bytes += m.shuffleWriteMetrics.bytesWritten
              records += m.shuffleWriteMetrics.recordsWritten
            }
          }
        }
        spark.sparkContext.addSparkListener(listener)
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(2000) // let the listener bus drain task-end events
        spark.sparkContext.removeSparkListener(listener)
        println(f"[shuffleprobe] $name%-34s shuffle_bytes=$bytes%12d shuffle_records=$records%10d wall=$dt%6.2f s")
      }
    } finally spark.stop()
  }
}
