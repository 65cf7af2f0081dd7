package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print the PHYSICAL (executedPlan) string of a declared query
  * WITHOUT executing it — for auditing join strategy / exchange choices on
  * plans too expensive to run at the probe's scale. Note: AQE re-plans at
  * runtime, so this shows the initial physical plan only. Not part of the
  * library API.
  *
  * Usage: runMain graft.tools.PhysPlanProbe <sfDir> <queryName> [pattern]
  */
object PhysPlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val pattern = if (args.length > 2) args(2) else "BroadcastHashJoin"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .appName("graft-physplanprobe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.dist.Binning.tuneSession(spark)
    try {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      println(s"=== initial physical plan for $name ===")
      println(plan)
      println(s"=== occurrences of '$pattern': ${pattern.r.findAllIn(plan).length}")
    } finally spark.stop()
  }
}
