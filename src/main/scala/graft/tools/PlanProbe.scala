package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print the optimized plan of a declared query and count how many
  * times an expensive expression pattern appears in it (the "expect exactly
  * 1" audit from the plan-gotchas checklist). Not part of the library API.
  *
  * Usage: runMain graft.tools.PlanProbe <sfDir> <queryName> [pattern]
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val pattern = if (args.length > 2) args(2) else "regexp"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .appName("graft-planprobe").getOrCreate()
    graft.dist.Binning.tuneSession(spark)
    try {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.optimizedPlan.toString
      println(s"=== optimized plan for $name ===")
      println(plan)
      println(s"=== occurrences of '$pattern': ${pattern.r.findAllIn(plan).length}")
      for (pass <- 1 to 2) {
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        println(f"=== exec time (pass $pass): ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    } finally spark.stop()
  }
}
