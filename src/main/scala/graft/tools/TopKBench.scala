package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object TopKBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // 20M rows, 16 groups — the "top N per group over a big fact" shape
    val df = spark.range(20000000L).select(
      (col("id") % 16).cast("string").as("g"),
      (col("id") * 2654435761L % 1000000L).cast("double").as("q"),
      col("id"))
    def time(run: => Unit): Double = {
      val t0 = System.nanoTime(); run; (System.nanoTime() - t0) / 1e9
    }
    val w = org.apache.spark.sql.expressions.Window.partitionBy("g")
      .orderBy(col("q").desc, col("id").asc)
    def winDf = df.withColumn("rnk", row_number().over(w)).where(col("rnk") <= 5)
    def aggDf = df.groupBy("g")
      .agg(graft.functions.TopKAgg.top_k_by(col("q"), col("id"), 5).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "p")))
    // warm both paths once, then min-of-2
    winDf.write.format("noop").mode("overwrite").save()
    aggDf.write.format("noop").mode("overwrite").save()
    val tw = (1 to 2).map(_ => time(winDf.write.format("noop").mode("overwrite").save())).min
    val ta = (1 to 2).map(_ => time(aggDf.write.format("noop").mode("overwrite").save())).min
    println(f"TOPKBENCH window=$tw%.2f s  agg=$ta%.2f s  speedup=${tw / ta}%.1fx")
    spark.stop()
  }
}
