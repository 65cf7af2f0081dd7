package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.Similarity

/** Occupancy histogram of the SRP-LSH (table, bucket) cells the kNN-graph /
  * pagerank tiers join on — the direct measurement behind any Σ|bucket|²
  * claim. Prints total cells, occupancy quantiles, the top cells, and the
  * implied candidate-pair volume Σ|b|², so a "bucket skew made pair work
  * quadratic" diagnosis is a number, not a guess.
  *
  * Usage: `runMain graft.tools.LshBucketProbe [sfDir] [nTables]`
  * (nBits = Similarity.autoBits(n), matching the declared queries). */
object LshBucketProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val nTables = args.lift(1).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.sources.Readers.readEmbeddings(spark, sfDir)
    val n = emb.count()
    val nBits = Similarity.autoBits(n)
    // build the cells via the SAME bucketedTables the production tiers join
    // on (per-table seed derivation included) — a probe-local hyperplane
    // set (an earlier 42L + t here vs seed + t*1000003L in production) is
    // statistically equivalent but measures a DIFFERENT bucket population,
    // and this tool exists to make skew claims exact
    val base = emb.select(col("vec_id").as("id"), col("embedding").as("v"),
      lit(1.0).as("nrm"))
    val cells = Similarity.bucketedTables(base, nBits, 64, 42L, nTables)
      .groupBy("tbl", "bkt").agg(count(lit(1)).as("m"))
      .select("m").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted
    val pairSum = cells.map(m => m * m).sum
    def q(p: Double) = cells((p * (cells.length - 1)).toInt)
    println(s"[lshprobe] n=$n nBits=$nBits nTables=$nTables cells=${cells.length}")
    println(s"[lshprobe] occupancy p50=${q(0.5)} p90=${q(0.9)} p99=${q(0.99)} " +
      s"max=${cells.last} top10=${cells.takeRight(10).mkString(",")}")
    println(s"[lshprobe] sum_m2=$pairSum  (candidate pairs per probe per table)")
    spark.stop()
  }
}
