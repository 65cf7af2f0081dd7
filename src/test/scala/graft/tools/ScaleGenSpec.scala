package graft.tools

import graft.SparkSpec
import graft.llm.Slow
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Locks the property the whole scale-stress story rests on: ScaleGen's
  * key-consistent replication makes join fan-outs and preserved-key
  * aggregates scale EXACTLY linearly — so a sweep ratio measures the
  * engine, never a generator artifact. */
class ScaleGenSpec extends SparkSpec {
  private val src = "/root/testdata/sf0.001"
  private def present = new java.io.File(s"$src/lineitem.parquet").exists()
  private lazy val out = {
    val dir = java.nio.file.Files.createTempDirectory("scalegen_spec").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ScaleGen.run(spark, src, dir, reps = 2)
    dir
  }
  private def t(dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  test("star-join fan-out and preserved-key aggregates scale exactly 2x", Slow) {
    assume(present)
    def revenue(dir: String): Map[String, java.math.BigDecimal] =
      t(dir, "lineitem").join(t(dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(dir, "nation"), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,6)")).as("rev"), count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) ->
          r.getDecimal(1).add(new java.math.BigDecimal(r.getLong(2)))).toMap
    val base = revenue(src)
    val scaled = revenue(out)
    assert(scaled.keySet == base.keySet) // dims fixed, every nation present
    base.foreach { case (nat, v) =>
      assert(scaled(nat).compareTo(v.add(v)) == 0,
        s"$nat: ${scaled(nat)} != 2 * $v")
    }
  }

  test("replicas are near-dups, not exact dups; ids stay unique", Slow) {
    assume(present)
    def distinctTexts(dir: String): Long =
      t(dir, "documents").select("text").distinct().count()
    assert(distinctTexts(out) == 2 * distinctTexts(src))
    val emb = t(out, "embeddings")
    assert(emb.select("vec_id").distinct().count() == emb.count())
    assert(emb.count() == 2 * t(src, "embeddings").count())
  }
}
