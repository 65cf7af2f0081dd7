package graft.functions

import graft.SparkSpec
import graft.llm.TextAnalysis
import org.apache.spark.sql.functions._

/** TopKAgg: the bounded-heap per-group top-k aggregate. The contract is
  * equality with the row_number window formulation under the same
  * (ord desc, id asc) order — including ties, nulls, NaN, and groups
  * smaller than k — plus the plan property the operator exists for: an
  * ObjectHashAggregate with a partial pass, no window sort. */
class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  test("top_k_by returns the k best pairs, ord desc then id asc, best-first") {
    val df = Seq(
      ("a", 1.0, 10L), ("a", 3.0, 11L), ("a", 3.0, 9L), ("a", 2.0, 12L),
      ("b", 5.0, 1L)) // group smaller than k
      .toDF("g", "q", "id")
    val got = df.groupBy("g")
      .agg(TopKAgg.top_k_by(col("q"), col("id"), 3).as("top"))
      .select(col("g"), col("top").cast("array<struct<ord:double,id:bigint>>"))
      .as[(String, Seq[(Double, Long)])].collect().toMap
    assert(got("a") == Seq((3.0, 9L), (3.0, 11L), (2.0, 12L))) // tie: smaller id first
    assert(got("b") == Seq((5.0, 1L))) // short group returns what exists
  }

  test("null and NaN ord rows and null ids are dropped, not ranked") {
    val df = Seq(
      (Some(1.0), Some(1L)), (None, Some(2L)),
      (Some(Double.NaN), Some(3L)), (Some(2.0), None), (Some(0.5), Some(5L)))
      .toDF("q", "id")
    val got = df.agg(TopKAgg.top_k_by(col("q"), col("id"), 10).as("top"))
      .select(explode(col("top")).as("p")).select("p.id")
      .as[Long].collect().toSeq
    assert(got == Seq(1L, 5L))
  }

  test("equals the window formulation on random data under every partitioning") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 500).map { i =>
      (s"g${rnd.nextInt(7)}", math.floor(rnd.nextDouble() * 20) / 4.0, i.toLong)
    }
    for (parts <- Seq(1, 4)) {
      val df = rows.toDF("g", "q", "id").repartition(parts)
      val win = df.withColumn("rnk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("g")
            .orderBy(col("q").desc, col("id").asc)))
        .where(col("rnk") <= 5).select("g", "rnk", "id", "q")
        .collect().map(_.toSeq).toSet
      val agg = df.groupBy("g")
        .agg(TopKAgg.top_k_by(col("q"), col("id"), 5).as("top"))
        .select(col("g"), posexplode(col("top")).as(Seq("pos", "p")))
        .select(col("g"), (col("pos") + 1).cast("int").as("rnk"),
          col("p.id").as("id"), col("p.ord").as("q"))
        .collect().map(_.toSeq).toSet
      assert(agg == win, s"parts=$parts")
    }
  }

  test("plans as ObjectHashAggregate with a partial pass — no window sort") {
    val df = Seq(("a", 1.0, 1L)).toDF("g", "q", "id")
    val plan = df.groupBy("g")
      .agg(TopKAgg.top_k_by(col("q"), col("id"), 3).as("top"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_top_k_by"), plan) // map-side k-bounded partial
    assert(!plan.contains("Window"), plan)
  }

  test("topQualityDocsAgg equals topQualityDocs on the documents fixture") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val win = TextAnalysis.topQualityDocs(docs, "lang", k = 3)
      .collect().map(_.toSeq).toSeq
    val agg = TextAnalysis.topQualityDocsAgg(docs, "lang", k = 3)
      .collect().map(_.toSeq).toSeq
    assert(agg == win)
  }
}
