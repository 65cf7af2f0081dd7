package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

import graft.SparkSpec

/** Ingest-boundary tests for [[Readers.readEvents]]: the events fixture has
  * shipped with two different physical encodings of `ts` across environment
  * generations (nanos-as-long and TIMESTAMP_NTZ micros); the reader must
  * yield the SAME logical frame — TimestampType ts, identical values — for
  * both, so a future fixture drift is absorbed silently instead of breaking
  * every downstream event query (the round-5 regression). */
class ReadersSpec extends SparkSpec {
  import spark.implicits._

  // one hour's worth of events at odd offsets, micros precision
  private val baseMicros = 1700000000000000L // 2023-11-14T22:13:20 UTC
  private val rows = Seq(
    (1L, "u1", "click", 1.5, baseMicros),
    (2L, "u2", "view", 2.5, baseMicros + 37L),
    (3L, "u1", "purchase", 9.0, baseMicros + 3600L * 1000000L),
    (4L, "u3", "click", 0.25, baseMicros + 7200L * 1000000L + 999L))

  private def writeFlavor(flavor: String): String = {
    val dir = Files.createTempDirectory(s"graft_events_$flavor").toString
    val df = rows.toDF("event_id", "user_id", "event_type", "value", "us")
    val out = flavor match {
      // nanos-as-long environments surface TIMESTAMP(NANOS) as a raw long
      case "nanos_long" => df.withColumn("ts", col("us") * 1000L).drop("us")
      case "ntz_micros" => df.withColumn("ts",
        timestamp_micros(col("us")).cast(TimestampNTZType)).drop("us")
    }
    out.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("readEvents normalizes nanos-as-long and NTZ-micros to the same frame") {
    val a = Readers.readEvents(spark, writeFlavor("nanos_long"))
    val b = Readers.readEvents(spark, writeFlavor("ntz_micros"))
    assert(a.schema("ts").dataType === TimestampType)
    assert(b.schema("ts").dataType === TimestampType)
    val cols = Seq("event_id", "user_id", "event_type", "value", "ts")
    val av = a.select(cols.map(col): _*).orderBy("event_id").collect().toSeq
    val bv = b.select(cols.map(col): _*).orderBy("event_id").collect().toSeq
    assert(av === bv)
    // values, not just equality: µs precision must survive both paths
    assert(av.map(_.getTimestamp(4).getTime).toSeq ===
      rows.map(_._5 / 1000L)) // java.sql.Timestamp.getTime is millis
  }

  test("readEvents reads the driver fixture and yields a usable timestamp") {
    val ev = Readers.readEvents(spark, "/root/testdata/sf0.001")
    assert(ev.schema("ts").dataType === TimestampType)
    // the round-5 failure mode was an analysis error on first use of ts;
    // exercise a timestamp function end-to-end
    val n = ev.select(date_trunc("hour", col("ts")).as("h")).where(col("h").isNotNull).count()
    assert(n > 0)
  }

  test("readEvents rejects an unsupported ts type loudly") {
    val dir = Files.createTempDirectory("graft_events_bad").toString
    rows.toDF("event_id", "user_id", "event_type", "value", "us")
      .withColumn("ts", col("us").cast("string")).drop("us")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException](Readers.readEvents(spark, dir))
    assert(e.getMessage.contains("unsupported type"))
  }

  test("readEmbeddings normalizes float and double element fixtures to" +
    " array<float> with identical values") {
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val vecs = Seq((0L, Seq(0.5f, -1.25f, 3.0f), "a"), (1L, Seq(2.0f, 0.0f, -0.125f), "b"))
    def write(asDouble: Boolean): String = {
      val dir = Files.createTempDirectory("graft_emb").toString
      val df = vecs.toDF("vec_id", "embedding", "label")
      val out = if (asDouble) df.withColumn("embedding", col("embedding").cast("array<double>")) else df
      out.coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      dir
    }
    val f = Readers.readEmbeddings(spark, write(asDouble = false))
    val d = Readers.readEmbeddings(spark, write(asDouble = true))
    Seq(f, d).foreach(df =>
      assert(df.schema("embedding").dataType === ArrayType(FloatType, containsNull = true) ||
        df.schema("embedding").dataType === ArrayType(FloatType, containsNull = false)))
    val fv = f.orderBy("vec_id").select("embedding").as[Seq[Float]].collect().toSeq
    val dv = d.orderBy("vec_id").select("embedding").as[Seq[Float]].collect().toSeq
    // the fixture values are exactly representable in float32, so the
    // double round-trip must be lossless
    assert(fv === dv && fv === vecs.map(_._2))
  }

  test("readEmbeddings rejects a non-numeric-array embedding column") {
    val dir = Files.createTempDirectory("graft_emb_bad").toString
    Seq((0L, "not a vector")).toDF("vec_id", "embedding")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val e = intercept[IllegalStateException](Readers.readEmbeddings(spark, dir))
    assert(e.getMessage.contains("unsupported type"))
  }
}
