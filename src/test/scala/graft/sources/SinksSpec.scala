package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper

class SinksSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  test("equi-join between same-bucketed tables runs without a shuffle") {
    val left = (0L until 100L).map(i => (i, s"l$i")).toDF("id", "l")
    val right = (0L until 100L).map(i => (i, s"r$i")).toDF("id", "r")
    Sinks.writeBucketed(left, "graft_bucketed_l", "id", 4)
    Sinks.writeBucketed(right, "graft_bucketed_r", "id", 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force a non-broadcast join
      val joined = Sinks.table(spark, "graft_bucketed_l")
        .join(Sinks.table(spark, "graft_bucketed_r"), "id")
      assert(joined.count() == 100)
      joined.collect() // materialize so the adaptive plan is final
      val exec = joined.queryExecution.executedPlan
      val shuffles = collectWithSubqueries(exec) { case s: ShuffleExchangeExec => s }
      assert(shuffles.isEmpty, s"expected exchange-free co-located join, got:\n$exec")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_l")
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_r")
    }
  }

  test("ORC roundtrip preserves data; filters push down to the ORC scan") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString + "/t"
    val df = (0L until 1000L).map(i => (i, s"v$i", i % 7)).toDF("id", "s", "grp")
    df.write.mode("overwrite").orc(dir)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("s", StringType), StructField("grp", LongType)))
    val back = Readers.readOrc(spark, dir, schema)
    assert(back.count() == 1000)
    assert(back.where(col("id") === 42L).select("s").as[String].head() == "v42")
    val q = back.where(col("grp") === 3L).select("id")
    val exec = q.queryExecution.executedPlan.toString
    // pushdown reaches the ORC scan; projection prunes to the 2 used cols
    assert(exec.contains("PushedFilters: [IsNotNull(grp), EqualTo(grp,3)]"), exec)
    assert(exec.contains("ReadSchema: struct<id:bigint,grp:bigint>"), exec)
  }

  test("Avro roundtrip: all primitive types + nulls survive the container " +
    "codec; one file per non-empty partition; reader-schema projection") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_avro").toString + "/t"
    val df = spark.range(1000)
      .select(col("id"),
        when(col("id") % 7 === 0, lit(null: String))
          .otherwise(concat(lit("v"), col("id"))).as("s"),
        (col("id") % 5).cast("int").as("i"),
        (col("id") * 1.5).as("d"),
        (col("id") % 2 === 0).as("b"),
        col("id").cast("float").as("f"),
        when(col("id") % 11 === 0, lit(null).cast("binary"))
          .otherwise(encode(concat(lit("bin"), col("id")), "UTF-8")).as("bin"))
      .repartition(4)
    AvroIO.writeAvro(df, dir)
    // one container file per non-empty partition + a _SUCCESS marker
    val files = new java.io.File(dir).listFiles().map(_.getName).sorted
    assert(files.count(_.endsWith(".avro")) == 4, files.toSeq)
    assert(files.contains("_SUCCESS"))
    // attempt-isolated commit: every temp file was renamed into place
    assert(!files.exists(_.endsWith(".tmp")), files.toSeq)
    val back = AvroIO.readAvro(spark, dir, df.schema)
    assert(back.count() == 1000)
    // early-terminating reads (limit) must not leak container readers —
    // the task completion listener closes what the drain doesn't
    assert(back.limit(3).collect().length == 3)
    // value fidelity, including the nullable unions, across every type
    val exp = df.collect().map(r => r.getLong(0) ->
      (Option(r.getString(1)), r.getInt(2), r.getDouble(3), r.getBoolean(4),
        r.getFloat(5), Option(r.getAs[Array[Byte]](6)).map(_.toSeq))).toMap
    back.collect().foreach { r =>
      val (s, i, d, b, f, bin) = exp(r.getLong(0))
      assert(Option(r.getString(1)) == s && r.getInt(2) == i &&
        r.getDouble(3) == d && r.getBoolean(4) == b && r.getFloat(5) == f &&
        Option(r.getAs[Array[Byte]](6)).map(_.toSeq) == bin, s"row $r")
    }
    // reader-schema projection: a 2-field read schema decodes only those
    val slim = AvroIO.readAvro(spark, dir, StructType(Seq(
      StructField("id", LongType), StructField("s", StringType))))
    assert(slim.columns.toSeq == Seq("id", "s") && slim.count() == 1000)
    assert(slim.where(col("id") === 43L).select("s").as[String].head() == "v43")
  }

  test("readJson quarantines malformed records instead of dropping or failing") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_json")
    java.nio.file.Files.writeString(dir.resolve("part-0.json"),
      """{"doc_id": 1, "text": "ok one"}
        |this line is not json at all
        |{"doc_id": 2, "text": "ok two"}
        |{"doc_id": "not-a-number", "text": "type mismatch"}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val raw = Readers.readJson(spark, dir.toString, schema)
    val split = Readers.splitCorrupt(raw)
    val (clean, bad) = (split.clean, split.bad)
    assert(clean.columns.toSeq == Seq("doc_id", "text"))
    assert(clean.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    val badRows = bad.collect().map(_.getAs[String](Readers.corruptCol))
    assert(badRows.length == 2) // the non-JSON line and the type mismatch
    assert(badRows.exists(_.contains("not json")))
    assert(badRows.exists(_.contains("not-a-number")))
    split.done()
  }

  test("readCsv quarantine is column-pruning-proof: a corrupt field in an " +
    "unreferenced column still classifies the row") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_csv_prune")
    java.nio.file.Files.writeString(dir.resolve("part-0.csv"),
      """doc_id,source,lang
        |1,s1,en
        |2x,s1,en
        |3,s2,de
        |""".stripMargin)
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("source", StringType), StructField("lang", StringType)))
    val cachedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val split = Readers.splitCorrupt(
      Readers.readCsv(spark, dir.toString, schema))
    // the downstream query touches ONLY source: with CSV column pruning the
    // malformed doc_id "2x" would never parse, the row would count as clean
    // here and quarantined elsewhere — quarantine must be a row property
    val bySource = split.clean.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(bySource == Map("s1" -> 1L, "s2" -> 1L))
    assert(split.bad.count() == 1)
    assert(split.bad.select("source").as[String].head() == "s1") // partial parse kept
    // releasing the handle unpins the shared DISK_ONLY parse cache (delta
    // vs before: other suites in the shared session may hold caches)
    split.done()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- cachedBefore
    assert(leaked.isEmpty, s"splitCorrupt cache still pinned after done(): $leaked")
  }

  test("partitioned write prunes directories on the partition predicate") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val df = Seq((1L, "en"), (2L, "de"), (3L, "en")).toDF("id", "lang")
    Sinks.writePartitioned(df, dir, "lang")
    val back = spark.read.parquet(dir).where($"lang" === "en")
    assert(back.count() == 2)
    // layout proof: hive-style partition directories exist, and the scan
    // carries the predicate as a partition filter (directory pruning)
    val dirs = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("lang=")).sorted
    assert(dirs.toSeq == Seq("lang=de", "lang=en"))
    val planStr = back.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters") && planStr.contains("lang"), planStr)
  }
  test("writeSized: near-target file sizes with disjoint sorted key ranges") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sized").toString + "/t"
    val df = spark.range(1000).toDF("k")
      .withColumn("payload", col("k") * 7)
    Sinks.writeSized(df, dir, "k", targetRowsPerFile = 250L)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length == 4, s"expected 4 files, got ${files.length}")
    // round trip is lossless and every file's key range is disjoint
    val back = spark.read.parquet(dir)
    assert(back.count() == 1000L)
    val ranges = files.map { f =>
      val t = spark.read.parquet(f.getAbsolutePath)
        .agg(min("k"), max("k")).head()
      (t.getLong(0), t.getLong(1))
    }.sortBy(_._1)
    assert(ranges.sliding(2).forall { case Array(a, b) => a._2 < b._1; case _ => true })
    // the fileStats audit sees the same layout
    val fs = Sinks.fileStats(spark, dir, "k").collect()
    assert(fs.length == 4 && fs.map(_.getLong(1)).sum == 1000L)
  }

  test("readBinaryFiles ingests media files into decode-ready rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bin").toFile
    dir.deleteOnExit()
    // one real PNG and one text file the glob must exclude
    val img = new java.awt.image.BufferedImage(9, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    javax.imageio.ImageIO.write(img, "png", new java.io.File(dir, "a.png"))
    java.nio.file.Files.write(new java.io.File(dir, "skip.txt").toPath,
      "not media".getBytes)
    val df = Readers.readBinaryFiles(spark, dir.getAbsolutePath, "*.png")
    val rows = df.select("path", "length", "content").collect()
    assert(rows.length == 1 && rows(0).getString(0).endsWith("a.png"))
    // bytes flow into the multimodal decode path and yield real dimensions
    import graft.llm.{MediaRecord, Multimodal}
    val feats = Multimodal.extractFeatures(
      df.select(org.apache.spark.sql.functions.lit(7L).as("doc_id"),
        org.apache.spark.sql.functions.col("content").as("media"),
        org.apache.spark.sql.functions.lit("image").as("kind"))
        .as[MediaRecord]).collect()
    assert(feats.length == 1 && feats(0).width == 9 && feats(0).height == 4)
  }

  test("zorderKey: bit interleave hand-checked on corners, axes, and a mix") {
    val df = Seq((0L, 0L), (15L, 15L), (1L, 0L), (0L, 1L), (3L, 5L))
      .toDF("bx", "by")
    val r = df.select(Sinks.zorderKey(col("bx"), col("by"), bits = 4).as("z"))
      .as[Long].collect()
    // z(3,5): bx=0011 -> bits 0,2; by=0101 -> bits 1,5 => 1+4+2+32 = 39
    assert(r.toSeq == Seq(0L, 255L, 1L, 2L, 39L))
    // z-sorting clusters both dimensions: any 4-cell quadrant occupies a
    // contiguous zkey block of exactly 4 (locality the footer stats exploit)
    val all = (0 until 16).flatMap(x => (0 until 16).map(y => (x.toLong, y.toLong)))
      .toDF("bx", "by")
      .select(col("bx"), col("by"),
        Sinks.zorderKey(col("bx"), col("by"), bits = 4).as("z"))
      .as[(Long, Long, Long)].collect()
    assert(all.map(_._3).sorted.toSeq == (0L until 256L).toSeq)
    all.groupBy { case (x, y, _) => (x / 2, y / 2) }.foreach { case (_, cells) =>
      val zs = cells.map(_._3).sorted
      assert(zs.length == 4 && zs.last - zs.head == 3)
    }
  }

}
