package graft.dist

import graft.SparkSpec
import graft.llm.{Dedup, Slow}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Measured skew-stress fixtures: the 100 TB failure modes are a single
  * hot join key (one task holds the key's every row) and a boilerplate
  * shingle (one dedup bucket holds the corpus). Round-2 review asked for
  * these claims to be MEASURED under a deliberately skewed fixture rather
  * than plan-argued — this suite builds a 100:1 hot key and a
  * corpus-spanning hot shingle and asserts the guards hold:
  * [[Joins.saltedJoin]] splits the hot key's rows across salts with
  * identical join output, and the `maxBucket` cap in
  * [[graft.llm.Dedup.ngramJaccardPairs]]/[[graft.llm.Dedup.minHashNearDup]]
  * drops the hot bucket without losing genuinely-near pairs. */
class SkewStressSpec extends SparkSpec {
  import spark.implicits._

  // ---- fixture 1: 100:1 hot join key -------------------------------------
  // 1000 uniform keys x 200 rows + key 0 with 20_000 rows (100x the average)
  private val salts = 16
  private lazy val fact: DataFrame = {
    val uniform = spark.range(200000L)
      .select((col("id") % 1000 + 1).as("k"), col("id").as("v"))
    val hot = spark.range(20000L)
      .select(lit(0L).as("k"), (col("id") + 1000000L).as("v"))
    uniform.union(hot)
  }
  private lazy val dim: DataFrame = spark.range(1001L)
    .select(col("id").as("k"), (col("id") * 7 % 13).as("grp"))

  test("saltedJoin output equals the plain join exactly under a 100:1 hot key",
       Slow) {
    val plain = fact.join(dim, Seq("k"))
      .groupBy("grp").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .orderBy("grp").collect()
    val salted = Joins.saltedJoin(fact, dim, Seq("k"), salts = salts)
      .groupBy("grp").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .orderBy("grp").collect()
    assert(salted.toSeq == plain.toSeq)
  }

  test("salting splits the hot key's rows across shuffle partitions " +
       "(max partition rows drops below the hot-key row count)", Slow) {
    def maxPartRows(df: DataFrame): Long =
      df.select(spark_partition_id().as("p"))
        .groupBy("p").agg(count(lit(1)).as("n"))
        .agg(max("n")).head().getLong(0)
    // hash partitioning on the bare key: the hot key's 20k rows land in ONE
    // partition — the task that OOMs/straggles at scale
    val unsalted = maxPartRows(fact.repartition(32, col("k")))
    // same salt derivation as saltedJoin (Joins.scala): uniform rand in
    // [0, salts) appended to the key splits the hot key into `salts` cells
    val salted = maxPartRows(
      fact.withColumn("__salt", (rand(42L) * salts).cast("int"))
        .repartition(32, col("k"), col("__salt")))
    assert(unsalted >= 20000L,
      s"fixture must concentrate the hot key in one partition, got $unsalted")
    assert(salted < 20000L / 2,
      s"salted max partition should be far below the hot key count, got $salted")
    assert(salted * 2 <= unsalted,
      s"expected >=2x balance win, got unsalted=$unsalted salted=$salted")
  }

  test("AQE skew-join engages on the hot key: executed SMJ carries skew=true " +
       "and results stay exact", Slow) {
    // the runtime half of the skew story (salting is the planning-time
    // half above): with the skew threshold lowered to CI-fixture bytes —
    // the same emulation tools/SkewBench uses, since local partitions
    // never hit the 256 MiB production default — AQE must detect the hot
    // partition and split it, which the final adaptive plan records as
    // `skew=true` on the sort-merge join
    val keys = Seq("spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.shuffle.partitions")
    val saved = keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      // 32 shuffle partitions: at the suite default of 4 the uniform keys
      // alone put ~50k rows in each partition, so the hot partition is only
      // ~1.4x the median and is correctly NOT classified as skewed — skew
      // is relative to the median, not absolute
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32k")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = fact.join(dim, Seq("k"))
        .groupBy("grp").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      // collect THIS frame (adding orderBy would execute a different
      // QueryExecution and leave joined's adaptive plan unfinalized)
      val rows = joined.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE skew split did not engage on the hot-key fixture:\n$plan")
      // and the split changes nothing about the answer
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val expected = fact.join(dim, Seq("k"))
        .groupBy("grp").agg(count(lit(1)).as("n"), sum("v").as("sv"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(rows.sortBy(_._1).toSeq == expected.sortBy(_._1).toSeq)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  // ---- fixture 2: corpus-spanning hot shingle -----------------------------
  // 1020 docs (1000 bases + 20 near-dup twins), every one ending with the
  // same boilerplate sentence: its 4 fully-boilerplate word-3-shingles have
  // bucket size 1020 >> maxBucket=200. Twin docs share all but one filler
  // token with their base (true Jaccard 81/87 ~ 0.93; 77/91 ~ 0.85 measured
  // from bucket-surviving shingles after the cap drops the 4 hot ones).
  private def alpha(n: Long): String = {
    var x = n; val sb = new StringBuilder
    do { sb.append(('a' + (x % 26)).toChar); x /= 26 } while (x > 0)
    sb.toString
  }
  private val boiler = "all rights reserved contact the operator"
  private def filler(base: Long, changedAt: Int = -1): String =
    (0 until 80).map { i =>
      if (i == changedAt) s"z${alpha(base)}qchanged"
      else s"w${alpha(base)}q${alpha(i.toLong)}"
    }.mkString(" ")
  private lazy val skewCorpus: DataFrame = {
    val bases = (0L until 1000L).map(d => (d, s"${filler(d)} $boiler"))
    val twins = (0L until 20L).map(d => (10000L + d, s"${filler(d, changedAt = 40)} $boiler"))
    (bases ++ twins).toDF("doc_id", "text")
  }
  private val plantedPairs = (0L until 20L).map(d => (d, 10000L + d)).toSet

  test("the skew corpus genuinely has a hot shingle bucket above maxBucket",
       Slow) {
    val maxBucket = skewCorpus
      .select(explode(Dedup.shingleHashes(col("text"))).as("h"))
      .groupBy("h").agg(count(lit(1)).as("n"))
      .agg(max("n")).head().getLong(0)
    assert(maxBucket == 1020L, s"expected a 1020-doc shingle bucket, got $maxBucket")
  }

  test("ngramJaccardPairs under the hot shingle: cap engages, planted " +
       "near-dup pairs all survive, no boilerplate-bridged false pairs", Slow) {
    val got = Dedup.ngramJaccardPairs(skewCorpus, threshold = 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == plantedPairs,
      s"missing=${plantedPairs -- got} extra=${got -- plantedPairs}")
  }

  test("minHashNearDup under the hot shingle: cap engages, planted " +
       "near-dup pairs all survive, no boilerplate-bridged false pairs", Slow) {
    val got = Dedup.minHashNearDup(skewCorpus, threshold = 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == plantedPairs,
      s"missing=${plantedPairs -- got} extra=${got -- plantedPairs}")
    spark.catalog.clearCache() // minHashNearDup persists its shingle frame
  }
}
