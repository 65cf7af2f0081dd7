package graft.dist

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain join on a pathologically skewed key") {
    // 90% of the big side lands on key 0 — the AQE-resistant single-hot-key shape
    val big = (0 until 1000).map(i => (if (i < 900) 0L else i.toLong % 7, s"v$i"))
      .toDF("k", "payload")
    val small = (0L until 7L).map(k => (k, s"dim$k")).toDF("k", "dim")
    val plain = big.join(small, Seq("k")).select("k", "payload", "dim")
      .collect().map(_.toSeq).toSet
    val salted = Joins.saltedJoin(big, small, Seq("k"), salts = 4)
      .select("k", "payload", "dim").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(salted.size == 1000) // every big row matched exactly once
  }

  test("saltedJoin splits a hot key across multiple partitions") {
    // AQE off for the assertion: its coalescing would legitimately re-merge
    // these tiny partitions and hide the salt's effect
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      // force a shuffle join so partitioning is by (k, salt), not input layout
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val big = (0 until 400).map(_ => (0L, "x")).toDF("k", "payload").coalesce(1)
      val small = Seq((0L, "dim")).toDF("k", "dim")
      val parts = Joins.saltedJoin(big, small, Seq("k"), salts = 4)
        .groupBy(spark_partition_id().as("pid")).count()
        .where(col("count") > 0).count()
      assert(parts > 1, "hot key should spread over more than one partition")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prev)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }
}
