package graft

/** Guards the driver contract itself: SparkEntry is what the harness runs,
  * so a query that throws, an oracle key without a query, or a column-name
  * mismatch between the two maps is a round-losing bug this suite catches
  * at test time. Executes every declared query end-to-end on sf0.001. */
class SparkEntryContractSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def testdataPresent = new java.io.File(s"$sfDir/lineitem.parquet").exists()

  test("every oracleSql key names a declared query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL without a query: $orphans")
  }

  test("flagship entry() returns rows (driver t1 smoke)") {
    assume(testdataPresent)
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query executes end-to-end at sf0.001") {
    assume(testdataPresent)
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        assert(df.schema.nonEmpty)
        df.limit(5).collect()
        None
      } catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("oracle SQL strings are DuckDB-shaped (no Spark-only escapes)") {
    // cheap lint: every oracle must reference a known table and end without
    // a dangling semicolon (the compare tool wraps them verbatim)
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(!sql.trim.endsWith(";"), s"$name: trailing semicolon")
      assert(tables.exists(sql.contains), s"$name: no known table referenced")
    }
  }
}
