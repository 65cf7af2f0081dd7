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

  test("tpch_q6 pushes every predicate into the parquet scan") {
    val plan = SparkEntry.queries("tpch_q6_lineitem")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    // date bounds, discount band, and quantity cap all reach the reader
    assert(plan.contains("PushedFilters"), "no pushdown section in scan")
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters")).mkString
    Seq("l_shipdate", "l_discount", "l_quantity").foreach(c =>
      assert(pushed.contains(c), s"$c not pushed to the scan:\n$pushed"))
  }

  test("tpch_q1 prunes to the seven referenced columns") {
    val plan = SparkEntry.queries("tpch_q1_lineitem")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    val read = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate").foreach(c =>
      assert(read.contains(c), s"$c missing from ReadSchema"))
    // the unused join keys must NOT be scanned
    Seq("l_orderkey", "l_partkey").foreach(c =>
      assert(!read.contains(c), s"$c scanned though unused"))
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
