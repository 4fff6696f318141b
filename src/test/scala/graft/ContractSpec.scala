package graft

/** Driver-contract smoke tests: every registered query runs and
  * returns rows at sf0.001; every oracle key has a query; entry()
  * is non-empty. Value-level correctness is enforced by the driver's
  * DuckDB hash-compare (tools/verify_local.sh locally).
  */
class ContractSpec extends SparkSpec {

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a registered query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("oracle SQL has no unbalanced quotes") {
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(sql.count(_ == '\'') % 2 == 0, s"$k has odd quote count")
    }
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"$name returned 0 rows")
    }
  }
}
