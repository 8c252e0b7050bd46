package graft

/** Smoke: every registered query runs on sf0.001 and the flagship entry
  * returns rows. (Value-level correctness is covered by the DuckDB oracle
  * gate; this suite catches runtime plan errors early.)
  */
class QueriesSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"query $name runs on sf0.001") {
      val df = fn(spark, Sf001)
      assert(df.count() >= 0)
    }
  }
}
