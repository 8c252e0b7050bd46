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
    test(s"query $name runs leak-neutral on sf0.001") {
      val before = RddScope.persisted(spark)
      val df = fn(spark, Sf001)
      assert(df.count() >= 0)
      // Leak-neutrality contract: after a query is consumed, the ONLY
      // persisted RDDs it may leave are the localCheckpoint backings
      // reachable from its own result plan (which the caller frees via
      // the standard sweep — done below so the suite itself stays clean).
      // A query-scoped cache()/persist() without unpersist fails here.
      val keep = org.apache.spark.sql.graft.GraftInternals.checkpointRddIds(df)
      val leaked = RddScope.persisted(spark) -- before -- keep
      assert(
        leaked.isEmpty,
        s"$name left persisted RDDs $leaked that are not checkpoint backings of its result")
      org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint(df)
    }
  }
}
