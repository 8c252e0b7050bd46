package graft

import org.apache.spark.sql.functions._

import graft.ops.Hints

/** The size-gated broadcast hint (r15 verdict #2): a forced
  * `broadcast()` on a corpus-proportional relation (near-dup drop
  * lists, per-cluster canonicals) bypasses AQE's size check and turns
  * into an executor OOM on a dup-heavy 100 TB corpus. The gate forces
  * the hint only while Catalyst's estimate fits the budget — so test-
  * scale plans keep their broadcast joins, and past the budget the
  * relation is left to AQE's runtime statistics.
  */
class HintsSpec extends SparkSpec {

  private def docs = Tables.documents(spark, Sf001)

  test("a small parquet-derived relation passes the gate and keeps the forced broadcast") {
    val drops = docs.filter(col("n_chars") > 400).select(col("doc_id"))
    assert(Hints.smallEnough(drops), "tiny relation failed the gate")
    val joined = docs.join(Hints.broadcastIfSmall(drops), Seq("doc_id"), "left_anti")
    assert(joined.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      joined.queryExecution.executedPlan.toString.take(2000))
  }

  test("the gate sees THROUGH a localCheckpoint: stats propagate, the hint still fires") {
    // The release chain's drop/canon relations derive from checkpointed
    // CC output — the gate only works at test scale because Spark
    // propagates the origin plan's statistics into the checkpoint's
    // LogicalRDD. Pin that, so a Spark upgrade that loses propagation
    // (silently degrading every gated hint to AQE-only) fails a test
    // instead of a bench.
    val ck = docs.select(col("doc_id")).localCheckpoint(true)
    try {
      val est = ck.queryExecution.optimizedPlan.stats.sizeInBytes
      assert(est < BigInt(100L << 20),
        s"checkpoint lost its origin stats (estimate $est) — the gate degrades to AQE-only")
      assert(Hints.smallEnough(ck))
      val derived = ck.groupBy(col("doc_id")).agg(count(lit(1)).as("c"))
        .select(col("doc_id"))
      assert(Hints.smallEnough(derived), "stats lost through an aggregate over the checkpoint")
    } finally org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint(ck)
  }

  test("an estimate past the budget fails the gate and the relation is left unhinted") {
    // A cross join's estimate is the product of its children — a cheap
    // way to manufacture a huge ESTIMATE without executing anything.
    val big = spark.range(100000000L).toDF("a")
      .crossJoin(spark.range(100000000L).toDF("b"))
      .select((col("a") + col("b")).as("doc_id"))
    assert(!Hints.smallEnough(big), "a 10^16-row estimate passed the gate")
    val unhinted = docs.join(Hints.broadcastIfSmall(big), Seq("doc_id"), "left_anti")
    assert(!unhinted.queryExecution.analyzed.toString.contains("ResolvedHint"),
      "the gate forced a broadcast hint past the budget")
  }

  test("d13 (fuzzy dedup apply) keeps its broadcast anti-join at test scale through the gate") {
    val plan = SparkEntry.queries("d13_fuzzy_dedup_apply")(spark, Sf001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      plan.take(2000))
  }
}
