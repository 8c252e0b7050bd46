package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import graft.ops.Bucketing

/** Bucketed tables give shuffle-free co-located joins: the physical-layout
  * half of the 100 TB design story (SURVEY §4.2). */
class BucketingSpec extends SparkSpec {

  private def shuffleCount(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan
      .collectWithSubqueries { case e: ShuffleExchangeExec => e }.size

  /** The tiny test parquet reads as ONE split, and SinglePartition
    * satisfies every clustered distribution — both joins would be
    * trivially shuffle-free and prove nothing. Force multi-split scans
    * (as any real-size table has) and the static planner so Exchange
    * placement is decided by layout alone.
    */
  private def withContrastConfs[A](body: => A): A = {
    val restore = Seq(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.files.maxPartitionBytes" -> "8192",
      "spark.sql.files.openCostInBytes" -> "0")
    val saved = restore.map { case (k, _) => k -> spark.conf.getOption(k) }
    restore.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("join of two identically-bucketed tables plans with zero shuffles") {
    Bucketing.writeBucketed(
      Tables.customer(spark, Sf001).select(col("c_custkey"), col("c_mktsegment")),
      "b_customer", "c_custkey", 8)
    Bucketing.writeBucketed(
      Tables.orders(spark, Sf001).select(col("o_custkey").as("c_custkey"), col("o_totalprice")),
      "b_orders", "c_custkey", 8)
    try withContrastConfs {
      val joined = Bucketing.coLocatedJoin(spark, "b_customer", "b_orders", "c_custkey")
      assert(shuffleCount(joined) === 0)

      // The same join over raw (unbucketed, multi-split) scans must
      // hash-shuffle both sides.
      val raw = Tables.customer(spark, Sf001).select(col("c_custkey"), col("c_mktsegment"))
        .join(
          Tables.orders(spark, Sf001).select(col("o_custkey").as("c_custkey"), col("o_totalprice")),
          "c_custkey")
      assert(shuffleCount(raw) === 2)

      // And the bucketed join's rows match the plain join's.
      assert(joined.count() === raw.count())
      val a = joined.orderBy("c_custkey", "o_totalprice").collect().toSeq
      val b = raw.orderBy("c_custkey", "o_totalprice").collect().toSeq
      assert(a === b)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_customer")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }

  test("groupBy on the bucket key aggregates without a shuffle") {
    Bucketing.writeBucketed(
      Tables.orders(spark, Sf001).select(col("o_custkey"), col("o_totalprice")),
      "b_orders_agg", "o_custkey", 8)
    try withContrastConfs {
      val agg = spark.table("b_orders_agg")
        .groupBy("o_custkey").agg(sum("o_totalprice").as("total"))
      assert(shuffleCount(agg) === 0)
      // Raw scan of the same data needs the partial→final exchange.
      val rawAgg = Tables.orders(spark, Sf001)
        .groupBy("o_custkey").agg(sum("o_totalprice").as("total"))
      assert(shuffleCount(rawAgg) === 1)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders_agg")
    }
  }
}
