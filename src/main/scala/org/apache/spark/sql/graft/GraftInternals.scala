package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Internal helpers that need `private[sql]` access. */
object GraftInternals {

  /** Release the executor blocks behind a `localCheckpoint()`ed DataFrame.
    *
    * `Dataset.unpersist` only clears CacheManager entries; a local
    * checkpoint persists the underlying RDD directly (it never registers
    * with CacheManager), so the public API silently leaks one |V|-sized
    * RDD per PageRank iteration. This reaches through the `LogicalRDD`
    * leaf the checkpoint produces and unpersists the actual RDD.
    * No-op for non-checkpointed plans.
    */
  def freeLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ =>
    }

  /** RDD ids backing the `LogicalRDD` leaves (localCheckpoints) of `df`'s
    * plan — the blocks a persistent-RDD sweep must NOT free because they
    * ARE the result.
    */
  def checkpointRddIds(df: DataFrame): Set[Int] =
    df.queryExecution.analyzed.collect { case l: LogicalRDD => l.rdd.id }.toSet

  /** Drain the listener bus so per-query metric accumulation (Bench's
    * executor CPU-time listener) observes every stage of the job that just
    * finished — listener delivery is asynchronous, so without this a
    * query's last stages would be attributed to the NEXT query.
    */
  def drainListenerBus(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
