package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.graft.GraftInternals

/** Leak-neutral scoping for operators that drop to RDD-caching engines
  * (GraphX): unpersist every RDD a call left persisted EXCEPT the blocks
  * backing its materialized result.
  *
  * Why a diff-sweep and not targeted `Graph.unpersist` calls: GraphX
  * caches internal RDDs that no public handle reaches — e.g. each
  * `aggregateMessages`/`outerJoinVertices` round replaces the replicated
  * vertex view's EdgeRDD and caches the replacement (EdgeRDDImpl
  * `mapPartitions`), so an iteration loop leaks one cached EdgeRDD per
  * iteration even after unpersisting every graph it holds (measured: 13
  * leaked EdgeRDDs for the 13-iteration WikiData run). Only an
  * ids-before/ids-after sweep is robust to those internals.
  *
  * Assumes no concurrent unrelated persist activity in the session while
  * the operator runs — true for this library's batch entry points, which
  * own their session for the duration of a call.
  */
object RddScope {

  /** Ids of currently-persisted RDDs (capture at operator entry). */
  def persisted(spark: SparkSession): Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  /** Unpersist every RDD persisted since `before`, except those backing
    * `result`'s localCheckpoint (which ARE the result — the caller frees
    * them via `release()`/`freeLocalCheckpoint` when done).
    */
  def sweepExcept(spark: SparkSession, before: Set[Int], result: DataFrame): Unit = {
    val keep = GraftInternals.checkpointRddIds(result)
    spark.sparkContext.getPersistentRDDs
      .filter { case (id, _) => !before.contains(id) && !keep.contains(id) }
      .values.foreach(_.unpersist(blocking = false))
  }
}
