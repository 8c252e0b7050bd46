package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Size-gated join hints — the [[graft.sim.Similarity]] probe-broadcast
  * gate factored out for the release/dedup chains.
  *
  * A forced `broadcast()` hint bypasses AQE's size check: on a relation
  * that is tiny at test scale but corpus-proportional in production (a
  * near-dup drop list on a dup-heavy crawl, the per-cluster canonical
  * relation), the hint turns a slow plan into an executor OOM. The gate
  * consults Catalyst's estimated size and only forces the hint when the
  * estimate fits comfortably; past the budget — or when the estimate is
  * unknown (checkpoint-backed lineage reports the default "assume huge"
  * size) — the relation is left unhinted and AQE picks the join strategy
  * from the ACTUAL runtime shuffle sizes, which at test scale still
  * resolves to a broadcast join and at 100 TB degrades to a shuffled
  * join instead of an OOM.
  */
object Hints {

  /** Estimated-size budget for a forced broadcast hint — matches
    * [[graft.sim.Similarity.MaxProbeBroadcastBytes]]: well under
    * Spark's 8 GB broadcast hard cap, with headroom for hash-relation
    * overhead.
    */
  private[graft] val MaxHintBytes: BigInt = BigInt(512L << 20)

  /** True iff Catalyst's estimate of `df` fits the hint budget. An
    * unknown estimate (defaulted to "huge") fails the gate — the safe
    * direction: AQE still broadcasts small relations at runtime.
    */
  private[graft] def smallEnough(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.stats.sizeInBytes <= MaxHintBytes

  /** `rel` wrapped in `broadcast()` iff its estimated size fits the
    * budget; `rel` untouched (AQE decides) otherwise.
    */
  def broadcastIfSmall(rel: DataFrame): DataFrame =
    if (smallEnough(rel)) broadcast(rel) else rel
}
