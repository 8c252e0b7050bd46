package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded (interval) equi+range join, composed from existing operators.
  *
  * Spark has no native interval-join physical operator; a raw non-equi
  * join plans as a broadcast-nested-loop — O(|L|·|R|) and a guaranteed
  * non-starter at scale. The standard scale-out composition: quantize the
  * range dimension into `width`-wide bins (width ≥ the band), replicate
  * each probe row into the two bins its band can reach, and run a plain
  * hash equi join on (key, bin) with the exact band predicate as a
  * residual filter. Work and shuffle are both O(matching bins), the join
  * parallelizes over (key, bin), and Catalyst treats it like any other
  * equi join (AQE, skew split, codegen all apply).
  */
object RangeJoin {

  /** Pairs (l, r) sharing `key` with rOrd ∈ (lOrd, lOrd + band].
    *
    * `left`/`right` must expose numeric order columns `lOrd`/`rOrd` (e.g.
    * epoch millis). Output carries all columns of both inputs.
    */
  def bandPairs(
      left: DataFrame,
      right: DataFrame,
      key: String,
      lOrd: String,
      rOrd: String,
      band: Long): DataFrame = {
    require(band > 0)
    // A right row in (t, t+band] lives in the probe row's own bin or the
    // next one; replicating the LEFT side keeps the build side unskewed.
    val probe = left.withColumn("graft_bin",
      explode(array(floor(col(lOrd) / band), floor(col(lOrd) / band) + 1)))
    val build = right.withColumn("graft_bin", floor(col(rOrd) / band))
    probe.join(build,
        probe("graft_bin") === build("graft_bin") &&
          probe(key) === build(key) &&
          build(rOrd) > probe(lOrd) &&
          build(rOrd) <= probe(lOrd) + band)
      .drop(build(key))
      .drop("graft_bin")
  }
}
