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
    // Exact integer floor division: long `/` in Spark SQL divides as
    // DOUBLE, which mis-bins ordinals beyond 2^53 (epoch NANOS, say) so
    // probe and build bins can disagree while the residual band predicate
    // holds — silently dropping matching pairs. decimal(38,0) division
    // keeps full precision; floor then handles negatives correctly.
    def bin(c: org.apache.spark.sql.Column) =
      floor(c.cast("decimal(38,0)") / band).cast("long")
    // A right row in (t, t+band] lives in the probe row's own bin or the
    // next one; replicating the LEFT side keeps the build side unskewed.
    val probe = left.withColumn("graft_bin",
      explode(array(bin(col(lOrd)), bin(col(lOrd)) + 1)))
    val build = right.withColumn("graft_bin", bin(col(rOrd)))
    probe.join(build,
        probe("graft_bin") === build("graft_bin") &&
          probe(key) === build(key) &&
          build(rOrd) > probe(lOrd) &&
          build(rOrd) <= probe(lOrd) + band)
      .drop(build(key))
      .drop("graft_bin")
  }
}
