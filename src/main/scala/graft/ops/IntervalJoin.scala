package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-OVERLAP join (both sides are intervals), composed from
  * existing operators — the companion of [[RangeJoin]] (point-in-band).
  *
  * A raw `l.start < r.end && r.start < l.end` join plans as a nested loop;
  * the scale-out composition quantizes time into `width`-wide bins,
  * replicates each interval into every bin it touches (replication factor
  * = ⌈len/width⌉, so pick width ≥ the typical interval length), joins on
  * the bin, and keeps the exact overlap predicate as a residual. A pair
  * overlapping across several shared bins would match repeatedly, so each
  * pair is attributed to exactly ONE bin — the bin containing the overlap
  * START (`greatest(l.start, r.start)`), which both sides of a true
  * overlap necessarily cover. Equi-join shape throughout: AQE, skew split
  * and codegen all apply; no distinct/dedup pass is needed.
  */
object IntervalJoin {

  /** Pairs of rows whose half-open intervals [lStart, lEnd) × [rStart,
    * rEnd) overlap. Output carries all columns of both inputs. Column
    * names must be disjoint between `left` and `right`.
    */
  def overlapPairs(
      left: DataFrame,
      right: DataFrame,
      lStart: String, lEnd: String,
      rStart: String, rEnd: String,
      width: Long): DataFrame = {
    require(width > 0)
    // decimal(38,0) floor-division (see RangeJoin.bin): exact for ordinals
    // beyond 2^53 and correct on negatives.
    def bin(c: Column) = floor(c.cast("decimal(38,0)") / width).cast("long")
    val probe = left
      .filter(col(lEnd) > col(lStart)) // empty intervals overlap nothing
      .withColumn("graft_bin",
        explode(sequence(bin(col(lStart)), bin(col(lEnd) - 1))))
    val build = right
      .filter(col(rEnd) > col(rStart))
      .withColumn("graft_bin_r",
        explode(sequence(bin(col(rStart)), bin(col(rEnd) - 1))))
    probe.join(build,
        col("graft_bin") === col("graft_bin_r") &&
          col(lStart) < col(rEnd) && col(rStart) < col(lEnd) &&
          bin(greatest(col(lStart), col(rStart))) === col("graft_bin"))
      .drop("graft_bin", "graft_bin_r")
  }
}
