package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (point-in-time lookup): for every left row, the latest right
  * value with `t_right <= t_left` on the same key (backward direction; a
  * forward direction and a match tolerance are supported too — the
  * pandas `merge_asof` surface).
  *
  * Spark has no built-in as-of join; per the custom-operator ladder this is
  * expressed by COMPOSING built-ins (preference (a), no custom SparkPlan
  * needed): tag and union both inputs, then one window pass per key in
  * time order carrying the last seen right-value forward. One shuffle
  * (by key), O(n log n) per partition sort — the same merge shape a native
  * as-of operator would use, and it spills via the window exec rather
  * than materializing a range-join blowup (the naive `t_r <= t_l`
  * θ-join is quadratic per key).
  *
  * Tie rule: right rows at exactly t_left are visible (inclusive); among
  * right rows with equal t the largest `v` wins.
  */
object AsOfJoin {

  sealed trait Direction
  /** Latest right row with t_right <= t_left. */
  case object Backward extends Direction
  /** Earliest right row with t_right >= t_left. */
  case object Forward extends Direction

  /** left: (k LONG, t LONG, id ...) — id must uniquely identify left rows.
    * right: (k LONG, t LONG, v LONG).
    * Returns (id, k, asof_v) with asof_v null when no right row matches
    * (none in the direction, or the nearest one is beyond `tolerance`
    * time units when given).
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      direction: Direction = Backward,
      tolerance: Option[Long] = None): DataFrame = {
    val l = left.select(
      col("k"), col("t"), lit(0).as("is_r"),
      lit(null).cast("long").as("v"), col("id"))
    val r = right.select(
      col("k"), col("t"), lit(1).as("is_r"),
      col("v"), lit(null).cast("long").as("id"))
    // Backward walks time ascending; forward is the mirror image (descend,
    // so the "last seen" right row is the earliest at-or-after one).
    val tOrd = direction match {
      case Backward => col("t").asc
      case Forward => col("t").desc
    }
    // Right rows sort BEFORE left rows at equal t (is_r desc) so the
    // lookup is inclusive; null v only occurs on left rows, so the last
    // non-null v in the frame is exactly the nearest right value.
    val w = Window.partitionBy(col("k"))
      .orderBy(tOrd, col("is_r").desc, col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val merged = l.unionByName(r)
      .withColumn("asof_v", last(col("v"), ignoreNulls = true).over(w))
      .withColumn("asof_t",
        last(when(col("is_r") === 1, col("t")), ignoreNulls = true).over(w))
      .filter(col("is_r") === 0)
    val value = tolerance match {
      case Some(tol) =>
        val dist = direction match {
          case Backward => col("t") - col("asof_t")
          case Forward => col("asof_t") - col("t")
        }
        when(dist <= tol, col("asof_v")) // null asof_t → null dist → null
      case None => col("asof_v")
    }
    merged.select(col("id"), col("k"), value.as("asof_v"))
  }
}
