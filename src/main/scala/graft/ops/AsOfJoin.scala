package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (point-in-time lookup): for every left row, the latest right
  * value with `t_right <= t_left` on the same key.
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

  /** left: (k LONG, t LONG, id ...) — id must uniquely identify left rows.
    * right: (k LONG, t LONG, v LONG).
    * Returns (id, k, asof_v) with asof_v null when no right row precedes.
    */
  def asOf(left: DataFrame, right: DataFrame): DataFrame = {
    val l = left.select(
      col("k"), col("t"), lit(0).as("is_r"),
      lit(null).cast("long").as("v"), col("id"))
    val r = right.select(
      col("k"), col("t"), lit(1).as("is_r"),
      col("v"), lit(null).cast("long").as("id"))
    // Right rows sort BEFORE left rows at equal t (is_r desc) so the
    // lookup is inclusive; null v only occurs on left rows, so the last
    // non-null v in the frame is exactly the latest preceding right value.
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t"), col("is_r").desc, col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("asof_v", last(col("v"), ignoreNulls = true).over(w))
      .filter(col("is_r") === 0)
      .select(col("id"), col("k"), col("asof_v"))
  }
}
