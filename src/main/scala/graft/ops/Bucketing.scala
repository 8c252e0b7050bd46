package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for shuffle-free co-located joins.
  *
  * At 100 TB the dominant cost of a fact⋈fact join is the shuffle of both
  * sides. Writing each table bucketed (and sorted) by the join key fixes
  * the partitioning ON DISK: Spark's scan reports the bucket spec as its
  * output partitioning, so a sort-merge join over two tables bucketed the
  * same way needs NO Exchange on either side (and no per-task Sort when
  * `sortBy` matches). This is the batch analogue of the reference's
  * block-stripe layout (pageRank.py:96-113): partition the data once, by
  * the key every pass groups on, and every subsequent pass is local.
  *
  * The same layout serves repeated joins — e.g. the per-iteration
  * edges⋈ranks join keyed by src — paying one write-side shuffle for N
  * shuffle-free reads.
  */
object Bucketing {

  /** Write `df` as a managed bucketed table (bucketed + sorted by `key`). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Equi-join two identically-bucketed tables on their bucket key. With
    * broadcast disabled this plans as a sort-merge join with zero
    * Exchange operators (asserted in BucketingSpec).
    */
  def coLocatedJoin(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
