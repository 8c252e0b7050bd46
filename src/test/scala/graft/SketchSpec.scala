package graft

import org.apache.spark.sql.functions._

/** Approximate-distinct sketch accuracy vs exact counts. */
class SketchSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact per supplier on sf0.001") {
    val li = Tables.lineitem(spark, Sf001)
    val joined = li.groupBy(col("l_suppkey"))
      .agg(
        approx_count_distinct(col("l_partkey")).as("approx"),
        countDistinct(col("l_partkey")).as("exact"))
    val bad = joined
      .filter(abs(col("approx") - col("exact")) > col("exact") * 0.05 + lit(2))
      .count()
    assert(bad == 0, s"$bad suppliers outside 5% relative error")
  }
}
