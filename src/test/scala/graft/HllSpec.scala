package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.HllSketchAgg

/** Custom HLL TypedImperativeAggregate: accuracy and merge semantics. */
class HllSpec extends SparkSpec {
  import spark.implicits._

  test("hll_distinct within 5% of exact for 10k distinct longs") {
    val df = (1L to 20000L).map(i => i % 10000).toDF("x")
      .repartition(8) // force partial sketches + merge
    val row = df.agg(
      HllSketchAgg.hllDistinct(col("x")).as("approx"),
      countDistinct(col("x")).as("exact")).collect().head
    val (approx, exact) = (row.getLong(0), row.getLong(1))
    assert(exact == 10000)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("hll_distinct exact-ish at small cardinality (linear counting)") {
    val row = (1L to 50L).toDF("x").repartition(4)
      .agg(HllSketchAgg.hllDistinct(col("x")).as("approx")).collect().head
    assert(math.abs(row.getLong(0) - 50L) <= 1, s"got ${row.getLong(0)}")
  }

  test("hll_distinct on strings groups correctly") {
    val df = Seq("a" -> 1, "a" -> 2, "b" -> 1).toDF("k", "v")
      .groupBy($"k").agg(HllSketchAgg.hllDistinct($"v").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(df("a") == 2L && df("b") == 1L)
  }
}
