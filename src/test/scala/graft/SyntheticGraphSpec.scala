package graft

import org.apache.spark.sql.functions._
import graft.graph.{PageRank, SyntheticGraph}

/** The scale-harness generator: deterministic across invocations and
  * parallelism, power-law skewed (hub-heavy), PageRank-consumable.
  */
class SyntheticGraphSpec extends SparkSpec {

  test("powerLaw graph is reproducible: same params, same edge multiset") {
    def digest(): (Long, Long) = {
      val g = SyntheticGraph.powerLaw(spark, nVerts = 1000, nEdges = 20000)
      // bit_xor: order-independent edge-multiset digest, no ANSI overflow
      val r = g.agg(
        count(lit(1)),
        bit_xor(xxhash64(col("src"), col("dst")))).first()
      (r.getLong(0), r.getLong(1))
    }
    assert(digest() == digest())
  }

  test("powerLaw degrees are hub-skewed and ids stay in range") {
    val g = SyntheticGraph.powerLaw(spark, nVerts = 1000, nEdges = 20000).cache()
    try {
      val bounds = g.agg(
        min(least(col("src"), col("dst"))),
        max(greatest(col("src"), col("dst")))).first()
      assert(bounds.getLong(0) >= 0 && bounds.getLong(1) < 1000)
      val degs = PageRank.outDegrees(g)
      val r = degs.agg(max(col("out_degree")), avg(col("out_degree"))).first()
      val (maxDeg, avgDeg) = (r.getLong(0), r.getDouble(1))
      assert(maxDeg > 10 * avgDeg, s"max=$maxDeg avg=$avgDeg — not a power law")
      assert(g.filter(col("src") === col("dst")).count() == 0, "self-loops must be dropped")
    } finally g.unpersist()
  }

  test("PageRank on a powerLaw graph: mass 1, hubs outrank the median") {
    val g = SyntheticGraph.powerLaw(spark, nVerts = 500, nEdges = 5000)
    val res = PageRank.run(spark, g, PageRank.Params(beta = 0.85, delta = 1e-6))
    val total = res.ranks.agg(sum(col("rank"))).first().getDouble(0)
    assert(math.abs(total - 1.0) < 1e-9)
    // vertex 0 receives the most skewed in-link mass by construction
    val top = PageRank.topK(res.ranks, 5).collect().map(_.getLong(0))
    assert(top.contains(0L), s"hub 0 missing from top-5: ${top.mkString(",")}")
  }
}
