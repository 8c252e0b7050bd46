package graft

import graft.graph.{PageRank, PageRankGraphX}

/** GraphX scale path vs the DataFrame loop: identical semantics. */
class GraphXSpec extends SparkSpec {
  import spark.implicits._

  test("GraphX PageRank matches DataFrame loop on sf0.001 graph (L1 < 1e-9)") {
    val edges = Tables.lineitem(spark, Sf001)
      .select($"l_partkey".as("src"), $"l_suppkey".as("dst"))
      .distinct()
    val df = PageRank.run(spark, edges, PageRank.Params(delta = 1e-6))
    val gx = PageRankGraphX.run(spark, edges, PageRank.Params(delta = 1e-6))
    assert(df.iterations == gx.iterations,
      s"iterations: df=${df.iterations} gx=${gx.iterations}")
    val l1 = df.ranks.withColumnRenamed("rank", "r1")
      .join(gx.ranks.withColumnRenamed("rank", "r2"), "id")
      .selectExpr("sum(abs(r1 - r2)) AS l1")
      .collect().head.getDouble(0)
    assert(l1 < 1e-9, s"L1 divergence $l1")
  }

  test("GraphX matches DataFrame loop on WikiData (same iterations, L1 < 1e-9)") {
    val edges = PageRank.edgesFromText(spark, "/root/reference/WikiData.txt")
    val df = PageRank.run(spark, edges, PageRank.Params(beta = 0.85, delta = 1e-5))
    val gx = PageRankGraphX.run(spark, edges, PageRank.Params(beta = 0.85, delta = 1e-5))
    assert(df.iterations == gx.iterations)
    val l1 = df.ranks.withColumnRenamed("rank", "r1")
      .join(gx.ranks.withColumnRenamed("rank", "r2"), "id")
      .selectExpr("sum(abs(r1 - r2)) AS l1")
      .collect().head.getDouble(0)
    assert(l1 < 1e-9, s"L1 divergence $l1")
  }

  test("GraphX PageRank on two-cycle") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val res = PageRankGraphX.run(spark, edges)
    val m = res.ranks.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(m(1L) - 0.5) < 1e-6 && math.abs(m(2L) - 0.5) < 1e-6)
  }

  test("GraphX run leaks no persistent RDDs once the result is released") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    // WikiData's 13 iterations matter: each aggregateMessages round caches
    // a replicated-view EdgeRDD with no public handle (a shallow 1-2
    // iteration graph never exposes the per-iteration leak).
    val edges = PageRank.edgesFromText(spark, "/root/reference/WikiData.txt")
    val res = PageRankGraphX.run(spark, edges, PageRank.Params(delta = 1e-5))
    assert(res.ranks.count() > 0)
    // the result's own checkpoint backing is the only allowed new block set
    val during = sc.getPersistentRDDs.keySet -- before
    val backing = org.apache.spark.sql.graft.GraftInternals.checkpointRddIds(res.ranks)
    assert(during.subsetOf(backing),
      s"graphs left cached beyond the result backing: ${during -- backing}")
    res.release()
    assert((sc.getPersistentRDDs.keySet -- before).isEmpty,
      "release() must free the checkpoint backing")
  }
}
