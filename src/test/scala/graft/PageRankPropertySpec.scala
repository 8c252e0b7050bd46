package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import graft.graph.PageRank

/** ScalaCheck properties (FIXTURES.md §2): for random graphs and random β,
  * the renormalizing fixpoint keeps Σrank = 1, all ranks positive, and is
  * invariant under edge-order permutation.
  */
object PageRankProperties extends Properties("PageRank") {
  private lazy val spark = TestSpark.spark
  import Prop.forAll

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private val genEdges: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(2, 12)
    m <- Gen.choose(1, 30)
    edges <- Gen.listOfN(m, for {
      a <- Gen.choose(1L, n.toLong)
      b <- Gen.choose(1L, n.toLong)
    } yield (a, b))
  } yield edges.distinct.filter { case (a, b) => a != b }

  private def toDF(edges: List[(Long, Long)]) = {
    import spark.implicits._
    edges.toDF("src", "dst")
  }

  property("sum-to-1, positivity, convergence") =
    forAll(genEdges, Gen.choose(0.5, 0.95)) { (edges, beta) =>
      edges.isEmpty || {
        val res = PageRank.run(spark, toDF(edges),
          PageRank.Params(beta = beta, delta = 1e-7, maxIter = 200))
        val ranks = res.ranks.collect().map(_.getDouble(1))
        math.abs(ranks.sum - 1.0) < 1e-9 &&
          ranks.forall(_ > 0.0) &&
          (res.finalDelta <= 1e-7 || res.iterations == 200)
      }
    }

  property("edge-order permutation invariance") = forAll(genEdges) { edges =>
    edges.size <= 1 || {
      val p = PageRank.Params(delta = 1e-8, maxIter = 200)
      val a = PageRank.run(spark, toDF(edges), p)
        .ranks.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val b = PageRank.run(spark, toDF(edges.reverse), p)
        .ranks.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      a.keySet == b.keySet &&
        a.forall { case (k, v) => math.abs(v - b(k)) < 1e-9 }
    }
  }
}
