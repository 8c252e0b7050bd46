package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import graft.graph.ShortestPaths

/** ScalaCheck property for the bounded Bellman-Ford: on random weighted
  * digraphs the frontier-optimized DataFrame loop must equal a naive
  * in-memory full relaxation — the proof that relaxing only improved
  * vertices loses no ≤r-edge path.
  */
object ShortestPathsProperties extends Properties("ShortestPaths") {
  private lazy val spark = TestSpark.spark
  import Prop.forAll

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private val genGraph: Gen[(List[(Long, Long, Double)], List[Long], Int)] = for {
    n <- Gen.choose(2, 12)
    m <- Gen.choose(1, 30)
    edges <- Gen.listOfN(m, for {
      s <- Gen.choose(0L, n - 1L)
      t <- Gen.choose(0L, n - 1L)
      w <- Gen.choose(1, 9)
    } yield (s, t, w.toDouble))
    nSeeds <- Gen.choose(1, 3)
    seeds <- Gen.listOfN(nSeeds, Gen.choose(0L, n - 1L))
    rounds <- Gen.choose(1, 5)
  } yield (edges, seeds, rounds)

  private def naive(
      edges: List[(Long, Long, Double)],
      seeds: List[Long],
      rounds: Int): Map[Long, Double] = {
    var dist = seeds.distinct.map(_ -> 0.0).toMap
    for (_ <- 1 to rounds) {
      val cand = edges.flatMap { case (s, t, w) => dist.get(s).map(d => t -> (d + w)) }
      dist = (dist.toSeq ++ cand).groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).min }
    }
    dist
  }

  property("bellmanFord == naive full relaxation") =
    forAll(genGraph) { case (edges, seeds, rounds) =>
      import spark.implicits._
      val e = edges.toDF("src", "dst", "w")
      val s = seeds.toDF("id")
      val df = ShortestPaths.bellmanFord(e, s, rounds)
      val got = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint(df)
      val want = naive(edges, seeds, rounds)
      Prop(got == want) :| s"got=$got want=$want"
    }

  property("empty edges → seeds only; disconnected seeds stay at 0") =
    Prop {
      import spark.implicits._
      val e = Seq.empty[(Long, Long, Double)].toDF("src", "dst", "w")
      val df = ShortestPaths.bellmanFord(e, Seq(7L, 7L, 9L).toDF("id"), 3)
      val got = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint(df)
      got == Map(7L -> 0.0, 9L -> 0.0)
    }

  property("rejects non-positive rounds and FAILS on non-positive weights") =
    Prop {
      import spark.implicits._
      val zeroRejected =
        try {
          ShortestPaths.bellmanFord(
            Seq((0L, 1L, 3.0)).toDF("src", "dst", "w"), Seq(0L).toDF("id"), 0)
          false
        } catch { case _: IllegalArgumentException => true }
      // w > 0 is enforced fail-fast (like PageRank.weightedFixedIterations):
      // a silent drop would report vertex 1 as unreachable-with-no-signal if
      // the -5 edge were its only path.
      val badRejected =
        try {
          ShortestPaths.bellmanFord(
            Seq((0L, 1L, -5.0), (0L, 1L, 3.0)).toDF("src", "dst", "w"),
            Seq(0L).toDF("id"), 2)
          false
        } catch { case _: IllegalArgumentException => true }
      val df = ShortestPaths.bellmanFord(
        Seq((0L, 1L, 3.0)).toDF("src", "dst", "w"), Seq(0L).toDF("id"), 2)
      val got = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint(df)
      zeroRejected && badRejected && got == Map(0L -> 0.0, 1L -> 3.0)
    }
}
