package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import graft.graph.KCore

/** ScalaCheck property for bounded k-core peeling: on random digraphs the
  * DataFrame loop (with its early stop) must equal a naive in-memory peel
  * run for the full round budget — identity rounds after the fixpoint make
  * the two coincide.
  */
object KCoreProperties extends Properties("KCore") {
  private lazy val spark = TestSpark.spark
  import Prop.forAll

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private val genGraph: Gen[(List[(Long, Long)], Int, Int)] = for {
    n <- Gen.choose(2, 12)
    m <- Gen.choose(1, 40)
    edges <- Gen.listOfN(m, for {
      s <- Gen.choose(0L, n - 1L)
      t <- Gen.choose(0L, n - 1L)
    } yield (s, t))
    k <- Gen.choose(1, 4)
    rounds <- Gen.choose(1, 6)
  } yield (edges, k, rounds)

  private def naive(
      edges: List[(Long, Long)], k: Int, rounds: Int): Map[Long, Long] = {
    var und = edges.filter { case (s, t) => s != t }
      .flatMap { case (s, t) => List((s, t), (t, s)) }.distinct
    for (_ <- 1 to rounds) {
      val deg = und.groupBy(_._1).map { case (v, es) => v -> es.size }
      val keep = deg.filter(_._2 >= k).keySet
      und = und.filter { case (s, t) => keep(s) && keep(t) }
    }
    und.groupBy(_._1).map { case (v, es) => v -> es.size.toLong }
  }

  property("empty / self-loop-only graphs peel to empty, not crash") =
    Prop {
      import spark.implicits._
      val empty = KCore.kCore(
        Seq.empty[(Long, Long)].toDF("src", "dst"), k = 2, rounds = 3)
      val loops = KCore.kCore(
        Seq((1L, 1L), (2L, 2L)).toDF("src", "dst"), k = 1, rounds = 3)
      val (a, b) = (empty.count(), loops.count())
      org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint(empty)
      org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint(loops)
      a == 0L && b == 0L
    }

  property("kCore == naive bounded peel") =
    forAll(genGraph) { case (edges, k, rounds) =>
      import spark.implicits._
      val df = KCore.kCore(edges.toDF("src", "dst"), k, rounds)
      val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint(df)
      val want = naive(edges, k, rounds)
      Prop(got == want) :| s"got=$got want=$want"
    }
}
