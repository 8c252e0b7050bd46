package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import graft.graph.LabelPropagation

/** ScalaCheck property for label propagation: on random multigraphs (with
  * self-loops and duplicate/reversed edges) the distributed loop must
  * agree vertex-for-vertex with a naive in-memory execution of the same
  * deterministic rule, at every bounded depth.
  */
object LpaProperties extends Properties("LabelPropagation") {
  private lazy val spark = TestSpark.spark
  import Prop.forAll

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  /** Small dense-ish random graphs: few vertices so communities collide
    * and ties (the risky path: count ties broken by smallest label) occur
    * often; self-loops and duplicates included deliberately.
    */
  private val genEdges: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(2, 10)
    m <- Gen.choose(1, 30)
    edges <- Gen.listOfN(m, for {
      a <- Gen.choose(0L, n.toLong)
      b <- Gen.choose(0L, n.toLong)
    } yield (a, b))
  } yield edges

  private def naive(edges: List[(Long, Long)], rounds: Int): Map[Long, Long] =
    LpaReference.naive(edges, rounds)

  property("run == naive same-rule execution on random multigraphs") =
    forAll(genEdges, Gen.choose(1, 3)) { (edges, rounds) =>
      import spark.implicits._
      val und = edges.filter { case (a, b) => a != b }
      if (und.isEmpty) {
        LabelPropagation.run(edges.toDF("src", "dst"), rounds).count() == 0L
      } else {
        val got = LabelPropagation.run(edges.toDF("src", "dst"), rounds)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        got == naive(edges, rounds)
      }
    }
}
