package graft

/** graph.Scc: crafted shapes plus a randomized property against a naive
  * reachability-closure reference (the [[LpaPropertySpec]] pattern —
  * the distributed loop must equal straight-line rule execution).
  */
class SccSpec extends SparkSpec {
  import spark.implicits._

  private def sccOf(edges: Seq[(Long, Long)]): Map[Long, Long] =
    graft.graph.Scc.run(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Naive reference: transitive closure by saturation, then
    * scc_id(v) = min{u : u = v, or mutually reachable}.
    */
  private def naive(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val es = edges.filter(e => e._1 != e._2).distinct
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct
    val reach = scala.collection.mutable.Set[(Long, Long)]() ++ es
    var grew = true
    while (grew) {
      grew = false
      for ((a, b) <- reach.toSeq; (c, d) <- reach.toSeq
           if b == c && !reach.contains((a, d))) {
        reach += ((a, d)); grew = true
      }
    }
    nodes.map { v =>
      v -> nodes.filter(u =>
        u == v || (reach((v, u)) && reach((u, v)))).min
    }.toMap
  }

  test("two cycles joined one-way stay separate components") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L),
      (4L, 5L), (5L, 6L), (6L, 4L))
    assert(sccOf(e) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 4L))
  }

  test("a DAG is all singletons — direction matters vs undirected CC") {
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    assert(sccOf(e) == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L))
  }

  test("nested colors need multiple outer rounds (satellite below the giant)") {
    // 0 feeds the 1-2-3 cycle one-way: round 1 emits {0}, round 2 the
    // cycle — exercises the remove-and-iterate path.
    val e = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 1L))
    assert(sccOf(e) == Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("randomized: distributed SCC equals the naive closure reference") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val n = 8 + rnd.nextInt(5)
      val edges = (1 to n * 2)
        .map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2).distinct
      if (edges.nonEmpty)
        assert(sccOf(edges) == naive(edges), s"trial $trial, edges $edges")
    }
  }

  test("empty edge list yields an empty relation, not a crash") {
    assert(graft.graph.Scc.run(
      Seq.empty[(Long, Long)].toDF("src", "dst")).count() == 0)
  }
}
