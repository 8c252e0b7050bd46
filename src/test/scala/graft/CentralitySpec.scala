package graft

/** graph.Centrality.pathLoad: crafted shapes plus a randomized property
  * against a naive per-seed BFS/path-count reference.
  */
class CentralitySpec extends SparkSpec {
  import spark.implicits._

  private def loadOf(edges: Seq[(Long, Long)], seeds: Seq[Long], k: Int)
      : Map[Long, Long] =
    graft.graph.Centrality.pathLoad(
        edges.toDF("src", "dst"), seeds.toDF("id"), k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Naive reference: per seed, BFS levels; σ by level sums; ψ (suffix
    * counts over the shortest-path DAG) backward; load = σ·(ψ−1).
    */
  private def naive(edges: Seq[(Long, Long)], seeds: Seq[Long], k: Int)
      : Map[Long, Long] = {
    val es = edges.filter(e => e._1 != e._2).distinct
    val out = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    val reached = scala.collection.mutable.Set[Long]()
    for (s <- seeds.distinct) {
      var levels = Vector(Map(s -> 1L))
      var visited = Set(s)
      for (_ <- 1 to k) {
        val cur = levels.last
        val nxt = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
        for ((u, sig) <- cur; (a, b) <- es if a == u && !visited.contains(b))
          nxt(b) += sig
        levels :+= nxt.toMap
        visited ++= nxt.keySet
      }
      val psi = Array.fill(k + 1)(Map.empty[Long, Long])
      psi(k) = levels(k).map { case (v, _) => v -> 1L }
      for (d <- (k - 1) to 0 by -1)
        psi(d) = levels(d).map { case (v, _) =>
          v -> (1L + es.collect {
            case (a, b) if a == v && psi(d + 1).contains(b) => psi(d + 1)(b)
          }.sum)
        }
      for (d <- 1 to k; (v, sig) <- levels(d)) {
        out(v) += sig * (psi(d)(v) - 1L)
        reached += v
      }
    }
    reached.map(v => v -> out(v)).toMap
  }

  test("diamond: the two middle vertices each carry one through-path") {
    // s=1 → {2,3} → 4: σ(4)=2; loads: 2↦1, 3↦1, 4↦0.
    val e = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L))
    assert(loadOf(e, Seq(1L), 2) == Map(2L -> 1L, 3L -> 1L, 4L -> 0L))
  }

  test("chain: every interior vertex counts its downstream suffixes") {
    // 1→2→3→4, k=3: load(2)=ψ(2)−1=2, load(3)=1, load(4)=0.
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    assert(loadOf(e, Seq(1L), 3) == Map(2L -> 2L, 3L -> 1L, 4L -> 0L))
  }

  test("multiple seeds accumulate per-vertex") {
    val e = Seq((1L, 3L), (2L, 3L), (3L, 4L))
    // From 1: 3↦1·1, 4↦0. From 2: 3↦1·1, 4↦0. From 4: nothing reachable.
    assert(loadOf(e, Seq(1L, 2L, 4L), 2) == Map(3L -> 2L, 4L -> 0L))
  }

  test("randomized: distributed sweep equals the naive per-seed reference") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val n = 7 + rnd.nextInt(5)
      val edges = (1 to n * 2)
        .map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2).distinct
      val seeds = Seq(0L, 1L, 2L).filter(s => edges.exists(e => e._1 == s))
      if (edges.nonEmpty && seeds.nonEmpty) {
        val got = loadOf(edges, seeds, 3)
        val exp = naive(edges, seeds, 3)
        assert(got == exp, s"trial $trial, edges $edges, seeds $seeds")
      }
    }
  }
}
