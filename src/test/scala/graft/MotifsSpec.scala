package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.graph.{Motifs, SyntheticGraph}

/** Semantics of the graph-motif operators (triangle census, bounded-hop
  * BFS) and the edit-distance near-dup pass: closed-form fixtures plus a
  * brute-force cross-check on a synthetic power-law graph.
  */
class MotifsSpec extends SparkSpec {
  import spark.implicits._

  test("triangle census: K4 plus a pendant edge") {
    // K4 on {1,2,3,4} (4 triangles) + pendant 5-1. Degrees (4,3,3,3,1):
    // wedges = 6+3+3+3 = 15, transitivity = 3*4/15 = 0.8. Edges fed as a
    // messy multigraph (duplicates, both directions, self-loop) to prove
    // normalization.
    val edges = Seq(
      (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
      (2, 1), (4, 3), (1, 1), (5, 1)
    ).toDF("src", "dst")
    val row = Motifs.triangleStats(edges).collect().head
    assert(row.getAs[Long]("n_vertices") == 5L)
    assert(row.getAs[Long]("n_edges") == 7L)
    assert(row.getAs[Long]("n_triangles") == 4L)
    assert(row.getAs[Long]("n_wedges") == 15L)
    assert(math.abs(row.getAs[Double]("transitivity") - 0.8) < 1e-9)
  }

  test("triangle census: empty and self-loop-only graphs report zeros, not nulls") {
    val selfOnly = Seq((7, 7)).toDF("src", "dst")
    val row = Motifs.triangleStats(selfOnly).collect().head
    assert(row.getAs[Long]("n_vertices") == 0L)
    assert(row.getAs[Long]("n_edges") == 0L)
    assert(row.getAs[Long]("n_triangles") == 0L)
    assert(row.getAs[Long]("n_wedges") == 0L)
    assert(row.getAs[Double]("transitivity") == 0.0)
  }

  test("triangle census: triangle-free graphs report zero") {
    val star = Seq((0, 1), (0, 2), (0, 3), (0, 4)).toDF("a", "b")
    val row = Motifs.triangleStats(star).collect().head
    assert(row.getAs[Long]("n_triangles") == 0L)
    assert(row.getAs[Long]("n_wedges") == 6L)
    assert(row.getAs[Double]("transitivity") == 0.0)
  }

  test("hub salting: crafted hub graph splits wedge keys, count unchanged") {
    // Vertex 0 ("h") links 100 heavies (ids 1..100); each heavy also links
    // 101 private fillers, so deg(heavy) ≥ 103 > deg(h) = 100 and ALL h
    // edges orient h→heavy: h's oriented out-degree is 100 — a wedge hub.
    // Consecutive heavies are linked, closing exactly 99 triangles at h.
    val hEdges = (1 to 100).map(i => (0L, i.toLong))
    val chain = (1 until 100).map(i => (i.toLong, (i + 1).toLong))
    val fillers = for {
      i <- 1 to 100; j <- 0 until 101
    } yield (i.toLong, 1000L + i * 200L + j)
    val edges = (hEdges ++ chain ++ fillers).toDF("src", "dst")

    // Correctness under forced splitting (threshold 16 → B = ⌈100/16⌉ = 7
    // buckets for h): identical census to the unsalted-path default.
    val salted = Motifs.triangleStats(edges, hubSplitThreshold = 16L).collect().head
    assert(salted.getAs[Long]("n_triangles") == 99L)
    val default = Motifs.triangleStats(edges).collect().head
    assert(default.getAs[Long]("n_triangles") == 99L)

    // Bounded per-key wedge loads: no (u, bx, by) join key may carry more
    // than ~threshold² candidate pairs (4× slack for hash imbalance), and
    // the hub's wedges must actually spread across many keys.
    val (degRel, oriented) = Motifs.orientedGraph(edges)
    val (x, y) = Motifs.saltedWedgeSides(oriented, threshold = 16L)
    val loadX = x.groupBy(col("u"), col("bx"), col("by")).count()
      .select(col("u"), col("bx"), col("by"), col("count").as("nx"))
    val loadY = y.groupBy(col("u"), col("bx"), col("by")).count()
      .select(col("u"), col("bx"), col("by"), col("count").as("ny"))
    val keyPairs = loadX.join(loadY, Seq("u", "bx", "by"))
      .select(col("u"), (col("nx") * col("ny")).as("pairs"))
    val maxPairs = keyPairs.agg(max(col("pairs"))).head().getLong(0)
    assert(maxPairs <= 4L * 16L * 16L, s"maxPairs=$maxPairs")
    val hubKeys = keyPairs.filter(col("u") === 0L).count()
    assert(hubKeys >= 40L, s"hub wedges spread over only $hubKeys keys")
    org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint(oriented)
    org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint(degRel)
  }

  test("triangle count matches brute-force enumeration on a power-law graph") {
    val g = SyntheticGraph.powerLaw(spark, 120L, 900L).cache()
    val und = g.select(
      least(col("src"), col("dst")).as("a"),
      greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b")).distinct().cache()
    // Brute force: ordered triples a<b<c with all three edges present.
    val e1 = und.select(col("a").as("x"), col("b").as("y"))
    val e2 = und.select(col("a").as("y"), col("b").as("z"))
    val e3 = und.select(col("a").as("x"), col("b").as("z"))
    val brute = e1.join(e2, "y").join(e3, Seq("x", "z")).count()
    val stats = Motifs.triangleStats(g).collect().head
    assert(stats.getAs[Long]("n_triangles") == brute,
      s"degree-oriented count ${stats.getAs[Long]("n_triangles")} != brute $brute")
    g.unpersist(); und.unpersist()
  }

  test("local clustering: K4 + pendant closed-form coefficients") {
    // K4 {1,2,3,4} + pendant 5-1: vertex 1 sits in 3 triangles with
    // degree 4 → c = 6/12 = 0.5; vertices 2,3,4 in 3 triangles at degree
    // 3 → c = 1.0; pendant 5 has degree 1 → c = 0.
    val edges = Seq(
      (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (5, 1)
    ).toDF("src", "dst")
    val got = Motifs.localClustering(edges).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(1) == ((4L, 3L, 0.5)))
    assert(got(2) == ((3L, 3L, 1.0)) && got(3) == ((3L, 3L, 1.0)) && got(4) == ((3L, 3L, 1.0)))
    assert(got(5) == ((1L, 0L, 0.0)))
    // Consistency with the global census: Σ n_tri = 3 × triangles.
    val global = Motifs.triangleStats(edges).collect().head.getAs[Long]("n_triangles")
    assert(got.values.map(_._2).sum == 3 * global)
  }

  test("k-hop BFS labels minimum hop counts on a path, unreached absent") {
    val edges = Seq((1, 2), (2, 3), (3, 4), (4, 5)).toDF("src", "dst")
    val seeds = Seq(1).toDF("id")
    val out = Motifs.kHopMinHops(edges, seeds, 3).collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(out == Map(1 -> 0, 2 -> 1, 3 -> 2, 4 -> 3)) // 5 is 4 hops away
  }

  test("k-hop BFS: diamond converges to one row at the MIN level") {
    // 1→2→4 and 1→3→4: vertex 4 is reachable twice at hop 2 — exactly one
    // row, hops = 2; plus a direct shortcut 1→4 must pull it to hop 1.
    val base = Seq((1, 2), (1, 3), (2, 4), (3, 4)).toDF("src", "dst")
    val seeds = Seq(1).toDF("id")
    val twoPaths = Motifs.kHopMinHops(base, seeds, 3)
      .filter(col("id") === 4).collect()
    assert(twoPaths.length == 1 && twoPaths.head.getInt(1) == 2)
    val shortcut = Motifs.kHopMinHops(
      base.unionAll(Seq((1, 4)).toDF("src", "dst")), seeds, 3)
      .filter(col("id") === 4).collect()
    assert(shortcut.length == 1 && shortcut.head.getInt(1) == 1)
  }

  test("k-hop BFS: seeds outside the graph stay at hop 0, no expansion") {
    val edges = Seq((1, 2)).toDF("src", "dst")
    val out = Motifs.kHopMinHops(edges, Seq(99).toDF("id"), 2).collect()
    assert(out.length == 1 && out.head.getInt(0) == 99 && out.head.getInt(1) == 0)
  }

  test("edit-distance pairs: banding reaches every pair exactly once") {
    val docs = Seq(
      (1L, "the quick brown fox"),   // dist(1,2)=1 (k->l), same band
      (2L, "the quick brown fol"),
      (3L, "the quick brown foxes"), // dist(1,3)=2, len +2 — adjacent band reach
      (4L, "completely different text entirely"), // far from all
      (5L, "the quick brown fox")    // exact dup of 1 — dist 0
    ).toDF("doc_id", "text")
    val out = Dedup.editDistancePairs(docs, "doc_id", "text", prefixLen = 40, maxDist = 5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(out == Map(
      (1L, 2L) -> 1, (1L, 3L) -> 2, (1L, 5L) -> 0,
      (2L, 3L) -> 3, (2L, 5L) -> 1, (3L, 5L) -> 2))
    // exactly once: the Map build above would have lost duplicates silently
    val rows = Dedup.editDistancePairs(docs, "doc_id", "text", 40, 5).count()
    assert(rows == 6L)
  }

  test("edit-distance pairs: PassJoin blocking ≡ banded baseline on the corpus") {
    val docs = Tables.documents(spark, Sf001)
    val pass = Dedup.editDistancePairs(docs, "doc_id", "text", 40, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val band = Dedup.editDistancePairsBanded(docs, "doc_id", "text", 40, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pass == band,
      s"missed=${(band -- pass).take(5)} extra=${(pass -- band).take(5)}")
    assert(pass.nonEmpty) // the corpus carries near-dups by construction
  }

  test("edit-distance pairs: short strings (≤ k) still pair via the residual bucket") {
    val docs = Seq((1L, "ab"), (2L, "ba"), (3L, "abcdefgh")).toDF("doc_id", "text")
    val out = Dedup.editDistancePairs(docs, "doc_id", "text", 40, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.contains((1L, 2L))) // dist 2, both below the segment minimum
  }

  test("edit-distance pairs: length-band invariant excludes |Δlen| > k") {
    val docs = Seq(
      (1L, "aaaa"),
      (2L, "aaaaaaaaaa") // Δlen = 6 > 5 ⇒ dist ≥ 6, must not appear
    ).toDF("doc_id", "text")
    assert(Dedup.editDistancePairs(docs, "doc_id", "text", 40, 5).count() == 0L)
  }
}
