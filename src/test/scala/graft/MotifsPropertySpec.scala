package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.graph.Motifs

/** ScalaCheck properties for the round-5 combinatorial operators: on
  * random inputs each must agree with a naive in-memory reference — the
  * strongest form of evidence that PassJoin's pigeonhole blocking and the
  * degree-ordered triangle orientation lose nothing.
  */
object MotifsProperties extends Properties("Motifs") {
  private lazy val spark = TestSpark.spark
  import Prop.forAll

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  /** Short random strings over a tiny alphabet (maximizes near-collisions
    * so the edit-distance property actually exercises matches, including
    * the ≤k residual bucket and cross-band lengths).
    */
  private val genDocs: Gen[List[String]] = for {
    m <- Gen.choose(2, 25)
    docs <- Gen.listOfN(m, for {
      len <- Gen.choose(0, 18)
      cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString)
  } yield docs

  private def naiveLev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(
        math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  property("editDistancePairs == naive all-pairs Levenshtein") =
    forAll(genDocs, Gen.choose(1, 5)) { (docs, k) =>
      import spark.implicits._
      val df = docs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("doc_id", "text")
      val got = Dedup.editDistancePairs(df, "doc_id", "text", prefixLen = 40, maxDist = k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val lower = docs.map(_.toLowerCase)
      val want = (for {
        i <- lower.indices; j <- lower.indices
        if i < j
        d = naiveLev(lower(i), lower(j))
        if d <= k
      } yield (i.toLong, j.toLong, d)).toSet
      Prop(got == want) :| s"k=$k missed=${(want -- got).take(3)} extra=${(got -- want).take(3)}"
    }

  /** Random half-open intervals (ids unique), some empty, lengths often
    * exceeding the bin width so multi-bin replication is exercised.
    */
  private val genIntervals: Gen[List[(Long, Long, Long)]] = for {
    m <- Gen.choose(0, 25)
    rows <- Gen.listOfN(m, for {
      s <- Gen.choose(-50L, 100L)
      len <- Gen.choose(0L, 40L)
    } yield (s, s + len))
  } yield rows.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }

  property("IntervalJoin.overlapPairs == naive overlap predicate, exactly once") =
    forAll(genIntervals, genIntervals, Gen.choose(1L, 15L)) { (ls, rs, width) =>
      import spark.implicits._
      val l = ls.toDF("ida", "a_start", "a_end")
      val r = rs.toDF("idb", "b_start", "b_end")
      val got = graft.ops.IntervalJoin
        .overlapPairs(l, r, "a_start", "a_end", "b_start", "b_end", width)
        .select("ida", "idb").as[(Long, Long)].collect().toList
      val want = for {
        (ida, as_, ae) <- ls
        (idb, bs, be) <- rs
        if as_ < be && bs < ae && ae > as_ && be > bs
      } yield (ida, idb)
      // set equality AND multiplicity 1 (the bin-attribution dedup)
      Prop(got.sorted == want.sorted) :|
        s"width=$width got=${got.size} want=${want.size}"
    }

  private val genEdges: Gen[List[(Int, Int)]] = for {
    n <- Gen.choose(2, 14)
    m <- Gen.choose(0, 40)
    edges <- Gen.listOfN(m, for {
      a <- Gen.choose(0, n - 1)
      b <- Gen.choose(0, n - 1)
    } yield (a, b))
  } yield edges

  property("triangleStats == naive triangle/wedge census") =
    forAll(genEdges) { edges =>
      import spark.implicits._
      val und = edges.collect { case (a, b) if a != b =>
        (math.min(a, b), math.max(a, b))
      }.toSet
      val adj = und.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      val verts = und.flatMap(e => Set(e._1, e._2))
      val deg = verts.map(v => v -> und.count(e => e._1 == v || e._2 == v)).toMap
      val wedges = deg.values.map(d => d.toLong * (d - 1) / 2).sum
      val triangles = (for {
        (a, b) <- und; c <- adj.getOrElse(b, Set.empty)
        if und.contains((a, c))
      } yield (a, b, c)).size.toLong

      if (edges.isEmpty || und.isEmpty) Prop(true)
      else {
        val row = Motifs.triangleStats(edges.toDF("src", "dst")).collect().head
        Prop(
          row.getAs[Long]("n_vertices") == verts.size.toLong &&
            row.getAs[Long]("n_edges") == und.size.toLong &&
            row.getAs[Long]("n_triangles") == triangles &&
            row.getAs[Long]("n_wedges") == wedges) :|
          s"got=$row want=(v=${verts.size}, e=${und.size}, t=$triangles, w=$wedges)"
      }
    }
}
