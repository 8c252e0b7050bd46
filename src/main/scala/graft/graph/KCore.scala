package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded k-core peeling: `rounds` synchronized rounds of "drop every
  * vertex with degree < k, restrict edges to survivors" over an undirected
  * graph. After round r the survivor set equals the r-th prefix of the
  * classic peeling fixpoint — the same prefix an unrolled SQL oracle
  * computes — and once a round removes nothing the set IS the exact
  * k-core, so the loop stops early (further rounds are identities in both
  * engines; results stay hash-comparable). Standard degeneracy primitive
  * (Seidman 1983, "Network structure and minimum degree") for
  * graph-feature pipelines, in the same bounded-unroll style as
  * [[Motifs.kHopMinHops]] / [[ShortestPaths.bellmanFord]].
  *
  * Scale shape: per round one map-side-combinable degree aggregation plus
  * two left-semi joins against the survivor list (Catalyst/AQE picks
  * broadcast once survivors shrink below the threshold). The edge relation
  * is eagerly localCheckpoint'ed each round — a lazy r-level plan would
  * re-derive every prior peel — and superseded checkpoints are freed;
  * callers sweep the final one with the usual persistent-RDD sweep.
  *
  * Perf note (r7 "regression" adjudicated r8): the bench flagged
  * g7_kcore at 1.14 s isolated vs 0.67 s the round before. Bisect:
  * the round-6 TREE rebuilt under the identical fresh-JVM QBench
  * harness shows the same ~1.2 s floor (walls 1.18-1.46 across 9 warm
  * runs, both trees) — nothing regressed; the 0.67 s was an in-session
  * min inside a long-running bench JVM whose JIT state a 3-run fresh
  * JVM never reaches. The many-small-stage peeling loop is the most
  * JIT-sensitive shape in the suite; compare like with like.
  */
object KCore {

  /** `edges`: directed pair list, symmetrized + deduped here (self-loops
    * dropped — a self-loop would let an otherwise-isolated vertex count
    * itself toward k). Returns surviving (id, degree) with the degree
    * measured inside the surviving subgraph.
    */
  def kCore(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1, s"k-core needs k >= 1; got k=$k")
    require(rounds >= 1 && rounds <= 12,
      s"kCore unrolls `rounds` plan levels; got rounds=$rounds")
    // Canonical-orientation dedup + mirror: see Undirected.symmetrize for
    // the halved-shuffle rationale.
    var e = Undirected.symmetrize(edges).localCheckpoint(true)
    var nEdges = e.count()
    var done = false
    // Loop shuffle sizing + AQE off (loopPartitions / withLoopConf, the
    // PageRank/CC/LPA idiom): each peel round is one degree aggregation
    // + two anti-joins + a checkpoint block-write; at the session's
    // partition count those per-round fixed costs scale with cores while
    // the work doesn't (the r18 scaling block's anti-scaling class).
    // Exact integer degrees/anti-joins — partition-count-independent.
    val spark = edges.sparkSession
    PageRank.withLoopConf(spark, PageRank.loopPartitions(spark, nEdges)) {
    for (_ <- 1 to rounds if !done) {
      // Peel via the DROPPED set, not the keep set: after the first round
      // a peel wave removes few vertices, so the anti-join side is tiny
      // and AQE broadcasts it — each late round becomes two shuffle-free
      // scans of the persisted survivors instead of two 200k-row
      // semi-join shuffles (measured 1.8× on the 2M-edge power-law probe,
      // AbGraphOps).
      val dropped = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") < k)
        .select(col("src").as("v"))
      val next = e
        .join(dropped, e("src") === dropped("v"), "left_anti")
        .join(dropped.select(col("v").as("v2")), e("dst") === col("v2"), "left_anti")
        // LAZY: the count below materializes it, before the parent
        // checkpoint is freed (PageRank.run idiom — one job per round).
        .localCheckpoint(false)
      val nNext = next.count()
      org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint(e)
      e = next
      done = nNext == nEdges // no vertex dropped → exact k-core reached
      nEdges = nNext
    }
    } // withLoopConf
    e.groupBy(col("src").as("id")).agg(count(lit(1)).as("degree"))
  }
}
