package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint

/** Strongly connected components of a DIRECTED graph — the directed
  * counterpart of [[ConnectedComponents]] (whose min-label propagation is
  * blind to edge direction). Algorithm: iterative forward-min coloring +
  * color-restricted backward reachability (the coloring SCC of Orzan 2004,
  * the shape graph systems use where Tarjan's stack is unavailable):
  *
  *   1. color(v) = min vertex id with a forward path to v (label
  *      propagation to fixpoint — bounded, driver-checked);
  *   2. every color c is rooted at c itself (anything reaching c reaches
  *      all of c's class, so the class minimum is its own color); the
  *      vertices that reach BACK to their root within their color class
  *      are exactly SCC(root) — a path between two SCC members never
  *      leaves the component, hence never leaves the color;
  *   3. emit all roots' components (every color processed in the same
  *      round — the backward BFS carries (vertex, color) pairs), remove
  *      them, repeat on the remainder.
  *
  * Returns (id, scc_id) with scc_id = the component's minimum vertex id —
  * the same representative convention as [[ConnectedComponents]], so the
  * two are directly comparable on a symmetrized graph.
  *
  * Scale shape: each coloring step is one edge join + one min-combinable
  * aggregation; the backward BFS joins a frontier that starts at
  * |roots| and is bounded by the round's output. Everything is keyed on
  * vertex id (AQE broadcasts shrinking frontiers); per-round relations are
  * eagerly checkpointed and superseded checkpoints freed, the
  * [[KCore]]/[[ShortestPaths]] loop hygiene. Outer rounds are bounded and
  * FAIL FAST when exceeded (the [[ShortestPaths]] contract — a silent
  * partial answer is worse than an error): rounds needed = nesting depth
  * of min-reachability, small for real graphs.
  */
object Scc {

  def run(edges: DataFrame, maxRounds: Int = 12, maxProp: Int = 40): DataFrame = {
    require(maxRounds >= 1 && maxProp >= 1)
    val spark = edges.sparkSession
    var e = edges
      .select(col(edges.columns(0)).as("src"), col(edges.columns(1)).as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(true)
    // Loop shuffle sizing + AQE off, the PageRank/CC/LPA idiom
    // (loopPartitions / withLoopConf): this fixpoint runs O(rounds ×
    // propagation steps) tiny jobs, and at the session's partition count
    // every per-step shuffle, checkpoint block-write and AQE replan
    // round-trip scales with cores while the work doesn't — the r18
    // driver's scaling block measured the un-bounded fixpoints running
    // SLOWER at 32 cores than at 8 (g13 ratio 0.33). Exact integer
    // min-labels: results are partition-count-independent.
    PageRank.withLoopConf(spark, PageRank.loopPartitions(spark, e.count())) {
    var verts = e.select(col("src").as("id"))
      .unionAll(e.select(col("dst").as("id")))
      .distinct()
      .localCheckpoint(true)
    var result: DataFrame = null
    var remaining = verts.count()
    var round = 0
    while (remaining > 0 && round < maxRounds) {
      round += 1
      // -- 1. forward min-label coloring to fixpoint ---------------------
      var color = verts.select(col("id"), col("id").as("c")).localCheckpoint(true)
      var changed = 1L
      var prop = 0
      while (changed > 0) {
        prop += 1
        require(prop <= maxProp,
          s"SCC coloring did not converge within $maxProp propagation steps")
        val msgs = e.join(color, col("src") === col("id"))
          .select(col("dst").as("id"), col("c"))
        val next = color.unionAll(msgs)
          .groupBy(col("id")).agg(min(col("c")).as("c"))
          // LAZY: the changed-count below is the step's first action and
          // runs BEFORE the parent color checkpoint is freed — one job
          // computes the step and materializes it (PageRank.run idiom).
          .localCheckpoint(false)
        changed = next
          .join(color.select(col("id"), col("c").as("c0")), "id")
          .filter(col("c") =!= col("c0")).count()
        freeLocalCheckpoint(color)
        color = next
      }
      // -- 2. backward reachability to the root, within each color -------
      // Reversed, color-restricted edge list: walk dst→src where both
      // endpoints share a color.
      val ec = e
        .join(color.select(col("id").as("src"), col("c").as("cs")), "src")
        .join(color.select(col("id").as("dst"), col("c").as("cd")), "dst")
        .filter(col("cs") === col("cd"))
        .select(col("dst").as("from"), col("src").as("to"), col("cs").as("c"))
        .localCheckpoint(true)
      var frontier = color.filter(col("id") === col("c")).localCheckpoint(true)
      var spent = List(frontier)
      var members = frontier
      var grew = 1L
      var steps = 0
      while (grew > 0) {
        steps += 1
        require(steps <= maxProp,
          s"SCC backward sweep did not converge within $maxProp steps")
        val next = ec
          .join(frontier.select(col("id").as("from"), col("c")), Seq("from", "c"))
          .select(col("to").as("id"), col("c"))
          .distinct()
          .join(members, Seq("id", "c"), "left_anti")
          // LAZY: grew's count materializes it; every parent checkpoint
          // (ec, the spent frontiers) stays live until after the loop.
          .localCheckpoint(false)
        grew = next.count()
        members = members.unionAll(next) // lazy union over checkpoints
        spent ::= next
        frontier = next
      }
      val found = members.select(col("id"), col("c").as("scc_id"))
        .localCheckpoint(true)
      spent.foreach(freeLocalCheckpoint)
      freeLocalCheckpoint(ec)
      result = if (result == null) found else result.unionAll(found)
      // -- 3. remove the emitted components, iterate on the rest ---------
      val nextVerts = verts
        .join(found.select(col("id")), Seq("id"), "left_anti")
        .localCheckpoint(true)
      val nextE = e
        .join(found.select(col("id").as("src")), Seq("src"), "left_anti")
        .join(found.select(col("id").as("dst")), Seq("dst"), "left_anti")
        .localCheckpoint(true)
      freeLocalCheckpoint(verts)
      freeLocalCheckpoint(e)
      freeLocalCheckpoint(color)
      verts = nextVerts
      e = nextE
      remaining = verts.count()
    }
    require(remaining == 0,
      s"SCC did not finish within $maxRounds rounds; $remaining vertices left")
    if (result == null) {
      // No edges → no vertices (the graph is defined by its edge list):
      // an empty (id, scc_id) relation, backed by the empty checkpoints.
      result = verts.select(col("id"), col("id").as("scc_id"))
    } else {
      freeLocalCheckpoint(verts)
      freeLocalCheckpoint(e)
    }
    result
    } // withLoopConf
  }
}
