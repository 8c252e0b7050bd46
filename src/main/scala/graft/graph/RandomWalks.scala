package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Deterministic seeded random walks — the corpus generator for
  * embedding-style graph training data (DeepWalk, Perozzi et al. KDD'14 /
  * node2vec, Grover & Leskovec KDD'16, with p=q=1 uniform transitions).
  *
  * Instead of an RNG, each step picks the neighbor minimizing the
  * engine-portable draw `md5(walk_id ':' step ':' cur ':' dst)`
  * ([[graft.ops.Portable.md5Long]], ties broken by dst) — for a uniform
  * hash this IS a uniform choice among the neighbors, yet the walk is a
  * pure function of (graph, walk_id, step), so reruns are byte-identical,
  * a DuckDB oracle reproduces every transition, and a resumed/retried
  * task regenerates the same corpus — the reproducibility property a
  * training pipeline actually wants from its walk generator.
  *
  * The per-step argmin is duplicate-insensitive (min over a multiset),
  * so the edge relation needs NO dedup shuffle — same trick as the g4
  * BFS. Two execution shapes, both producing identical output
  * (spec-asserted):
  *
  *  - `walk` (frontier-broadcast): each step joins the |walks|-row
  *    frontier by broadcast against the edge relation — edges are never
  *    shuffled at all. Right while total frontier bytes stay
  *    driver/broadcast-sized (≲ millions of walks).
  *  - `walkShuffled` (co-partitioned): the edge relation is persisted
  *    hash-partitioned by src ONCE (the PageRank.prepare / LPA idiom),
  *    and each step's join exchanges only the |walks|-row frontier onto
  *    that fixed layout. On local[32] the broadcast shape wins every
  *    measured point up to 2M concurrent walks (AbWalkScale: 44.8 s vs
  *    193.0 s at 2M — local "broadcast" is a free shared hash table);
  *    this shape exists for the ceiling a CLUSTER hits: ~75 B/walk of
  *    broadcast hash table replicated to every executor per step and
  *    built through one node (100M walks ≈ 7.5 GB against the 8 GB
  *    broadcast cap × the fleet's network). Hub skew stays bounded in
  *    both shapes because a walk contributes exactly ONE frontier row
  *    per step (no wedge-style expansion).
  *
  * Returns (walk_id, step, node): steps 0..steps, step 0 = the seed.
  * Dead-end walks (no out-edge) simply stop early — their later steps
  * are absent, not null.
  */
object RandomWalks {

  /** @param edges (src, dst) directed edge relation; pass both directions
    *              for an undirected walk
    * @param seeds one column `id`; one walk starts per (seed, walk index)
    * @param steps number of transitions (output has up to steps+1 rows
    *              per walk)
    * @param nWalks walks per seed, distinguished in the hash by the
    *               walk_id suffix `#i`
    */
  def walk(edges: DataFrame, seeds: DataFrame, steps: Int, nWalks: Int = 1): DataFrame = {
    val (walkIds, e) = prepare(edges, seeds, steps, nWalks)
    var frontier = walkIds
    var out = frontier.select(col("walk_id"), lit(0).as("step"),
      col("cur").as("node"))
    var j = 1
    while (j <= steps) {
      // min(struct(h, dst)) = argmin by draw with dst tie-break — one
      // deterministic aggregation, no window sort over the edge relation.
      frontier = broadcast(frontier)
        .join(e, col("cur") === col("src"))
        .groupBy(col("walk_id"))
        .agg(min(struct(draw(j).as("h"), col("dst"))).as("pick"))
        .select(col("walk_id"), col("pick.dst").as("cur"))
      out = out.unionAll(frontier.select(col("walk_id"), lit(j).as("step"),
        col("cur").as("node")))
      j += 1
    }
    out.orderBy(col("walk_id"), col("step"))
  }

  /** [[walk]]'s at-scale twin: same output, edges persisted
    * hash-partitioned by src once, frontier checkpointed per step (tiny)
    * so only it moves. The result is eagerly checkpointed before the
    * edge cache and per-step frontiers are released, so the returned
    * frame owns its single persisted backing (leak-neutral).
    */
  def walkShuffled(
      edges: DataFrame, seeds: DataFrame, steps: Int, nWalks: Int = 1): DataFrame = {
    val (walkIds, e0) = prepare(edges, seeds, steps, nWalks)
    val spark = edges.sparkSession
    val before = graft.RddScope.persisted(spark)
    val pre = e0.persist(StorageLevel.MEMORY_AND_DISK)
    val m = pre.count()
    val parts = PageRank.loopPartitions(spark, m)
    val result = PageRank.withLoopConf(spark, parts) {
      val e = pre.repartition(parts, col("src"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      e.count()
      pre.unpersist()
      var frontier = walkIds.localCheckpoint(true)
      var out = frontier.select(col("walk_id"), lit(0).as("step"),
        col("cur").as("node"))
      var j = 1
      while (j <= steps) {
        frontier = e.join(frontier, col("cur") === col("src"))
          .groupBy(col("walk_id"))
          .agg(min(struct(draw(j).as("h"), col("dst"))).as("pick"))
          .select(col("walk_id"), col("pick.dst").as("cur"))
          .localCheckpoint(true)
        out = out.unionAll(frontier.select(col("walk_id"), lit(j).as("step"),
          col("cur").as("node")))
        j += 1
      }
      out.orderBy(col("walk_id"), col("step")).localCheckpoint(true)
    }
    // The result owns its one checkpoint backing; everything else this
    // call persisted (edge cache, per-step frontiers) is released here.
    graft.RddScope.sweepExcept(spark, before, result)
    result
  }

  private def draw(step: Int): Column =
    graft.ops.Portable.md5Long(
      concat_ws(":", col("walk_id"), lit(step), col("cur"), col("dst")))

  private def prepare(
      edges: DataFrame, seeds: DataFrame, steps: Int,
      nWalks: Int): (DataFrame, DataFrame) = {
    require(steps >= 0, s"steps must be >= 0; got $steps")
    require(nWalks >= 1, s"nWalks must be >= 1; got $nWalks")
    val spark = edges.sparkSession
    val walkIds = seeds
      .crossJoin(spark.range(nWalks).select(col("id").cast("int").as("w")))
      .select(concat_ws("#", col("id"), col("w")).as("walk_id"),
        col("id").cast("string").as("cur"))
    val e = edges.select(col("src").cast("string").as("src"),
      col("dst").cast("string").as("dst"))
    (walkIds, e)
  }
}
