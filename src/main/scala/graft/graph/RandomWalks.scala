package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
  * BFS. Each step costs one join of the frontier (|walks| rows, constant
  * across steps) against the edge relation, grouped by walk for the
  * argmin. At the tested scale the frontier is broadcast, so edges are
  * never shuffled at all; at cluster scale with millions of walks the
  * same plan becomes a shuffle join on src — the standard distributed
  * walk shape (frontier and edges co-partitioned by src; hub skew is
  * bounded because each walk contributes exactly one frontier row per
  * step, unlike wedge-style expansions).
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
    require(steps >= 0, s"steps must be >= 0; got $steps")
    require(nWalks >= 1, s"nWalks must be >= 1; got $nWalks")
    val spark = edges.sparkSession
    val walkIds = seeds
      .crossJoin(spark.range(nWalks).select(col("id").cast("int").as("w")))
      .select(concat_ws("#", col("id"), col("w")).as("walk_id"),
        col("id").cast("string").as("cur"))
    val e = edges.select(col("src").cast("string").as("src"),
      col("dst").cast("string").as("dst"))

    def draw(step: Int): Column =
      graft.ops.Portable.md5Long(
        concat_ws(":", col("walk_id"), lit(step), col("cur"), col("dst")))

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
}
