package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import org.apache.spark.sql.graft.GraftInternals

/** Connected components as a pure DataFrame fixpoint — the Spark-first
  * twin of the GraphX path in [[graft.dedup.Dedup.clusters]], and the
  * exact-oracle form (label = minimum vertex id of the component, the
  * same contract as GraphX `connectedComponents` and a DuckDB
  * `WITH RECURSIVE` reachability oracle).
  *
  * Algorithm: minimum-label propagation ("HCC", Kang et al., PEGASUS:
  * ICDM 2009) with a pointer-jumping shortcut each round:
  *
  *   1. neighbor step   l'(v) = min(l(v), min over (v,u) edges of l(u))
  *   2. shortcut step   l''(v) = l'(l'(v))
  *
  * Plain HCC needs O(diameter) rounds — fatal on a 100 TB corpus where
  * one stringy near-dup chain can be thousands of hops long. The
  * shortcut step composes the label map with itself (labels are always
  * existing vertex ids, so the self-join always hits), which doubles the
  * per-round label hops and brings convergence to O(log diameter)
  * rounds for path-like components while leaving star-like components
  * (the common near-dup shape) at their 1–2 rounds.
  *
  * Loop hygiene mirrors [[PageRank]]: the undirected edge relation is
  * hash-partitioned by `src` and persisted once; per-round traffic is
  * |V| label rows; labels advance through eager `localCheckpoint`s with
  * superseded checkpoints freed, so lineage and storage stay O(1) in the
  * round count. Convergence is detected by a changed-label count — the
  * one inherent per-round driver scalar, same as the PageRank delta.
  */
object ConnectedComponents {

  /** Components of the undirected graph given by `pairs` (first two
    * columns = endpoints, any numeric/castable-to-long type; direction
    * and duplicates ignored; self-loops allowed but inert). Returns
    * `(member_id: long, rep_id: long)` — one row per distinct endpoint,
    * `rep_id` = min vertex id reachable from it — ordered by member_id.
    */
  def run(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    val c = pairs.columns
    val e = pairs.select(col(c(0)).cast("long").as("a"), col(c(1)).cast("long").as("b"))

    val undRaw = e.union(e.select(col("b").as("a"), col("a").as("b")))
      .filter(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .distinct()
    val m = undRaw.count()
    val parts = PageRank.loopPartitions(spark, m)

    PageRank.withLoopConf(spark, parts) {
      val und = undRaw
        .select(col("a").as("src"), col("b").as("dst"))
        .repartition(parts, col("src"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val verts = e.select(col("a").as("id"))
        .union(e.select(col("b").as("id")))
        .filter(col("id").isNotNull)
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      val n = verts.count()
      if (n == 0) {
        und.unpersist(); verts.unpersist()
        return verts.select(col("id").as("member_id"), col("id").as("rep_id"))
      }

      try {
        var labels = verts.select(col("id"), col("id").as("label")).localCheckpoint(true)
        var changed = 1L
        while (changed > 0) {
          // 1. neighbor min: one shuffle sized to |E| (map-side combinable).
          val nbrMin = und.join(labels, und("dst") === labels("id"))
            .select(und("src"), col("label"))
            .groupBy(col("src"))
            .agg(min(col("label")).as("nmin"))
          val stepped = labels.join(nbrMin, labels("id") === nbrMin("src"), "left")
            .select(labels("id"),
              least(col("label"), coalesce(col("nmin"), col("label"))).as("label"),
              col("label").as("prev"))
          // 2. pointer jump: l(v) := l(l(v)). Label values are vertex ids,
          // so the lookup against the label map itself always resolves.
          val jump = stepped.select(col("id").as("jid"), col("label").as("jlabel"))
          val next = stepped.join(jump, stepped("label") === col("jid"))
            .select(stepped("id"), col("jlabel").as("label"), col("prev"))
          val nextCk = next.localCheckpoint(true)
          changed = nextCk.filter(col("label") =!= col("prev")).count()
          GraftInternals.freeLocalCheckpoint(labels)
          labels = nextCk.select(col("id"), col("label")).localCheckpoint(true)
          GraftInternals.freeLocalCheckpoint(nextCk)
        }
        val out = labels
          .select(col("id").as("member_id"), col("label").as("rep_id"))
          .orderBy(col("member_id"))
          .localCheckpoint(true)
        GraftInternals.freeLocalCheckpoint(labels)
        out
      } finally {
        und.unpersist(); verts.unpersist()
      }
    }
  }
}
