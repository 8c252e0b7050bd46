package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import org.apache.spark.sql.graft.GraftInternals

/** Connected components as a pure DataFrame fixpoint — the Spark-first
  * twin of the GraphX path in [[graft.dedup.Dedup.clusters]], with the
  * same output contract (label = minimum vertex id of the component,
  * matching GraphX `connectedComponents` and a DuckDB `WITH RECURSIVE`
  * reachability oracle).
  *
  * Algorithm: alternating large-star / small-star edge rewriting
  * (Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii: "Connected
  * Components in MapReduce and Beyond", SoCC 2014):
  *
  *   - large-star(u): connect every STRICTLY LARGER neighbor of u to
  *     m(u) = min(Γ(u) ∪ {u});
  *   - small-star(u): orient edges toward the larger endpoint, then
  *     connect every smaller-or-self neighbor of u to m(u).
  *
  * Both steps preserve connectivity; the fixpoint is a union of stars
  * centered at each component's minimum id, reached in O(log² n) rounds
  * REGARDLESS of id layout. (The naive alternative — per-round min-label
  * propagation — needs eccentricity-of-the-min rounds: measured 17
  * rounds on the sf0.1 near-dup pair graph, where its pointer-jumping
  * "accelerated" variant degenerates because a neighborhood's min id is
  * usually its own neighborhood's min too. Star contraction measured 4
  * rounds on the same graph.)
  *
  * Scale shape, per round: two map-side-combinable `groupBy(u).min`
  * aggregations, two |E|-row equi-joins attaching m(u), two distincts —
  * all key-partitioned shuffles bounded by the paper's O(|E|) edge-count
  * invariant; no step holds a component in memory. Loop hygiene mirrors
  * [[PageRank]]: the edge relation advances through eager
  * `localCheckpoint`s with superseded checkpoints freed (O(1) lineage
  * and storage in the round count), and convergence is detected from a
  * constant-size per-round signature (edge count + order-invariant
  * xxhash64 XOR) — one tiny aggregate job on the already-materialized
  * round result.
  */
object ConnectedComponents {

  /** Components of the undirected graph given by `pairs` (first two
    * columns = endpoints, castable to long; direction and duplicates
    * ignored; self-loops allowed but inert). Returns
    * `(member_id: long, rep_id: long)` — one row per distinct endpoint,
    * `rep_id` = min vertex id reachable from it — ordered by member_id.
    */
  def run(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    val c = pairs.columns
    // Persist the normalized pair relation FIRST: the edge seed and the
    // vertex set both derive from it, and the caller's pair generator is
    // often itself expensive (d7b feeds the full LSH candidate build
    // here) — without this it would recompute once per derivation.
    val e = pairs
      .select(col(c(0)).cast("long").as("a"), col(c(1)).cast("long").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
      .persist(StorageLevel.MEMORY_AND_DISK)

    val seed = e.filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .distinct()
    val m = seed.count()
    val parts = PageRank.loopPartitions(spark, m)

    PageRank.withLoopConf(spark, parts) {
      val verts = e.select(col("a").as("id"))
        .union(e.select(col("b").as("id")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      val n = verts.count()
      if (n == 0) {
        e.unpersist(); verts.unpersist()
        return verts.select(col("id").as("member_id"), col("id").as("rep_id"))
      }

      try {
        // Edge state: undirected edges as (u, v); orientation is
        // re-derived inside each star step as that step requires.
        var edges = seed.localCheckpoint(true)
        // Failure-path hygiene: on ANY mid-loop throw (including the
        // 64-round guard) free the live checkpoints before propagating —
        // library callers have no Bench-style sweep to catch orphans.
        var pending: DataFrame = null
        try {
        e.unpersist()
        var signature: (Long, Long) = (-1L, -1L)
        var converged = false
        var rounds = 0
        while (!converged) {
          rounds += 1
          require(rounds <= 64, "star-contraction failed to converge in 64 rounds")

          // Large-star: Γ from both orientations; every neighbor w > u
          // re-attaches to m(u) = min(Γ(u) ∪ {u}).
          val arcs = edges.select(col("u"), col("v"))
            .union(edges.select(col("v").as("u"), col("u").as("v")))
          val mLarge = arcs.groupBy(col("u"))
            .agg(min(col("v")).as("minv"))
            .select(col("u"), least(col("minv"), col("u")).as("mu"))
          // Emissions (m(u), v) with v > u ≥ m(u) are already canonical
          // (strictly increasing pair), so a single distinct suffices.
          val afterLarge = arcs.join(mLarge, "u")
            .filter(col("v") > col("u"))
            .select(col("mu").as("u"), col("v"))
            .distinct()

          // Small-star: orient toward the larger endpoint (v ≤ u after
          // this select); every smaller neighbor AND u itself attach to
          // m(u) = min of the smaller neighbors.
          val oriented = afterLarge
            .select(col("v").as("u"), col("u").as("v")) // now v < u
          val mSmall = oriented.groupBy(col("u")).agg(min(col("v")).as("mu"))
          val attached = oriented.join(mSmall, "u")
          // Emissions (mu, x) are already canonical: mu = min(N(u)) ≤ every
          // emitted partner (both the v ∈ N(u) and u itself), so one
          // distinct suffices — no re-canonicalization shuffle.
          val afterSmall = attached
            .select(col("mu").as("u"), col("v"))
            .union(attached.select(col("mu").as("u"), col("u").as("v")))
            .filter(col("u") =!= col("v"))
            .distinct()

          // LAZY checkpoint (the PageRank.run idiom): the signature
          // aggregate below is the round's first action, so ONE job both
          // computes the round and materializes the checkpoint — the
          // eager form paid a separate materialization job per round.
          val next = afterSmall.localCheckpoint(false)
          pending = next
          val sig = next
            .agg(count(lit(1)), expr("bit_xor(xxhash64(u, v))"))
            .head()
          val newSignature = (sig.getLong(0), if (sig.isNullAt(1)) 0L else sig.getLong(1))
          if (sys.env.contains("GRAFT_CC_DEBUG"))
            println(s"CC star round $rounds edges=${newSignature._1}")
          converged = newSignature == signature
          signature = newSignature
          GraftInternals.freeLocalCheckpoint(edges)
          edges = next
          pending = null
        }

        // Fixpoint: a union of stars (center = component min, stored as
        // (u=center, v=member) after canonicalization). Every non-center
        // member appears in exactly one star edge; centers and isolated
        // vertices label themselves.
        val memberLabel = edges
          .select(col("v").as("id"), col("u").as("label"))
          .groupBy(col("id")).agg(min(col("label")).as("label"))
        val out = verts.join(memberLabel, Seq("id"), "left")
          .select(col("id").as("member_id"),
            coalesce(col("label"), col("id")).as("rep_id"))
          .orderBy(col("member_id"))
          .localCheckpoint(true)
        GraftInternals.freeLocalCheckpoint(edges)
        out
        } catch {
          case t: Throwable =>
            GraftInternals.freeLocalCheckpoint(edges)
            if (pending ne null) GraftInternals.freeLocalCheckpoint(pending)
            throw t
        }
      } finally {
        e.unpersist()
        verts.unpersist()
      }
    }
  }
}
