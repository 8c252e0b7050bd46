package graft.graph

import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.storage.StorageLevel

/** GraphX scale path for PageRank (SURVEY §7.3): Pregel-style
  * `aggregateMessages` iterations over a partitioned `Graph`, avoiding the
  * per-iteration SQL planning cost of the DataFrame loop on very large /
  * long-running graphs.
  *
  * Semantics match [[PageRank.run]] exactly (renormalizing dead-end +
  * spider-trap fold-back, global-L1 convergence, `pageRank.py:116-145`) —
  * NOT GraphX's built-in `lib.PageRank`, whose per-vertex tolerance and
  * unnormalized ranks differ from the reference (SURVEY §2.9). Asserted
  * equal to the DataFrame loop within 1e-9 L1 in ScalaTest.
  */
object PageRankGraphX {

  def run(
      spark: SparkSession,
      edges: DataFrame, // (src LONG, dst LONG)
      params: PageRank.Params = PageRank.Params()): PageRank.RankResult = {
    val sc = spark.sparkContext
    val persistedBefore = graft.RddScope.persisted(spark)
    val edgeRdd = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .rdd.map(r => Edge(r.getLong(0), r.getLong(1), ()))
    val base0 = Graph.fromEdges(edgeRdd, defaultValue = (),
      edgeStorageLevel = StorageLevel.MEMORY_AND_DISK,
      vertexStorageLevel = StorageLevel.MEMORY_AND_DISK)
    // A/B hook (r18 verdict #8): EdgePartition2D co-partitioning before
    // the iteration loop. Measured on the 2M-edge scaled leg (see
    // OPTIMIZATION_r19.md): local[32] fresh-JVM walls are NEUTRAL-to-
    // WORSE (the partitionBy shuffle costs more than the reduced vertex
    // replication saves when every "executor" shares one block manager),
    // so it stays OFF by default — the knob exists for cluster
    // deployments, where 2D partitioning bounds vertex replication to
    // 2√P instead of P. NOTE: repartitioning reorders message combining
    // (ulp-level float regrouping), so enabling it invalidates the
    // golden-pin bit-parity gates — acceptable on a cluster, not for the
    // oracle-checked local legs.
    val base = if (sys.env.contains("GRAFT_GRAPHX_2D"))
      base0.partitionBy(org.apache.spark.graphx.PartitionStrategy.EdgePartition2D)
    else base0
    val graph = base.outerJoinVertices(base.outDegrees) {
      (_, _, degOpt) => degOpt.getOrElse(0)
    }.cache()
    val n = graph.numVertices
    if (n == 0) {
      import spark.implicits._
      val empty = Seq.empty[(Long, Double)].toDF("id", "rank")
      graft.RddScope.sweepExcept(spark, persistedBefore, empty)
      return PageRank.RankResult(empty, 0, 0.0)
    }

    // vertex attr: (outDegree, rank)
    var ranked = graph.mapVertices { case (_, deg) => (deg, 1.0 / n) }.cache()
    var iter = 0
    var delta = Double.MaxValue
    while (delta > params.delta && iter < params.maxIter) {
      val contribs = ranked.aggregateMessages[Double](
        ctx => ctx.sendToDst(ctx.srcAttr._2 / ctx.srcAttr._1),
        _ + _)
      val pre = ranked.outerJoinVertices(contribs) {
        case (_, (deg, oldRank), cOpt) =>
          (deg, oldRank, params.beta * cOpt.getOrElse(0.0))
      }.cache()
      val s = pre.vertices.map(_._2._3).sum()
      val corr = (1.0 - s) / n
      delta = pre.vertices.map { case (_, (_, oldRank, p)) =>
        math.abs(p + corr - oldRank) }.sum()
      val next = pre.mapVertices { case (_, (deg, _, p)) => (deg, p + corr) }.cache()
      next.vertices.count() // materialize before freeing parents
      ranked.unpersist(blocking = false)
      pre.unpersist(blocking = false)
      ranked = next
      iter += 1
    }
    import spark.implicits._
    // Materialize the result OFF the GraphX lineage (eager localCheckpoint),
    // then sweep every RDD this run cached: `Dataset.unpersist` and
    // `catalog.clearCache` never touch raw RDD caches, and unpersisting the
    // graphs we hold is NOT enough — GraphX caches one replicated-view
    // EdgeRDD per aggregateMessages round that no public handle reaches
    // (see [[graft.RddScope]]). The checkpoint backing itself is the
    // caller's to free via `RankResult.release()` once consumed.
    val df = ranked.vertices.map { case (id, (_, r)) => (id, r) }
      .toDF("id", "rank").localCheckpoint(true)
    graft.RddScope.sweepExcept(spark, persistedBefore, df)
    PageRank.RankResult(df, iter, delta)
  }
}
