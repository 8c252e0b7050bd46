package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.graph.{KCore, LabelPropagation, ShortestPaths, SyntheticGraph}

/** A/B scale probe for the round-6 bounded graph loops (not driver-run):
  * Bellman-Ford SSSP and k-core peeling on the same deterministic 2M-edge
  * power-law graph the PageRank crossover study uses — evidence that the
  * per-round shapes (broadcast frontiers, eager checkpoints, semi-join
  * peels) hold beyond the sf0.1 supply network.
  * `sbt "runMain graft.AbGraphOps"`.
  */
object AbGraphOps {
  def main(args: Array[String]): Unit = {
    // Optional args: <nVerts> <nEdges> (default 200k / 2M; pass 2000000
    // 20000000 for the 20M-edge point of the scale curve).
    val nVerts = args.headOption.map(_.toLong).getOrElse(200000L)
    val nEdges = args.lift(1).map(_.toLong).getOrElse(2000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val edges = SyntheticGraph.powerLaw(spark, nVerts = nVerts, nEdges = nEdges)
      .localCheckpoint(true)
    println(s"graph: ${edges.count()} directed edges")

    for (rounds <- Seq(2, 4, 6)) {
      val weighted = edges.withColumn(
        "w", (pmod(xxhash64(col("src"), col("dst")), lit(97L)) + 1).cast("double"))
      val seeds = spark.range(5).select(col("id"))
      val t0 = System.nanoTime()
      val res = ShortestPaths.bellmanFord(weighted, seeds, rounds)
      val n = res.count()
      val dt = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint(res)
      // bellmanFord early-stops when the frontier empties, so dt/rounds
      // would UNDERSTATE per-round cost on small-diameter graphs — report
      // the wall for ≤rounds rounds, same convention as the LPA leg below.
      println(f"sssp rounds<=$rounds reached=$n wall=$dt%.2f s")
    }

    for (k <- Seq(3, 5)) {
      val t0 = System.nanoTime()
      val res = KCore.kCore(edges, k, rounds = 8)
      val n = res.count()
      val dt = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint(res)
      println(f"kcore k=$k survivors=$n wall=$dt%.2f s")
    }

    for (rounds <- Seq(2, 4)) {
      val t0 = System.nanoTime()
      val res = LabelPropagation.run(edges, rounds)
      val comms = res.select(col("label")).distinct().count()
      val dt = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint(res)
      // run() may early-stop before `rounds`, so dt/rounds would
      // UNDERSTATE per-round cost; report the wall for ≤rounds rounds.
      println(f"lpa rounds<=$rounds communities=$comms wall=$dt%.2f s")
    }
    spark.stop()
  }
}
