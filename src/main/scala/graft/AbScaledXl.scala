package graft

import org.apache.spark.sql.SparkSession
import graft.graph.{PageRank, PageRankGraphX, SyntheticGraph}

/** One-off crossover experiment: DataFrame loop vs GraphX at 10M and 20M
  * power-law edges, fixed iteration count (delta = 0) so both paths do
  * identical work. Extends the 2M-edge bench data point before
  * recommending either path as the cluster-scale default.
  */
object AbScaledXl {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val iters = sys.env.getOrElse("XL_ITERS", "5").toInt
    val params = PageRank.Params(beta = 0.85, delta = 0.0, maxIter = iters)
    // warm
    PageRank.run(spark, SyntheticGraph.powerLaw(spark, 10000L, 100000L), params).release()
    for ((nv, ne) <- Seq((1000000L, 10000000L), (2000000L, 20000000L))) {
      for (form <- Seq("df", "graphx")) {
        val t0 = System.nanoTime()
        val edges = SyntheticGraph.powerLaw(spark, nv, ne)
        val res =
          if (form == "df") PageRank.run(spark, edges, params)
          else PageRankGraphX.run(spark, edges, params)
        require(res.iterations == iters)
        require(PageRank.topK(res.ranks, 100).count() == 100)
        res.release()
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"XL $form%-7s verts=$nv edges=$ne iters=$iters wall=$wall%.2f s")
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      }
    }
    spark.stop()
  }
}
