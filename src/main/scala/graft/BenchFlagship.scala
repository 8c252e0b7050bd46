package graft

import org.apache.spark.sql.SparkSession
import graft.graph.PageRank

/** A/B microbench for the flagship WikiData PageRank only (not driver-run;
  * used to tune the per-iteration join strategy). */
object BenchFlagship {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val times = (1 to 4).map { _ =>
      val t0 = System.nanoTime()
      val edges = PageRank.edgesFromText(spark, "/root/reference/WikiData.txt")
      val res = PageRank.run(spark, edges, PageRank.Params(beta = 0.85, delta = 1e-5))
      require(PageRank.topK(res.ranks, 100).count() == 100)
      (System.nanoTime() - t0) / 1e9
    }
    println(times.map(t => f"$t%.2f").mkString("runs: ", " ", ""))
    spark.stop()
  }
}
