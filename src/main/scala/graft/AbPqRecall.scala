package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** PQ recall-vs-cost sweep — the n13 tuning story applied to the PQ
  * family (the weakest published recall after the r9 IVF fix: trained
  * PQ at (m=32, nCodes=64) sits at recall@10 ≈ 0.79). Sweeps the two PQ
  * levers against the exact top-10 on the sf-dir embeddings:
  *
  *   - nCodes (codes per subspace): quantization resolution — the
  *     dominant recall lever; 64→256 at 2-dim subspaces approaches the
  *     corpus cardinality, i.e. near-exact sub-vectors.
  *   - m (subspace count): at fixed dim, fewer/wider subspaces trade
  *     per-subspace resolution for cross-dimension correlation capture.
  *
  * Codebook training wall is reported separately from search wall —
  * production amortizes training across index lifetimes, so the honest
  * per-query cost is the search leg. The winning point goes to n9 (and
  * the grid to README), like AbAnnRecall's winner became n13.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.AbPqRecall"
  */
object AbPqRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val v = Tables.embeddings(spark, sfDir).select(
      col("vec_id"),
      graft.sim.Similarity.asDouble(col("embedding")).as("v"))
      .localCheckpoint(true)
    // n8/n9's bounded-query ADC protocol, widened to 200 queries for
    // statistical stability (the per-round bench publishes the 10-query
    // n1-protocol point; recall differences replicate across both).
    val queries = v.filter(col("vec_id") < 200)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val cands = v.filter(col("vec_id") >= 200)
      .select(col("vec_id").as("cand_id"), col("v").as("cv"))

    def pairSet(df: DataFrame): Set[(Long, Long)] =
      df.select("query_id", "cand_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    def sweep(): Unit = {
      spark.catalog.clearCache()
      val keep = org.apache.spark.sql.graft.GraftInternals.checkpointRddIds(v)
      spark.sparkContext.getPersistentRDDs.values
        .filterNot(r => keep(r.id)).foreach(_.unpersist(blocking = false))
    }

    val t0 = System.nanoTime()
    val exact = pairSet(graft.sim.Similarity.annBrute(
      queries, cands.select(col("cand_id"), col("cv")), k = 10))
    val bruteWall = (System.nanoTime() - t0) / 1e9
    println(f"ABPQ brute k=10 pairs=${exact.size} wall=$bruteWall%.2f s")
    sweep()

    val grid = Seq((32, 64), (32, 128), (32, 256), (16, 256), (8, 256))
    grid.foreach { case (m, nCodes) =>
      val tTrain = System.nanoTime()
      val cb = graft.sim.Similarity.pqCodebookTrained(
        spark, v, dim = 64, m = m, nCodes = nCodes).localCheckpoint(true)
      val trainWall = (System.nanoTime() - tTrain) / 1e9
      val tSearch = System.nanoTime()
      val got = pairSet(graft.sim.Similarity.annPq(
        queries, cands.select(col("cand_id"), col("cv").as("v")),
        cb, dim = 64, m = m, k = 10))
      val searchWall = (System.nanoTime() - tSearch) / 1e9
      val recall = got.intersect(exact).size.toDouble / exact.size
      println(f"ABPQ trained m=$m%2d nCodes=$nCodes%3d recall@10=$recall%.3f " +
        f"train=$trainWall%.1f s search=$searchWall%.2f s " +
        f"bits/vec=${m * (32 - Integer.numberOfLeadingZeros(nCodes - 1))}")
      sweep()
    }
    spark.stop()
  }
}
