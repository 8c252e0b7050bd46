package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** IVF recall-vs-cost sweep (r8 verdict ask #2: the published multi-probe
  * default reached only 0.66 recall@5 — below what a user would accept;
  * faiss practice is nprobe tuned to ≥0.9). Measures recall@5 against the
  * exact all-pairs top-5 and wall for a grid of (nCells, probes) on the
  * sf-dir embeddings, plus the brute-force wall as the cost ceiling. The
  * winning configuration becomes the `n13_ann_ivf_tuned` query/bench leg;
  * the curve goes to README and (per round) bench_diag.recall.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.AbAnnRecall"
  */
object AbAnnRecall {
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

    def pairSet(df: DataFrame): Set[(Long, Long)] =
      df.select("query_id", "cand_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    def sweepKeeping(protect: DataFrame*): Unit = {
      spark.catalog.clearCache()
      val keep = protect.flatMap(
        org.apache.spark.sql.graft.GraftInternals.checkpointRddIds).toSet
      spark.sparkContext.getPersistentRDDs.values
        .filterNot(r => keep(r.id)).foreach(_.unpersist(blocking = false))
    }
    def sweep(): Unit = sweepKeeping(v)

    val t0 = System.nanoTime()
    val exact = pairSet(graft.sim.Similarity.annBruteAll(v, k = 5))
    val bruteWall = (System.nanoTime() - t0) / 1e9
    println(f"ABANN brute k=5 pairs=${exact.size} wall=$bruteWall%.2f s")
    sweep()

    val grid = Seq((8, 3, 1), (32, 16, 1),
      (16, 6, 2), (32, 8, 2), (32, 12, 2), (64, 16, 2),
      (32, 8, 3), (32, 10, 3), (64, 16, 3))
    grid.foreach { case (nCells, probes, assign) =>
      val t = System.nanoTime()
      val got = pairSet(graft.sim.Similarity.annIvfMultiProbe(
        spark, v, nCells = nCells, probes = probes, k = 5, assign = assign))
      val wall = (System.nanoTime() - t) / 1e9
      val recall = got.intersect(exact).size.toDouble / exact.size
      println(f"ABANN ivf nCells=$nCells%3d probes=$probes%3d assign=$assign " +
        f"recall@5=$recall%.3f wall=$wall%.2f s scanfrac=${probes.toDouble / nCells}%.2f")
      sweep()
    }

    // CROSSOVER legs: at the sf0.1 corpus size (N=2000) every IVF wall is
    // dominated by the KMeans fit + fixed stage latencies, so the tuned
    // config's asymptotic win over brute force cannot show. ANN_XL_N
    // generates synthetic unit-norm 64-d corpora at a size where the
    // O(N²) brute pair scan dominates — the scale regime the operator is
    // FOR — and times brute vs IVF configs there, on TWO corpora:
    //
    //   weak  — 50 centers, noise-dominated (0.5·c + 1.5·g): matches the
    //           sf0.1 embeddings table; near the IVF worst case, since
    //           true neighbors barely cluster. Recall ≥0.9 costs ~0.5
    //           candidate coverage, so the speedup ceiling is ~2×.
    //   clustered — the same 50 centers dominating (1.2·c + 0.4·g): the
    //           regime real embedding corpora live in; the same machinery
    //           reaches ≥0.9 recall at ~0.1 coverage → the near-1/coverage
    //           speedup IVF is bought for.
    //
    // Published per leg: recall@5, wall, speedup vs brute, and the pair
    // coverage probes/nCells×assign — the honest cost axis.
    val xlN = sys.env.getOrElse("ANN_XL_N", "0").toInt
    if (xlN > 0) {
      val dims = 64
      def corpus(noiseW: Double, centerW: Double) = {
        val rnd = new scala.util.Random(7)
        val centers = Array.fill(50, dims)(rnd.nextGaussian())
        val rows = (0 until xlN).map { i =>
          val c = centers(i % 50)
          val raw = Array.tabulate(dims)(j => centerW * c(j) + noiseW * rnd.nextGaussian())
          val n = math.sqrt(raw.map(x => x * x).sum)
          org.apache.spark.sql.Row(i.toLong, raw.map(_ / n).toSeq)
        }
        spark.createDataFrame(
          spark.sparkContext.parallelize(rows, 32),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("vec_id",
              org.apache.spark.sql.types.LongType, nullable = false),
            org.apache.spark.sql.types.StructField("v",
              org.apache.spark.sql.types.ArrayType(
                org.apache.spark.sql.types.DoubleType), nullable = false))))
          .localCheckpoint(true)
      }
      Seq(("weak", 1.5, 0.5), ("clustered", 0.4, 1.2)).foreach {
        case (label, noiseW, centerW) =>
          val xl = corpus(noiseW, centerW)
          val tb0 = System.nanoTime()
          val xlExact = pairSet(graft.sim.Similarity.annBruteAll(xl, k = 5))
          val xlBrute = (System.nanoTime() - tb0) / 1e9
          println(f"ABANN xl $label N=$xlN brute wall=$xlBrute%.2f s")
          sweepKeeping(v, xl)
          Seq((64, 8, 1), (64, 8, 2), (128, 24, 2), (64, 16, 2), (64, 16, 3))
            .foreach { case (nCells, probes, assign) =>
              val t = System.nanoTime()
              val got = pairSet(graft.sim.Similarity.annIvfMultiProbe(
                spark, xl, nCells = nCells, probes = probes, k = 5, assign = assign))
              val wall = (System.nanoTime() - t) / 1e9
              val recall = got.intersect(xlExact).size.toDouble / xlExact.size
              val cov = probes.toDouble / nCells * assign
              println(f"ABANN xl $label N=$xlN ivf nCells=$nCells probes=$probes " +
                f"assign=$assign coverage=$cov%.2f recall@5=$recall%.3f " +
                f"wall=$wall%.2f s speedup=${xlBrute / wall}%.1fx")
              sweepKeeping(v, xl)
            }
          org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint(xl)
      }
    }
    spark.stop()
  }
}
