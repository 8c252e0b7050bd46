package graft

import org.apache.spark.sql.SparkSession

/** A/B harness for the two shingle-index formulations (window-`lead` vs
  * array-slice, `Dedup.UseWindowShingles`) across every shingle consumer.
  * Shipped result (sf0.1, local[32], min of 3): window wins 2.9–5.2× on
  * all four — d2 1.48 s vs 4.79, d3 2.15 vs 4.18, d3b 2.70 vs 13.0,
  * d6 0.65 vs 3.34. Re-run on a real cluster to check whether shuffle
  * NETWORK cost (absent in local mode) flips the verdict.
  */
object AbShingle {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = Seq("d2_jaccard_pairs", "d3_minhash_lsh", "d3b_minhash_portable", "d6_decontaminate")
    spark.read.parquet(s"$sfDir/documents.parquet").count()
    val saved = graft.dedup.Dedup.UseWindowShingles
    try {
      for (form <- Seq("window", "array")) {
        graft.dedup.Dedup.UseWindowShingles = form == "window"
        qs.foreach { q =>
          val ts = (1 to 3).map { _ =>
            val t0 = System.nanoTime()
            val n = SparkEntry.queries(q)(spark, sfDir).count()
            spark.catalog.clearCache()
            ((System.nanoTime() - t0) / 1e9, n)
          }
          println(f"AB $form%-7s $q%-22s min=${ts.map(_._1).min}%.3f mean=${ts.map(_._1).sum / 3}%.3f rows=${ts.head._2}")
        }
      }
    } finally graft.dedup.Dedup.UseWindowShingles = saved
    spark.stop()
  }
}
