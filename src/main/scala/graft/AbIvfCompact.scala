package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B: IVF-store fragmentation vs one compaction — the number behind
  * [[graft.sim.IndexStore.compact]]'s reason to exist (the AbDedupInc
  * compaction-leg template, embedding-store edition). `appendIvfStatic`
  * is append-only into the Hive cell layout, so a store built from many
  * increments carries shuffle-parallelism × |touched cells| files per
  * append and the incremental semantic-dedup probe
  * ([[graft.sim.IndexStore.dedupNewIvfStatic]]) pays a file-count tax
  * that a single save never shows. Measured here: build the SAME corpus
  * once as one save and once as `AB_CHUNKS` appends, probe both with the
  * sf-dir embeddings as the arriving batch, compact the fragmented
  * store, re-probe — the delta is what one bounded rewrite buys back,
  * and probe-compacted ≈ probe-one-save is the flatness claim. Probe
  * results are asserted row-count-identical across all three layouts
  * (the row-level pin is IndexStoreSpec's).
  *
  * Corpus: ×`AB_AMP` replicas of the sf-dir embeddings with distinct ids
  * and a per-replica deterministic sign-flip pattern (element j flips
  * when bit j%8 of the replica index is set) so replicas spread over the
  * cell space and are not mutual exact dups — the probe measures scan
  * cost, not duplicate-output volume.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 sbt "runMain graft.AbIvfCompact"
  */
object AbIvfCompact {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val amp = sys.env.getOrElse("AB_AMP", "256").toInt
    val chunks = sys.env.getOrElse("AB_CHUNKS", "32").toInt
    val dims = sys.env.getOrElse("AB_DIMS", "6").toInt
    val eps = 0.95
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), graft.sim.Similarity.asDouble(col("embedding")).as("v"))
    val corpus = base
      .crossJoin(spark.range(amp).select(col("id").as("rep")))
      .select((col("vec_id") * amp + col("rep") + 1000000L).as("vec_id"),
        expr("transform(v, (x, j) -> x * (1.0 - 2.0 * ((rep >> (j % 8)) % 2)))")
          .as("v"))
    val batch = base // arriving increment, original ids < 1000000

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def sweep(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    def parquetFiles(p: String): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(p)).count(_.getName.endsWith(".parquet"))
    }

    val dir = java.nio.file.Files.createTempDirectory("graft_ab_ivf").toString
    val (_, saveWall) = timed {
      graft.sim.IndexStore.saveIvfStatic(corpus, dims, s"$dir/one")
    }
    sweep()
    // Untimed warm-up probe: the first probe on a fresh JVM absorbs
    // whole-stage-codegen + JIT (measured 3x on this leg), which would
    // land entirely on whichever timed leg runs first and invert the
    // layout comparison.
    graft.sim.IndexStore.dedupNewIvfStatic(spark, s"$dir/one", batch, dims, eps)
      .filter(col("is_dup")).count()
    sweep()
    val (onePairs, oneWall) = timed {
      graft.sim.IndexStore.dedupNewIvfStatic(spark, s"$dir/one", batch, dims, eps)
        .filter(col("is_dup")).count()
    }
    sweep()

    val (_, fragBuild) = timed {
      (0 until chunks).foreach { i =>
        val chunk = corpus.filter(pmod(col("vec_id"), lit(chunks)) === i)
        if (i == 0) graft.sim.IndexStore.saveIvfStatic(chunk, dims, s"$dir/frag")
        else graft.sim.IndexStore.appendIvfStatic(chunk, dims, s"$dir/frag")
      }
    }
    sweep()
    val filesFrag = parquetFiles(s"$dir/frag")
    val (fragPairs, fragWall) = timed {
      graft.sim.IndexStore.dedupNewIvfStatic(spark, s"$dir/frag", batch, dims, eps)
        .filter(col("is_dup")).count()
    }
    sweep()
    val (_, compactWall) = timed {
      graft.sim.IndexStore.compact(spark, s"$dir/frag")
    }
    sweep()
    val filesCompact = parquetFiles(s"$dir/frag")
    val (compPairs, compWall) = timed {
      graft.sim.IndexStore.dedupNewIvfStatic(spark, s"$dir/frag", batch, dims, eps)
        .filter(col("is_dup")).count()
    }
    require(compPairs == fragPairs && compPairs == onePairs,
      s"probe diverged across layouts: one-save=$onePairs fragmented=$fragPairs compacted=$compPairs")
    println(f"AB-IVF-COMPACT amp=$amp chunks=$chunks dims=$dims " +
      f"corpus=${amp}x save=$saveWall%.1f s probe_onesave=$oneWall%.1f s " +
      f"frag_build=$fragBuild%.1f s files_frag=$filesFrag " +
      f"probe_frag=$fragWall%.1f s compact=$compactWall%.1f s " +
      f"files_after=$filesCompact probe_compacted=$compWall%.1f s " +
      f"dups=$onePairs")
    spark.stop()
  }
}
