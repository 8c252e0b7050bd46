package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B: SemDeDup's CELL-SCOPED candidate generation vs the exact
  * all-pairs baseline, priced at XL vector counts — the evidence that
  * d18's quadratic stage is Σ|cell|², not N².
  *
  * Corpus: `AB_N` (default 8192) deterministic 64-dim vectors from the
  * portable md5 stream; the last quarter are PLANTED near-duplicates of
  * the first quarter (the base vector plus a ~1e-3 per-coordinate
  * perturbation), so the ε-groups the operator exists to find are
  * present at a known rate. Three legs, identical downstream decision
  * chain (groups → keep-least-central):
  *
  *   all_pairs   — exact N²/2 cosine baseline ([[graft.sim.Similarity
  *                 .cosinePairs]]' shape), the ground truth;
  *   cells_d4    — [[graft.sim.Similarity.semDedupPortable]] at dims=4
  *                 (16 cells);
  *   cells_d8    — dims=8 (256 cells), the production-shaped point
  *                 (nCells grows with N, per-cell quadratic bounded).
  *
  * Published per leg: min wall over 3 runs, shuffle-write bytes,
  * candidate-pair count (the quadratic work actually done), and — for
  * the cell legs — ε-pair RECALL vs the exact baseline (sign-cells
  * split some true pairs across a hyperplane; the honest miss rate, the
  * same trade the paper's k-means cells make) plus planted-duplicate
  * recall (fraction of planted pairs whose two ends share a group).
  *
  *   AB_N=8192 sbt "runMain graft.AbSemDedup"
  */
object AbSemDedup {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val n = sys.env.getOrElse("AB_N", "8192").toInt
    val dims = 64
    val eps = 0.95
    val base = n * 3 / 4 // ids >= base duplicate id - base

    // Deterministic corpus: coordinate j of vector i is an md5 draw in
    // [-1, 1); planted near-dups perturb every coordinate by ~1e-3 of a
    // second independent draw, keeping cosine ≥ ~0.999 to the original.
    def vecs: DataFrame = {
      val ids = spark.range(n.toLong).select(col("id").as("vec_id"))
      val src = when(col("vec_id") >= base, col("vec_id") - base)
        .otherwise(col("vec_id"))
      val basev = transform(sequence(lit(0), lit(dims - 1)), j =>
        (pmod(graft.ops.Portable.md5Long(
          concat(lit("v:"), src.cast("string"), lit(":"), j.cast("string"))),
          lit(2001L)).cast("double") - 1000.0) / 1000.0)
      val noise = transform(sequence(lit(0), lit(dims - 1)), j =>
        when(col("vec_id") >= base,
          (pmod(graft.ops.Portable.md5Long(
            concat(lit("n:"), col("vec_id").cast("string"), lit(":"),
              j.cast("string"))), lit(2001L)).cast("double") - 1000.0) /
            1000000.0)
          .otherwise(lit(0.0)))
      ids.select(col("vec_id"),
        zip_with(basev, noise, (a, b) => a + b).as("v"))
        .localCheckpoint(true)
    }
    val v = vecs
    println(s"AB-SEMDEDUP corpus n=$n dims=$dims eps=$eps planted=${n - base}")

    val shuffleBytes = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten); ()
        }
      }
    })

    // Exact ε-pair computation — built FRESH per timed run (the leg must
    // pay the N²/2 work, not count a checkpoint); checkpointed once
    // separately as the recall reference.
    def allPairs: DataFrame = {
      val a = v.select(col("vec_id").as("pa"), col("v").as("va"))
      val b = v.select(col("vec_id").as("pb"), col("v").as("vb"))
      a.crossJoin(b).filter(col("pa") < col("pb"))
        .filter(graft.sim.Similarity.cosine(col("va"), col("vb")) >= eps)
        .select(col("pa"), col("pb"))
    }
    val truePairs = allPairs.localCheckpoint(true)
    val nTrue = truePairs.count()

    def cellPairs(d: Int): DataFrame = {
      val cell = (0 until d).map { j =>
        when(element_at(col("v"), j + 1) >= 0, 1 << (d - 1 - j)).otherwise(0)
      }.reduce(_ + _)
      val asg = v.select(col("vec_id"), col("v"), cell.as("cell"))
      asg.select(col("cell"), col("vec_id").as("pa"), col("v").as("va"))
        .join(asg.select(col("cell").as("cell_b"), col("vec_id").as("pb"),
          col("v").as("vb")),
          col("cell") === col("cell_b") && col("pa") < col("pb"))
        .filter(graft.sim.Similarity.cosine(col("va"), col("vb")) >= eps)
        .select(col("pa"), col("pb"))
    }

    def leg(label: String, mk: () => DataFrame, candExpr: Option[Long]): DataFrame = {
      var minWall = Double.MaxValue
      var bytes = 0L
      var out: DataFrame = null
      (1 to 3).foreach { _ =>
        org.apache.spark.sql.graft.GraftInternals.drainListenerBus(spark)
        shuffleBytes.set(0L)
        val t0 = System.nanoTime()
        val df = mk()
        val found = df.count()
        val wall = (System.nanoTime() - t0) / 1e9
        org.apache.spark.sql.graft.GraftInternals.drainListenerBus(spark)
        if (wall < minWall) { minWall = wall; bytes = shuffleBytes.get(); out = df }
        val _ = found
      }
      val found = out.count()
      val recall = if (label == "all_pairs") 1.0
        else out.join(truePairs, Seq("pa", "pb"), "left_semi").count().toDouble /
          math.max(1L, nTrue)
      val cand = candExpr.map(c => s" cand_pairs=$c").getOrElse("")
      println(f"AB-SEMDEDUP $label%-10s wall=$minWall%.2f s " +
        f"shuffle_write=${bytes / 1048576.0}%.1f MiB pairs=$found " +
        f"recall=$recall%.3f$cand")
      out
    }

    // Candidate-pair counts (the quadratic work) per quantizer.
    def candCount(d: Int): Long = {
      val cell = (0 until d).map { j =>
        when(element_at(col("v"), j + 1) >= 0, 1 << (d - 1 - j)).otherwise(0)
      }.reduce(_ + _)
      v.select(cell.as("cell")).groupBy(col("cell")).count()
        .agg(sum((col("count") * (col("count") - 1) / 2).cast("long")))
        .head().getLong(0)
    }

    leg("all_pairs", () => allPairs, Some(n.toLong * (n - 1) / 2))
    leg("cells_d4", () => cellPairs(4), Some(candCount(4)))
    leg("cells_d8", () => cellPairs(8), Some(candCount(8)))

    // Planted-duplicate group recall through the FULL operator at d=8:
    // both ends of a planted pair must land in the same kept/dropped
    // group (they do whenever the tiny perturbation does not flip one of
    // the first 8 coordinate signs — the honest boundary-loss number).
    val full = graft.sim.Similarity.semDedupPortable(v, dims = 8, eps = eps)
    val g = full.select(col("vec_id"), col("group_id"))
    val planted = spark.range(base.toLong, n.toLong)
      .select((col("id") - base).as("pa"), col("id").as("pb"))
    val together = planted
      .join(g.select(col("vec_id").as("pa"), col("group_id").as("ga")), "pa")
      .join(g.select(col("vec_id").as("pb"), col("group_id").as("gb")), "pb")
      .filter(col("ga") === col("gb")).count()
    val kept = full.filter(col("kept")).count()
    println(f"AB-SEMDEDUP full_d8 planted_same_group=$together/${n - base} " +
      f"kept=$kept dropped=${n - kept}")
    spark.stop()
  }
}
