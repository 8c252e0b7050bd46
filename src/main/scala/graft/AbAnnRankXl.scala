package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{GraftInternals, TopKPairsAgg}

/** Pinned A/B: the ANN RANK STAGE at candidate-pair scale —
  * `TopKPairsAgg` (bounded-state typed-imperative aggregate, map-side
  * combinable, ≤ queries×k rows cross the wire) versus the `row_number`
  * window spelling it replaced (full shuffle + sort of the entire pair
  * stream). The r9 XL probe measured the window at 217 s on 443 M
  * candidate pairs — worse than the whole brute scan — but that number
  * lived only in a scaladoc; this main makes the comparison a
  * reproducible leg (r9 verdict stretch #9) so a rank-stage regression
  * can never hide behind the sf0.1 bench's small pair counts.
  *
  * The pair stream is the brute-force all-pairs score over N
  * deterministic 64-d vectors (xxhash64-derived, no RNG), UNIONED WITH
  * ITSELF — every pair appears twice, the multi-assignment-IVF shape
  * (a candidate met through two shared cells) that the real rank stage
  * must collapse to distinct pairs. The aggregate dedups at insert for
  * free; the window spelling needs a full-stream `distinct` (its own
  * corpus-sized shuffle) BEFORE ranking. Both legs consume the
  * identical stream and produce the identical top-5. Reported per leg:
  * min wall over samples, executor CPU, and shuffle-write bytes.
  *
  * Honesty note: Spark 4's WindowGroupLimit pushes `row_number ≤ k`
  * down as a map-side group limit, so on a DUPLICATE-FREE stream the
  * window spelling no longer pays a full pair-stream sort (first r10
  * run measured it within 1.3× of the aggregate at 64M unique pairs).
  * The structural gap that remains — and what this leg pins — is the
  * dedup shuffle: insert-time duplicate collapse cannot be spelled
  * into the window form without a distinct pass over the whole stream.
  *
  *   sbt "runMain graft.AbAnnRankXl"            # N=8000 -> 2x64M pairs
  *   XL_N=24000 sbt "runMain graft.AbAnnRankXl" # r9-probe scale
  *
  * r10 XL results (24000 vectors, 2×576M pairs, quiet box): the
  * aggregate completes on the default 8 GB heap (36.9 s / 1030 cpu-s /
  * 74.8 MiB shuffle-write at fallbackThreshold=65536; 60.6 s at the
  * 128-group default — the sort-based partial fallback is worth 1.6×
  * cpu here, which is why the threshold is session-config below); the
  * window spelling OOMs the 8 GB heap outright and needs
  * SPARK_DRIVER_MEM=48g to finish at 169.4 s / 4814 cpu-s / 14 782 MiB.
  */
object AbAnnRankXl {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // ObjectHashAggregate falls back to SORT-BASED partial aggregation
      // after 128 distinct groups per task (the Spark default) — with
      // thousands of query groups per partition that re-introduces the
      // per-partition pair sort the aggregate exists to avoid. The
      // buffers are k-entry-tiny, so holding every group is cheap.
      // Env-tunable here to A/B the threshold itself.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        // default matches the 65536 the Bench/QBench sessions run and the
        // scaladoc results quote, so a plain run reproduces them
        sys.env.getOrElse("XL_FALLBACK", "65536"))
      .getOrCreate()
    val sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    val n = sys.env.getOrElse("XL_N", "8000").toLong
    val dims = 64
    val k = 5

    // Deterministic unit-free vectors: v[j] = xxhash64(id, j) scaled to
    // [-1, 1] — reproducible across rounds with no driver-side RNG.
    val vecs = spark.range(n).select(col("id").as("vec_id"),
      array((0 until dims).map(j =>
        (xxhash64(col("id"), lit(j)).cast("double") /
          lit(Long.MaxValue.toDouble))): _*).as("v"))
      .localCheckpoint(true) // both legs read the same materialized input

    def pairs1: DataFrame = {
      val q = vecs.select(col("vec_id").as("query_id"), col("v").as("qv"))
      val c = vecs.select(col("vec_id").as("cand_id"), col("v").as("cv"))
      broadcast(q).crossJoin(c)
        .filter(col("query_id") =!= col("cand_id"))
        .select(col("query_id"), col("cand_id"),
          round(graft.sim.Similarity.cosine(col("qv"), col("cv")), 4).as("cosine"))
    }
    // Every pair twice: the multi-assignment duplicate shape.
    def pairs: DataFrame = pairs1.union(pairs1)

    def aggLeg: DataFrame = pairs
      .groupBy(col("query_id"))
      .agg(TopKPairsAgg.topkPairs(col("cand_id"), col("cosine"), k).as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("i", "e")))
      .select(col("query_id"), col("e.cand_id").as("cand_id"),
        (col("i") + 1).cast("int").as("rnk"), col("e.score").as("cosine"))

    def windowLeg: DataFrame = {
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("cand_id"))
      pairs.distinct()
        .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
    }

    val cpuNs = new AtomicLong(0L)
    val shufBytes = new AtomicLong(0L)
    sc.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          cpuNs.addAndGet(m.executorCpuTime)
          shufBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          ()
        }
      }
    })

    def leg(label: String, df: => DataFrame): Long = {
      var minWall = Double.MaxValue
      var cpu = 0.0
      var bytes = 0L
      var rows = 0L
      (1 to 2).foreach { _ =>
        GraftInternals.drainListenerBus(spark)
        cpuNs.set(0L); shufBytes.set(0L)
        val t0 = System.nanoTime()
        rows = df.count()
        val wall = (System.nanoTime() - t0) / 1e9
        GraftInternals.drainListenerBus(spark)
        if (wall < minWall) {
          minWall = wall; cpu = cpuNs.get() / 1e9; bytes = shufBytes.get()
        }
      }
      println(f"AB-ANNRANK $label%-10s n=$n pairs=${n * (n - 1)} " +
        f"wall=$minWall%.2f s cpu=$cpu%.1f s " +
        f"shuffle_write=${bytes / 1048576.0}%.1f MiB rows=$rows")
      rows
    }

    val ra = leg("topk_agg", aggLeg)
    val rw = leg("window", windowLeg)
    require(ra == rw, s"leg row counts diverge: agg=$ra window=$rw")
    GraftInternals.freeLocalCheckpoint(vecs)
    spark.stop()
  }
}
