package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe of the COMPOSED release chain (p20 / ReleaseStore
  * .batchRelease): per-stage wall + executor-cpu shares at ×AB_AMPS
  * corpus sizes, the evidence that no composed stage goes superlinear
  * when the single-stage operators (each audited separately) are glued
  * together. Stages are materialized one at a time with an eager
  * checkpoint between them — the same boundaries the production chain
  * uses — so each stage's numbers are its own, not a lazy tail of the
  * previous one. The stage spelling mirrors ReleaseStore.releaseKept,
  * whose output equality with p20 is spec-pinned in ReleaseStoreSpec.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 AB_AMPS=4,16 sbt "runMain graft.AbRelease"
  */
object AbRelease {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val amps = sys.env.getOrElse("AB_AMPS", "4,16").split(",").map(_.trim.toInt)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val p = graft.release.ReleaseParams()

    val cpuNs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(done: SparkListenerStageCompleted): Unit = {
        val m = done.stageInfo.taskMetrics
        if (m != null) { cpuNs.addAndGet(m.executorCpuTime); () }
      }
    })
    def timedStage[T](f: => T): (T, Double, Double) = {
      org.apache.spark.sql.graft.GraftInternals.drainListenerBus(spark)
      cpuNs.set(0L)
      val t0 = System.nanoTime()
      val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.graft.GraftInternals.drainListenerBus(spark)
      (r, wall, cpuNs.get() / 1e9)
    }
    def sweep(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }

    val sw = graft.text.TextFns.Stopwords
    amps.foreach { amp =>
      val base = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
      val corpus = base
        .crossJoin(spark.range(amp).select(col("id").as("rep")))
        .select((col("doc_id") * amp + col("rep")).as("doc_id"),
          concat_ws(" ", transform(graft.text.TextFns.tokens(col("text")),
            tk => when(tk.isin(sw: _*), tk)
              .otherwise(concat(lit("r"), col("rep"), lit("_"), tk)))).as("text"))
        .localCheckpoint(true)

      // Stage 1 — classifier gate: one corpus pass for features/labels,
      // dims²-bounded train, one scoring join.
      val ml = graft.ml.LinearClassifier
      val (keptDocs, gateWall, gateCpu) = timedStage {
        val feat = ml.features(corpus, "doc_id", "text", p.dims).localCheckpoint(true)
        val lab = ml.weakLabels(corpus, "doc_id", "text")
        val w = ml.train(spark, feat, lab, p.dims, p.iters)
        val kd = corpus.join(
            ml.score(feat, lab, w).filter(col("margin") > 0).select(col("doc_id")),
            "doc_id")
          .select(col("doc_id"), col("text")).localCheckpoint(true)
        org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint(feat)
        kd
      }

      // Stage 2 — near-dup drop: LSH banded equi-join, star-contraction
      // CC, canonical election, anti-join.
      val (withRep, dupWall, dupCpu) = timedStage {
        val ch = graft.release.ReleaseStore.releaseKept(keptDocs, p,
          portablePairs = false)
        ch.withRep.count() // materialize through the checkpoint
        ch
      }

      // Stage 3 — span excision over the survivors.
      val (nRel, spanWall, spanCpu) = timedStage {
        withRep.released.count()
      }
      val total = gateWall + dupWall + spanWall
      println(f"AB-RELEASE amp=$amp docs=${500 * amp} released=$nRel " +
        f"gate=$gateWall%.1f s/${gateCpu}%.0f cpu " +
        f"neardup=$dupWall%.1f s/${dupCpu}%.0f cpu " +
        f"span+split=$spanWall%.1f s/${spanCpu}%.0f cpu " +
        f"total=$total%.1f s shares=${100 * gateWall / total}%.0f/" +
        f"${100 * dupWall / total}%.0f/${100 * spanWall / total}%.0f%%")
      sweep()
    }
    spark.stop()
  }
}
