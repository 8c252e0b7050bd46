package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ml.LinearClassifier

/** A/B: the t22 trainer's SUFFICIENT-STATISTICS design (one distributed
  * pass builds the (dims+1)² integer Gram + moments, then T gradient-descent
  * iterations run driver-side on the collected summary) vs the MLlib-style
  * PER-ITERATION distributed gradient (each iteration joins the corpus-sized
  * feature relation against the current broadcast weights, aggregates the
  * per-doc margins, and aggregates the gradient by dim — T full cluster
  * passes). Both run the SAME exact integer trajectory, so the legs must
  * produce bit-identical weights — asserted, not assumed; the A/B prices
  * pure orchestration shape.
  *
  * Why normal equations win for this model: the summary is dims-bounded
  * (33² longs), so T iterations cost ZERO additional cluster passes, while
  * the per-iteration leg pays 2T shuffles of corpus-derived relations. The
  * honest flip side, also visible in the numbers: the Gram build is a
  * doc-keyed self-join (dims² fan-out per doc), so its single pass shuffles
  * more bytes than ONE distributed-gradient iteration — per-iteration wins
  * iff T is tiny or dims is too large to square (the regime MLlib's SGD
  * serves; at fastText-classifier dims the summary is the right default).
  *
  * Corpus: AB_DOCS (default 64000) synthetic docs with ~AVG_TOK md5-drawn
  * token-bucket counts — feature rows materialized directly (the tokenize
  * stage is identical in both legs and is excluded by construction).
  *
  *   AB_DOCS=64000 AB_ITERS=32 sbt "runMain graft.AbClassifier"
  */
object AbClassifier {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val nDocs = sys.env.getOrElse("AB_DOCS", "64000").toInt
    val iters = sys.env.getOrElse("AB_ITERS", "32").toInt
    val dims = 32

    // Deterministic sparse features: doc i has a count in bucket j iff the
    // md5 draw keeps it (~60% density), count in 1..8; plus the bias row.
    // Labels: md5 sign draw. (Learnability is irrelevant here — the A/B
    // prices orchestration; t22's spec owns accuracy.)
    val ids = spark.range(nDocs.toLong).select(col("id").as("doc_id"))
    def draw(salt: String, j: Column): Column =
      graft.ops.Portable.md5Long(
        concat(lit(salt), col("doc_id").cast("string"), lit(":"), j.cast("string")))
    val feat = ids
      .select(col("doc_id"), explode(sequence(lit(0), lit(dims - 1))).as("dim"))
      .filter(pmod(draw("f:", col("dim")), lit(5L)) < 3)
      .select(col("doc_id"), col("dim").cast("long").as("dim"),
        (pmod(draw("c:", col("dim")), lit(8L)) + 1).as("n"))
      .unionAll(ids.select(col("doc_id"), lit(-1L).as("dim"), lit(1L).as("n")))
      .repartition(32)
      .localCheckpoint(true)
    val lab = ids.select(col("doc_id"),
        when(pmod(graft.ops.Portable.md5Long(
          concat(lit("y:"), col("doc_id").cast("string"))), lit(2L)) === 0, 1L)
          .otherwise(-1L).as("y"))
      .localCheckpoint(true)
    val nFeat = feat.count()
    println(s"AB-CLASSIFIER corpus docs=$nDocs dims=$dims iters=$iters feat_rows=$nFeat")

    val shuffleBytes = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten); ()
        }
      }
    })

    /** Per-iteration distributed GD: the same integer trajectory, but each
      * iteration recomputes A·w from the corpus — margin_d = Σ_i x_di·w_i
      * per doc (join vs broadcast weights + doc aggregation), then
      * g_i = Σ_d x_di·margin_d − b_i·2^S (dim aggregation) — two shuffles
      * per iteration, driver sees only the dims+1 gradient (MLlib's
      * treeAggregate shape). b is corpus-computed once, like the summary
      * leg's moments.
      */
    def trainPerIteration(): Array[Long] = {
      import spark.implicits._
      val b = LinearClassifier.moments(feat, lab).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val n = dims + 1
      val idx = (d: Long) => (d + 1).toInt
      // Step divisor from trace(A) — computed once, one extra bounded agg.
      val trace = feat.select(col("dim"), (col("n") * col("n")).as("nn"))
        .groupBy(col("dim")).agg(sum(col("nn")).as("a"))
        .agg(sum(col("a"))).head().getLong(0)
      val k = java.lang.Long.toBinaryString(trace).length
      var w = Array.fill(n)(0L)
      for (_ <- 1 to iters) {
        val wDf = w.indices.map(i => ((i - 1).toLong, w(i))).toDF("dim", "w")
        val margins = feat.join(broadcast(wDf), "dim")
          .groupBy(col("doc_id")).agg(sum(col("n") * col("w")).as("margin"))
        val aw = feat.join(margins, "doc_id")
          .groupBy(col("dim")).agg(sum(col("n") * col("margin")).as("aw"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val g = Array.tabulate(n) { i =>
          aw.getOrElse((i - 1).toLong, 0L) -
            (b.getOrElse((i - 1).toLong, 0L) << LinearClassifier.ScaleBits)
        }
        w = Array.tabulate(n) { i =>
          w(i) - (if (g(i) >= 0) g(i) >> k else -((-g(i)) >> k))
        }
      }
      w
    }

    def timed[T](label: String)(body: () => T): T = {
      var minWall = Double.MaxValue
      var bytes = 0L
      var out: Option[T] = None
      (1 to 3).foreach { _ =>
        org.apache.spark.sql.graft.GraftInternals.drainListenerBus(spark)
        shuffleBytes.set(0L)
        val t0 = System.nanoTime()
        val r = body()
        val wall = (System.nanoTime() - t0) / 1e9
        org.apache.spark.sql.graft.GraftInternals.drainListenerBus(spark)
        if (wall < minWall) { minWall = wall; bytes = shuffleBytes.get(); out = Some(r) }
      }
      println(f"AB-CLASSIFIER $label%-12s wall=$minWall%.2f s " +
        f"shuffle_write=${bytes / 1048576.0}%.1f MiB")
      out.get
    }

    val wSummary = timed("summary_gd") { () =>
      val df = LinearClassifier.train(spark, feat, lab, dims, iters)
      df.orderBy("dim").collect().map(_.getLong(1))
    }
    val wPerIter = timed("periter_gd") { () => trainPerIteration() }

    require(wSummary.sameElements(wPerIter),
      s"trajectory divergence: ${wSummary.toSeq} vs ${wPerIter.toSeq}")
    println(s"AB-CLASSIFIER identical_weights=true nonzero=${wSummary.count(_ != 0L)}")
    spark.stop()
  }
}
