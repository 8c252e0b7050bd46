package graft

import org.apache.spark.sql.functions._
import graft.ml.LinearClassifier

/** graft.ml.LinearClassifier: the fastText-style quality-classifier
  * trainer (t22/t23). The integer-GD trajectory must actually LEARN the
  * weak stopword signal (accuracy well above majority class), the fixed
  * point must be deterministic across partitionings (the whole reason for
  * integer arithmetic), and the scoring join must reproduce the margins
  * the trainer's own summary implies.
  */
class LinearClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val Dims = 32
  private val Iters = 32

  private lazy val docs = Tables.documents(spark, Sf001)
  private lazy val feat = LinearClassifier.features(docs, "doc_id", "text", Dims)
  private lazy val lab = LinearClassifier.weakLabels(docs, "doc_id", "text")

  test("training recovers the weak-label signal: accuracy beats majority by a margin") {
    val w = LinearClassifier.train(spark, feat, lab, Dims, Iters)
    val scored = LinearClassifier.score(feat, lab, w)
    val n = scored.count().toDouble
    val acc = scored.agg(sum(col("correct"))).head().getLong(0) / n
    val majority = {
      val pos = lab.filter(col("y") === 1L).count().toDouble
      math.max(pos, n - pos) / n
    }
    // The hashed stopword signal is linearly recoverable up to bucket
    // collisions; the quantized trajectory pays a tax vs float LSQ but
    // must still clearly beat always-guess-majority.
    assert(acc >= 0.70, s"train accuracy $acc")
    assert(acc > majority + 0.10, s"acc $acc vs majority $majority")
  }

  test("the integer fixed point is partitioning-invariant (bit-identical weights)") {
    val w1 = LinearClassifier.train(spark, feat, lab, Dims, Iters)
      .orderBy("dim").collect().map(r => (r.getLong(0), r.getLong(1)))
    val w2 = LinearClassifier.train(spark, feat.repartition(13), lab.repartition(7),
      Dims, Iters).orderBy("dim").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(w1.sameElements(w2))
    assert(w1.length == Dims + 1 && w1.head._1 == -1L) // bias row present
    assert(w1.exists(_._2 != 0L), "training moved the weights")
  }

  test("gram summary is symmetric and its trace bounds the step soundly") {
    val a = LinearClassifier.gram(feat).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    a.foreach { case ((i, j), v) => assert(a((j, i)) == v, s"asym at ($i,$j)") }
    val trace = a.collect { case ((i, j), v) if i == j => v }.sum
    assert(trace > 0)
    // Diagonal dominance of the trace over any single entry: the step
    // divisor 2^bitlen(trace) ≥ trace ≥ λ_max is the stability argument.
    assert(a.values.forall(_ <= trace))
  }

  test("ridge sweep: shift 63 reproduces the unregularized train; L1 shrinks with lambda") {
    val sweep = LinearClassifier.trainRidgeSweep(spark, feat, lab, Dims, Iters,
      Seq(63, 12, 8, 4)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val at63 = sweep.filter(_._1 == 63L).map(t => (t._3, t._4)).sortBy(_._1)
    val plain = LinearClassifier.train(spark, feat, lab, Dims, Iters)
      .orderBy("dim").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(at63.sameElements(plain), "lambda=0 leg must equal the t22 trajectory")
    assert(sweep.filter(_._1 == 63L).forall(_._2 == 0L), "shift 63 must mean lambda 0")
    val l1 = Seq(63L, 12L, 8L, 4L).map(s =>
      sweep.filter(_._1 == s).map(t => math.abs(t._4)).sum)
    assert(l1 == l1.sorted.reverse, s"L1 must shrink monotonically with lambda: $l1")
    // The lambda values themselves must ascend as the shift tightens.
    val lams = Seq(63L, 12L, 8L, 4L).map(s => sweep.find(_._1 == s).get._2)
    assert(lams == lams.sorted, s"lambda must grow as shift shrinks: $lams")
  }

  test("empty-text docs still score via the bias pseudo-feature") {
    // split("") yields [""], so an empty doc carries one hashed row for
    // the empty token plus the bias row — and always gets a margin.
    val one = Seq(("x", "")).toDF("doc_id", "text")
    val f = LinearClassifier.features(one, "doc_id", "text", Dims)
    assert(f.filter(col("dim") === -1L).count() == 1)
    val l = LinearClassifier.weakLabels(one, "doc_id", "text")
    val w = LinearClassifier.train(spark, f, l, Dims, 4)
    assert(LinearClassifier.score(f, l, w).count() == 1)
  }
}
