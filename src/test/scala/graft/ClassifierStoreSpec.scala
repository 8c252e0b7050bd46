package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ml.{ClassifierStore, LinearClassifier}

/** Persisted classifier statistics: incremental training from stored
  * per-increment partial Gram/moment rows must be BIT-IDENTICAL to a
  * from-scratch train on the union — the additivity of the integer
  * sufficient statistics is the store's whole claim, so it is pinned
  * exactly, not approximately.
  */
class ClassifierStoreSpec extends SparkSpec {

  private val Dims = 32
  private val Iters = 32

  private def docs = Tables.documents(spark, Sf001)
    .select(col("doc_id"), col("text"))

  private def featOf(d: org.apache.spark.sql.DataFrame) =
    LinearClassifier.features(d, "doc_id", "text", Dims)

  private def labOf(d: org.apache.spark.sql.DataFrame) =
    LinearClassifier.weakLabels(d, "doc_id", "text")

  private def weights(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("dim").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("save + append increments train bit-identically to the union batch train") {
    val dir = Files.createTempDirectory("graft_clf_store").toString
    val a = docs.filter(col("doc_id") < 200)
    val b = docs.filter(col("doc_id") >= 200 && col("doc_id") < 350)
    val c = docs.filter(col("doc_id") >= 350)
    ClassifierStore.save(featOf(a), labOf(a), s"$dir/st")
    ClassifierStore.append(featOf(b), labOf(b), s"$dir/st")
    ClassifierStore.append(featOf(c), labOf(c), s"$dir/st")
    val inc = weights(ClassifierStore.trainStored(spark, s"$dir/st", Dims, Iters))
    val full = weights(LinearClassifier.train(spark, featOf(docs), labOf(docs),
      Dims, Iters))
    assert(inc == full, s"incremental $inc vs union $full")
    assert(inc.exists(_._2 != 0L), "training moved the weights")
    // The split must be non-trivial: every increment contributes docs.
    assert(a.count() > 0 && b.count() > 0 && c.count() > 0)
  }

  test("the stored relations stay dims-bounded per increment (never corpus-sized)") {
    val dir = Files.createTempDirectory("graft_clf_bound").toString
    ClassifierStore.save(featOf(docs), labOf(docs), s"$dir/st")
    val gramRows = spark.read.parquet(s"$dir/st/gram").count()
    val momRows = spark.read.parquet(s"$dir/st/moments").count()
    assert(gramRows <= (Dims + 1).toLong * (Dims + 1),
      s"gram rows $gramRows exceed (dims+1)^2")
    assert(momRows <= (Dims + 1).toLong, s"moment rows $momRows exceed dims+1")
  }

  test("trainStored on a single saved corpus equals the direct batch train") {
    val dir = Files.createTempDirectory("graft_clf_one").toString
    ClassifierStore.save(featOf(docs), labOf(docs), s"$dir/st")
    val stored = weights(ClassifierStore.trainStored(spark, s"$dir/st", Dims, Iters))
    val direct = weights(LinearClassifier.train(spark, featOf(docs), labOf(docs),
      Dims, Iters))
    assert(stored == direct)
  }
}
