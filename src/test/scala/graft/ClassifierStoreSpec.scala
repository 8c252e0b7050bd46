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

  test("remove subtracts exactly: weights bit-identical to a train that never saw the docs") {
    // Takedown by negative partial statistics: integer additivity makes
    // the subtraction EXACT, so post-remove training must equal a
    // from-scratch train on the surviving docs bit for bit — including
    // when the removed set cuts ACROSS increment boundaries.
    val dir = Files.createTempDirectory("graft_clf_remove").toString
    val a = docs.filter(col("doc_id") < 250)
    val b = docs.filter(col("doc_id") >= 250)
    ClassifierStore.save(featOf(a), labOf(a), s"$dir/st")
    ClassifierStore.append(featOf(b), labOf(b), s"$dir/st")
    val gone = docs.filter(col("doc_id") >= 200 && col("doc_id") < 300)
    ClassifierStore.remove(featOf(gone), labOf(gone), s"$dir/st")
    val got = weights(ClassifierStore.trainStored(spark, s"$dir/st", Dims, Iters))
    val survivors = docs.filter(col("doc_id") < 200 || col("doc_id") >= 300)
    val want = weights(LinearClassifier.train(
      spark, featOf(survivors), labOf(survivors), Dims, Iters))
    assert(got == want, "post-remove weights diverged from never-saw-them train")
    // Fixture sanity: the removal changed the model at all.
    val all = weights(LinearClassifier.train(spark, featOf(docs), labOf(docs),
      Dims, Iters))
    assert(got != all, "removal had no observable effect; fixture too weak")
  }

  test("remove is exactly-once: a replayed takedown and a never-stored id are refused") {
    // Subtraction is not naturally idempotent (unlike the anti-join
    // stores), so the membership + takedown ledgers must convert both
    // silent-corruption paths into loud errors — r14 ADVICE.
    val dir = Files.createTempDirectory("graft_clf_once").toString
    ClassifierStore.save(featOf(docs), labOf(docs), s"$dir/st")
    val gone = docs.filter(col("doc_id") >= 200 && col("doc_id") < 260)
    ClassifierStore.remove(featOf(gone), labOf(gone), s"$dir/st")
    val after = weights(ClassifierStore.trainStored(spark, s"$dir/st", Dims, Iters))
    val replay = intercept[IllegalArgumentException] {
      ClassifierStore.remove(featOf(gone), labOf(gone), s"$dir/st")
    }
    assert(replay.getMessage.contains("already removed"))
    val phantom = docs.filter(col("doc_id") >= 200 && col("doc_id") < 260)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val never = intercept[IllegalArgumentException] {
      ClassifierStore.remove(featOf(phantom), labOf(phantom), s"$dir/st")
    }
    assert(never.getMessage.contains("never stored"))
    // Neither refused call may have touched the statistics.
    val unchanged = weights(ClassifierStore.trainStored(spark, s"$dir/st", Dims, Iters))
    assert(unchanged == after, "a refused remove still mutated the store")
  }

  test("remove under crash at every kill point: pre-commit crashes leave the sums untouched and the retry lands exactly once") {
    // The r15 ADVICE window: the old remove appended the takedown ledger
    // BEFORE the negated partials, so a crash in between made a resumed
    // composed takedown silently skip the subtraction forever. The
    // stage-then-commit layout closes it structurally: negated partials
    // go to an inert per-takedown staging dir first, and the SINGLE
    // ledger append is the commit — crash anywhere before it and the
    // store is bit-identical to never having started; crash after it
    // and the takedown is already fully live.
    val gone = docs.filter(col("doc_id") >= 200 && col("doc_id") < 260)
    val survivors = docs.filter(col("doc_id") < 200 || col("doc_id") >= 260)
    val want = weights(LinearClassifier.train(
      spark, featOf(survivors), labOf(survivors), Dims, Iters))
    val withAll = weights(LinearClassifier.train(
      spark, featOf(docs), labOf(docs), Dims, Iters))
    assert(want != withAll, "fixture too weak: removal has no effect")
    // Kill points: before the gram stage write (0), between the two
    // stage writes (1), before the ledger commit (2).
    for (k <- 0 to 2) {
      val dir = Files.createTempDirectory(s"graft_clf_kill$k").toString
      ClassifierStore.save(featOf(docs), labOf(docs), s"$dir/st")
      ClassifierStore.removeFailAfterWrites = k
      val crash = intercept[java.io.IOException] {
        ClassifierStore.remove(featOf(gone), labOf(gone), s"$dir/st")
      }
      assert(crash.getMessage.contains("injected"))
      // Pre-commit: trainStored must not see the staged (uncommitted)
      // partials — weights equal the never-removed train.
      val mid = weights(ClassifierStore.trainStored(spark, s"$dir/st", Dims, Iters))
      assert(mid == withAll,
        s"kill point $k: an uncommitted takedown already moved the sums")
      // The retry (no recovery step needed — staging dirs are inert and
      // idempotent) lands the takedown exactly once.
      ClassifierStore.remove(featOf(gone), labOf(gone), s"$dir/st")
      val got = weights(ClassifierStore.trainStored(spark, s"$dir/st", Dims, Iters))
      assert(got == want,
        s"kill point $k: retried remove diverged from the never-saw train")
      // And a replay after the successful retry is still refused.
      val replay = intercept[IllegalArgumentException] {
        ClassifierStore.remove(featOf(gone), labOf(gone), s"$dir/st")
      }
      assert(replay.getMessage.contains("already removed"))
    }
  }

  test("remove on a pre-upgrade store without the docs ledger fails with the upgrade message") {
    val dir = Files.createTempDirectory("graft_clf_preup").toString
    ClassifierStore.save(featOf(docs), labOf(docs), s"$dir/st")
    // Simulate a store written before the membership ledger existed.
    import scala.jdk.CollectionConverters._
    val docsDir = java.nio.file.Paths.get(s"$dir/st/docs")
    java.nio.file.Files.walk(docsDir).iterator().asScala.toSeq.reverse
      .foreach(java.nio.file.Files.delete)
    val gone = docs.filter(col("doc_id") < 50)
    val err = intercept[IllegalArgumentException] {
      ClassifierStore.remove(featOf(gone), labOf(gone), s"$dir/st")
    }
    assert(err.getMessage.contains("membership"),
      s"expected the explicit upgrade message, got: ${err.getMessage}")
  }
}
