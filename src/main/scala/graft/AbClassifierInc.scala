package graft

import java.nio.file.Files

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ml.{ClassifierStore, LinearClassifier}

/** A/B: INCREMENTAL classifier retraining from stored sufficient
  * statistics ([[graft.ml.ClassifierStore]]) vs a from-scratch retrain on
  * the accumulated corpus — the same asymptotic question AbDedupInc
  * answers for the dedup index. A curation pipeline retrains its quality
  * filter every arriving batch; the full retrain pays the Gram pass over
  * corpus + batch, the incremental path pays it over the BATCH only plus
  * a dims-bounded store scan, and additivity of the integer statistics
  * makes the two weight vectors bit-identical (asserted each point).
  *
  * Corpus: FACTOR× replicas of a BATCH-sized synthetic feature relation
  * (distinct doc_ids per replica — same corpus construction idea as
  * AbDedupInc), batch = AB_BATCH docs. Expect the full-retrain leg to
  * grow linearly with FACTOR while the incremental leg stays flat.
  *
  *   AB_BATCH=4000 AB_FACTORS=16,64,256 sbt "runMain graft.AbClassifierInc"
  */
object AbClassifierInc {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val batchDocs = sys.env.getOrElse("AB_BATCH", "4000").toInt
    val factors = sys.env.getOrElse("AB_FACTORS", "16,64,256")
      .split(",").map(_.trim.toInt).toSeq
    val dims = 32
    val iters = 32

    // Same deterministic synthetic features as AbClassifier: ~60% bucket
    // density, counts 1..8, bias row; labels are md5 sign draws. `base`
    // shifts doc_ids so corpus replicas and the probe batch are disjoint.
    def draw(salt: String, j: Column): Column =
      graft.ops.Portable.md5Long(
        concat(lit(salt), col("doc_id").cast("string"), lit(":"), j.cast("string")))
    def featOf(ids: DataFrame): DataFrame = ids
      .select(col("doc_id"), explode(sequence(lit(0), lit(dims - 1))).as("dim"))
      .filter(pmod(draw("f:", col("dim")), lit(5L)) < 3)
      .select(col("doc_id"), col("dim").cast("long").as("dim"),
        (pmod(draw("c:", col("dim")), lit(8L)) + 1).as("n"))
      .unionAll(ids.select(col("doc_id"), lit(-1L).as("dim"), lit(1L).as("n")))
    def labOf(ids: DataFrame): DataFrame = ids.select(col("doc_id"),
      when(pmod(graft.ops.Portable.md5Long(
        concat(lit("y:"), col("doc_id").cast("string"))), lit(2L)) === 0, 1L)
        .otherwise(-1L).as("y"))
    def idsAt(base: Long, nDocs: Long): DataFrame =
      spark.range(base, base + nDocs).select(col("id").as("doc_id"))

    def timed[T](body: => T): (Double, T) = {
      val t0 = System.nanoTime()
      val r = body
      ((System.nanoTime() - t0) / 1e9, r)
    }

    val batchIds = idsAt(-batchDocs.toLong, batchDocs.toLong) // negative ids: disjoint
    println(s"AB-CLASSIFIER-INC batch_docs=$batchDocs dims=$dims iters=$iters")
    factors.foreach { f =>
      val corpus = idsAt(0L, f.toLong * batchDocs)
      val dir = Files.createTempDirectory(s"graft_clf_inc_$f").toString
      // One-time store build on the accumulated corpus (amortized across
      // every later increment — reported, not charged to the probe).
      val (buildS, _) = timed {
        ClassifierStore.save(featOf(corpus), labOf(corpus), s"$dir/st")
      }
      // Incremental: one batch pass (append) + dims-bounded train.
      val (incS, wInc) = timed {
        ClassifierStore.append(featOf(batchIds), labOf(batchIds), s"$dir/st")
        ClassifierStore.trainStored(spark, s"$dir/st", dims, iters)
          .orderBy("dim").collect().map(_.getLong(1))
      }
      // Full retrain: the Gram pass over corpus + batch.
      val (fullS, wFull) = timed {
        val union = corpus.unionAll(batchIds)
        LinearClassifier.train(spark, featOf(union), labOf(union), dims, iters)
          .orderBy("dim").collect().map(_.getLong(1))
      }
      require(wInc.sameElements(wFull),
        s"trajectory divergence at factor $f")
      println(f"AB-CLASSIFIER-INC factor=$f%-4d corpus=${f * batchDocs}%-8d " +
        f"store_build=$buildS%.2f s incremental=$incS%.2f s " +
        f"full_retrain=$fullS%.2f s identical_weights=true")
    }
    spark.stop()
  }
}
