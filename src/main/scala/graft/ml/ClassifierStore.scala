package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted sufficient statistics for [[LinearClassifier]] — the
  * INCREMENTAL training shape (the classifier twin of
  * [[graft.dedup.DedupStore]]'s incremental dedup). A production curation
  * pipeline retrains its quality filter as crawl batches arrive; rerunning
  * the Gram pass over the accumulated corpus is O(corpus) work for an
  * O(batch) update. This store exploits that the trainer's sufficient
  * statistics are ADDITIVE — Gram(A ∪ B) = Gram(A) + Gram(B) and likewise
  * the moment vector (disjoint doc sums) — so an arriving batch costs ONE
  * pass over the batch plus a driver solve on the (dims+1)²-bounded sum:
  *
  *   `<path>/gram`:    (i, j, a)   — per-increment partial Gram rows
  *   `<path>/moments`: (dim, by)   — per-increment partial moment rows
  *
  * [[append]] writes the new batch's partial rows append-only (nothing old
  * is read or rewritten — the same discipline as DedupStore.append);
  * [[trainStored]] reads all increments, sums duplicate keys (a bounded
  * ≤(dims+1)²·increments-row aggregation of a dims-bounded relation — KB,
  * not corpus), and runs the identical exact integer GD. Because every
  * statistic is an exact 64-bit integer, incremental-trained weights are
  * BIT-IDENTICAL to a from-scratch train on the union — pinned in
  * ClassifierStoreSpec, not assumed. (A float trainer could never make
  * this guarantee: its parallel sums differ between the union pass and
  * the per-batch passes.)
  *
  * Scale shape: append touches only the batch (one map-side-combinable
  * aggregation, dims²-bounded output); trainStored's scan is dims-bounded
  * regardless of corpus size or increment count; no stored row is ever
  * shuffled by corpus size. The step divisor 2^bitlen(trace) re-adapts to
  * the GROWN corpus automatically because the trace is summed with the
  * rest of the diagonal.
  */
object ClassifierStore {

  private def write(feat: DataFrame, lab: DataFrame, path: String,
                    mode: String): Unit = {
    LinearClassifier.gram(feat).write.mode(mode).parquet(s"$path/gram")
    LinearClassifier.moments(feat, lab).write.mode(mode).parquet(s"$path/moments")
    // Membership ledger (doc_id), one row per stored doc: [[remove]]'s
    // guard against the two silent-corruption paths of statistics
    // subtraction (removing a doc never stored, or removing one twice).
    // One long per doc — negligible next to any store that matters.
    feat.select(col("doc_id")).distinct()
      .write.mode(mode).parquet(s"$path/docs")
  }

  /** Build + persist the statistics for an initial corpus. */
  def save(feat: DataFrame, lab: DataFrame, path: String): Unit =
    write(feat, lab, path, "overwrite")

  /** Add a new batch's partial statistics. Append-only; O(batch). */
  def append(feat: DataFrame, lab: DataFrame, path: String): Unit =
    write(feat, lab, path, "append")

  /** Takedown: subtract a set of documents' statistics EXACTLY — the
    * classifier's right-to-be-forgotten path, and the one store where
    * removal is cheaper than an anti-join rewrite: because every
    * statistic is an additive exact integer, removing docs is appending
    * their NEGATED partial Gram/moment rows (Gram(S \ R) = Gram(S) −
    * Gram(R), and [[trainStored]]'s per-key sum cancels them out).
    * Callers pass the removed docs' (feat, lab) recomputed from the
    * original content — a takedown request names the content being
    * removed, so it is at hand; the store itself keeps only the
    * dims-bounded sums. O(removed batch), append-only, and the
    * resulting weights are BIT-IDENTICAL to a from-scratch train that
    * never saw the removed docs (ClassifierStoreSpec pins it) — a
    * float trainer could only approximate this.
    *
    * UNLIKE the anti-join stores (where re-removing an absent id is a
    * no-op), subtraction is NOT naturally idempotent: replaying a
    * takedown, or passing docs never stored, would silently corrupt the
    * summed statistics. The store therefore keeps a membership ledger
    * (`<path>/docs`, written by save/append) and a takedown ledger
    * (`<path>/removed`, appended here), and remove REFUSES ids that are
    * not currently stored or were already removed — each takedown is
    * exactly-once by construction, not by caller discipline.
    */
  def remove(feat: DataFrame, lab: DataFrame, path: String): Unit = {
    val spark = feat.sparkSession
    val ids = feat.select(col("doc_id")).distinct().localCheckpoint(true)
    val stored = spark.read.parquet(s"$path/docs")
    val unknown = ids.join(stored, Seq("doc_id"), "left_anti").count()
    require(unknown == 0,
      s"ClassifierStore.remove: $unknown doc ids were never stored — " +
        "subtracting them would corrupt the summed statistics")
    val removedPath = new org.apache.hadoop.fs.Path(s"$path/removed")
    val fs = removedPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(removedPath)) {
      val dup = ids.join(spark.read.parquet(s"$path/removed"),
        Seq("doc_id"), "left_semi").count()
      require(dup == 0,
        s"ClassifierStore.remove: $dup doc ids already removed — " +
          "a replayed takedown would double-subtract their statistics")
    }
    // Ledger FIRST: a crash between the ledger append and the stat
    // appends makes the re-run REFUSE loudly ("already removed") instead
    // of silently double-subtracting — an interrupted takedown surfaces
    // as an error to reconcile, never as corrupted sums. (A production
    // deployment would wrap all three appends in one manifest commit.)
    ids.write.mode("append").parquet(s"$path/removed")
    LinearClassifier.gram(feat)
      .select(col("i"), col("j"), (-col("a")).as("a"))
      .write.mode("append").parquet(s"$path/gram")
    LinearClassifier.moments(feat, lab)
      .select(col("dim"), (-col("by")).as("by"))
      .write.mode("append").parquet(s"$path/moments")
    org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint(ids)
  }

  /** Train on everything the store has seen: sum the per-increment
    * partial rows per key, then the exact integer GD ([[LinearClassifier
    * .gdSolve]] — the same trajectory the batch trainer runs). Returns
    * the weight relation (dim, w), dims+1 rows, dim -1 = bias.
    */
  def trainStored(spark: SparkSession, path: String,
                  dims: Int, iters: Int): DataFrame = {
    val aRows = spark.read.parquet(s"$path/gram")
      .groupBy(col("i"), col("j")).agg(sum(col("a")).as("a"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val bRows = spark.read.parquet(s"$path/moments")
      .groupBy(col("dim")).agg(sum(col("by")).as("by"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    LinearClassifier.weightsDf(spark, LinearClassifier.gdSolve(aRows, bRows, dims, iters))
  }
}
