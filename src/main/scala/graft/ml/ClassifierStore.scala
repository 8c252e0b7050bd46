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
  *   `<path>/docs`:    (doc_id)    — membership ledger, one row per
  *                                   stored doc ([[remove]]'s guard)
  *   `<path>/takedowns/<token>/`   — staged negated partials of one
  *                                   takedown (live iff committed)
  *   `<path>/removed`: (doc_id, token) — the takedown COMMIT ledger
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

  /** TEST-ONLY failpoint: the number of [[remove]] writes (takedown
    * gram dir, takedown moments dir, ledger commit) completed before an
    * injected IOException — k = 0..2 covers a crash before/between/after
    * every write. Int.MaxValue (= never) in production; the injected
    * throw resets it. The [[graft.dedup.DedupStore.swapFailAfterRenames]]
    * idiom, for the append path.
    */
  @volatile private[graft] var removeFailAfterWrites: Int = Int.MaxValue

  private def removeFailpoint(what: String): Unit = {
    if (removeFailAfterWrites != Int.MaxValue) {
      if (removeFailAfterWrites <= 0) {
        removeFailAfterWrites = Int.MaxValue
        throw new java.io.IOException(
          s"injected remove crash before write of $what")
      }
      removeFailAfterWrites -= 1
    }
  }

  /** Distinct takedown tokens the `removed` ledger has COMMITTED —
    * the tokens whose staged negated partials are live store state.
    * Legacy ledger rows (pre-token removes, whose negated rows were
    * appended straight into the main relations) have no token column
    * and contribute nothing here.
    */
  private def committedTokens(spark: SparkSession, path: String): Seq[String] = {
    val removedPath = new org.apache.hadoop.fs.Path(s"$path/removed")
    val fs = removedPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(removedPath)) Seq.empty
    else {
      val led = spark.read.option("mergeSchema", "true")
        .parquet(s"$path/removed")
      if (!led.columns.contains("token")) Seq.empty
      else led.select(col("token")).filter(col("token").isNotNull)
        .distinct().collect().map(_.getString(0)).toSeq
    }
  }

  /** Takedown: subtract a set of documents' statistics EXACTLY — the
    * classifier's right-to-be-forgotten path, and the one store where
    * removal is cheaper than an anti-join rewrite: because every
    * statistic is an additive exact integer, removing docs is adding
    * their NEGATED partial Gram/moment rows (Gram(S \ R) = Gram(S) −
    * Gram(R), and [[trainStored]]'s per-key sum cancels them out).
    * Callers pass the removed docs' (feat, lab) recomputed from the
    * original content — a takedown request names the content being
    * removed, so it is at hand; the store itself keeps only the
    * dims-bounded sums. O(removed batch), and the resulting weights are
    * BIT-IDENTICAL to a from-scratch train that never saw the removed
    * docs (ClassifierStoreSpec pins it) — a float trainer could only
    * approximate this.
    *
    * UNLIKE the anti-join stores (where re-removing an absent id is a
    * no-op), subtraction is NOT naturally idempotent: replaying a
    * takedown, or passing docs never stored, would silently corrupt the
    * summed statistics. The store therefore keeps a membership ledger
    * (`<path>/docs`, written by save/append) and a takedown ledger
    * (`<path>/removed`, appended here), and remove REFUSES ids that are
    * not currently stored or were already removed — each takedown is
    * exactly-once by construction, not by caller discipline.
    *
    * Crash safety — STAGE, then COMMIT: the negated partials are first
    * written (idempotent overwrite) to a per-takedown staging dir
    * `<path>/takedowns/<token>/` named by an order-independent digest of
    * the id set; the SINGLE ledger append of (doc_id, token) rows is the
    * commit point, and [[trainStored]] sums a takedown's staged rows iff
    * its token is in the ledger. A crash anywhere before the commit
    * leaves only an inert staged dir that the retried remove overwrites;
    * a ledgered takedown implies its subtraction is live BY CONSTRUCTION
    * — so a resumed composed takedown (ReleaseStore.remove) can safely
    * skip a fully-ledgered id set, with no window where the ledger says
    * removed but the sums still carry the docs (the pre-r16 append-order
    * hazard). ClassifierStoreSpec drives every kill point.
    */
  def remove(feat: DataFrame, lab: DataFrame, path: String): Unit = {
    val spark = feat.sparkSession
    val ids = feat.select(col("doc_id")).distinct().localCheckpoint(true)
    val docsPath = new org.apache.hadoop.fs.Path(s"$path/docs")
    val fs = docsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(docsPath),
      "ClassifierStore.remove: this store has no <path>/docs membership " +
        "ledger (written by save/append since the takedown guard landed) " +
        "— a pre-upgrade store's ids cannot be reconstructed from the " +
        "summed partials, so takedowns require re-saving the store from " +
        "its source corpus first")
    val stored = spark.read.parquet(s"$path/docs")
    val unknown = ids.join(stored, Seq("doc_id"), "left_anti").count()
    require(unknown == 0,
      s"ClassifierStore.remove: $unknown doc ids were never stored — " +
        "subtracting them would corrupt the summed statistics")
    val removedPath = new org.apache.hadoop.fs.Path(s"$path/removed")
    if (fs.exists(removedPath)) {
      val dup = ids.join(spark.read.parquet(s"$path/removed"),
        Seq("doc_id"), "left_semi").count()
      require(dup == 0,
        s"ClassifierStore.remove: $dup doc ids already removed — " +
          "a replayed takedown would double-subtract their statistics")
    }
    // Order-independent digest of the id set: same ids → same staging
    // dir, so a retry after a pre-commit crash overwrites rather than
    // orphans. The summands are md5-mod-small so the sum stays far from
    // long overflow at any takedown size.
    val dg = ids.agg(count(lit(1)).as("n"), min(col("doc_id")).as("lo"),
        max(col("doc_id")).as("hi"),
        sum(pmod(graft.ops.Portable.md5Long(col("doc_id").cast("string")),
          lit(1000003L))).as("s")).first()
    val token = s"${dg.getLong(0)}_${dg.getLong(1)}_${dg.getLong(2)}_${dg.getLong(3)}"
    require(!committedTokens(spark, path).contains(token),
      s"ClassifierStore.remove: takedown token $token already committed")
    // STAGE (idempotent overwrites; uncommitted dirs are inert):
    removeFailpoint(s"takedowns/$token/gram")
    LinearClassifier.gram(feat)
      .select(col("i"), col("j"), (-col("a")).as("a"))
      .write.mode("overwrite").parquet(s"$path/takedowns/$token/gram")
    removeFailpoint(s"takedowns/$token/moments")
    LinearClassifier.moments(feat, lab)
      .select(col("dim"), (-col("by")).as("by"))
      .write.mode("overwrite").parquet(s"$path/takedowns/$token/moments")
    // COMMIT — the one write after which the takedown is live:
    removeFailpoint("removed ledger commit")
    ids.select(col("doc_id"), lit(token).as("token"))
      .write.mode("append").parquet(s"$path/removed")
    org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint(ids)
  }

  /** Train on everything the store has seen: sum the per-increment
    * partial rows per key, then the exact integer GD ([[LinearClassifier
    * .gdSolve]] — the same trajectory the batch trainer runs). Returns
    * the weight relation (dim, w), dims+1 rows, dim -1 = bias.
    */
  def trainStored(spark: SparkSession, path: String,
                  dims: Int, iters: Int): DataFrame = {
    // COMMITTED takedowns contribute their staged negated partials; an
    // uncommitted staging dir (crash before the ledger append) is
    // invisible here by construction. Token count is takedown-bounded —
    // a few extra KB-scale reads, never corpus work.
    val tokens = committedTokens(spark, path)
    tokens.foreach { t =>
      val d = new org.apache.hadoop.fs.Path(s"$path/takedowns/$t/gram")
      require(d.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(d),
        s"ClassifierStore.trainStored: ledger commits takedown $t but its " +
          "staged partials are missing — the store is corrupt")
    }
    val gramDirs = s"$path/gram" +: tokens.map(t => s"$path/takedowns/$t/gram")
    val momDirs = s"$path/moments" +: tokens.map(t => s"$path/takedowns/$t/moments")
    val aRows = spark.read.parquet(gramDirs: _*)
      .groupBy(col("i"), col("j")).agg(sum(col("a")).as("a"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val bRows = spark.read.parquet(momDirs: _*)
      .groupBy(col("dim")).agg(sum(col("by")).as("by"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    LinearClassifier.weightsDf(spark, LinearClassifier.gdSolve(aRows, bRows, dims, iters))
  }
}
