package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted near-duplicate index — the INCREMENTAL curation shape.
  * The batch dedup operators (d2/d3/d16) self-join a corpus; a
  * production pipeline curates ARRIVING batches against everything
  * already accepted, and re-shingling + re-hashing the accumulated
  * corpus per batch is O(corpus) work for O(batch) questions. This
  * store persists the two relations the MinHash-LSH operator derives:
  *
  *   `<path>/bands`:    (band, bucket, id) — the blocking state, Hive-
  *                      partitioned by `band` (bands are always probed
  *                      together, but the partition keeps per-band files
  *                      mergeable and lets a band count change migrate)
  *   `<path>/shingles`: (id, s) — the exact-refine state
  *
  * [[Dedup.minhashBanded]]'s hash family is deterministic across
  * batches, so probing stored bands with a new batch's bands is
  * EQUAL to running the batch operator on (stored ∪ new) and keeping
  * the pairs that touch the new batch — DedupStoreSpec pins that
  * equality. [[append]] adds the new batch's rows to both relations;
  * nothing old is ever recomputed or rewritten.
  *
  * Scale shape: save/append write once, partitioned; [[searchNew]]
  * shuffles only the NEW batch's bands/shingles plus the matched
  * buckets' rows — the stored corpus streams through the band
  * equi-join and the refine join, never through a self-join.
  */
object DedupStore {

  private def write(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int, bands: Int, rowsPerBand: Int, path: String,
      mode: String): Unit = {
    val sh = Dedup.shingleIndex(docs, idCol, textCol, n).localCheckpoint(true)
    Dedup.minhashBanded(sh, bands, rowsPerBand)
      .write.mode(mode).partitionBy("band").parquet(s"$path/bands")
    sh.write.mode(mode).parquet(s"$path/shingles")
    // Per-doc shingle counts, stored so the refine never re-aggregates
    // the corpus-sized shingle relation per probe.
    sh.groupBy(col("id")).agg(count(lit(1)).as("n_sh"))
      .write.mode(mode).parquet(s"$path/counts")
    org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint(sh)
  }

  /** Build + persist the index for an initial corpus. */
  def save(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int, bands: Int, rowsPerBand: Int, path: String): Unit =
    write(docs, idCol, textCol, n, bands, rowsPerBand, path, "overwrite")

  /** Add a new batch to the stored index (call AFTER [[searchNew]] has
    * adjudicated it). Append-only: old state is untouched.
    */
  def append(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int, bands: Int, rowsPerBand: Int, path: String): Unit =
    write(docs, idCol, textCol, n, bands, rowsPerBand, path, "append")

  /** Near-duplicate pairs of a NEW batch against the stored corpus AND
    * within the batch itself, exact-Jaccard-refined at `threshold` —
    * without touching the stored corpus beyond the band equi-join and
    * the refine of matched candidates. Returns (doc_a, doc_b, jaccard)
    * with the [[Dedup.minhashLshPairs]] orientation (doc_a < doc_b);
    * ids must be globally unique across batches (caller contract).
    */
  def searchNew(
      spark: SparkSession, path: String,
      newDocs: DataFrame, idCol: String, textCol: String,
      n: Int, bands: Int, rowsPerBand: Int, threshold: Double): DataFrame = {
    val newSh = Dedup.shingleIndex(newDocs, idCol, textCol, n)
      .localCheckpoint(true)
    val newBands = Dedup.minhashBanded(newSh, bands, rowsPerBand)
      .localCheckpoint(true) // probed twice (vs store, vs itself)
    val stored = spark.read.parquet(s"$path/bands")
    // Candidates: new×stored (both orientations) ∪ new×new — exactly the
    // (stored ∪ new) candidate set minus stored×stored.
    def pairsOf(a: DataFrame, b: DataFrame): DataFrame =
      a.select(col("band"), col("bucket"), col("id").as("doc_a"))
        .join(b.select(col("band").as("band_b"), col("bucket").as("bucket_b"),
          col("id").as("doc_b")),
          col("band") === col("band_b") && col("bucket") === col("bucket_b") &&
            col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"))
    val candidates = pairsOf(newBands, stored)
      .unionAll(pairsOf(stored, newBands))
      .unionAll(pairsOf(newBands, newBands))
      .dropDuplicates("doc_a", "doc_b")
      // Consumed three times below (id restriction + both refine joins).
      .localCheckpoint(true)
    // candidates' EAGER checkpoint just truncated lineage above newBands,
    // so newBands' backing is no longer reachable from the result plan
    // and the caller's standard post-consumption sweep could never free
    // it (the round-10 n13 leak class). Its last consumer ran inside the
    // checkpoint materialization — release it now. newSh stays: allSh
    // below keeps it reachable.
    org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint(newBands)
    // Refine touches only candidate-involved docs: restrict the stored
    // shingle scan to those ids (a batch-hit-sized set), and read the
    // per-doc counts from the store instead of re-aggregating the
    // corpus-sized shingle relation — the two O(corpus) stages the first
    // spelling of this probe still paid per increment.
    val candIds = candidates.select(col("doc_a").as("id"))
      .unionAll(candidates.select(col("doc_b").as("id")))
      .distinct()
    val allSh = spark.read.parquet(s"$path/shingles").unionAll(newSh)
      .join(candIds, Seq("id"), "left_semi")
    val counts = spark.read.parquet(s"$path/counts")
      .unionAll(newSh.groupBy(col("id")).agg(count(lit(1)).as("n_sh")))
    Dedup.refineJaccardCounted(candidates, allSh, counts, threshold)
  }
}
