package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted ANN index lifecycle — build once, SAVE, reload and search
  * many times. The n-family query entries rebuild their index inside one
  * plan (the right shape for a self-contained oracled query); a
  * production retrieval service amortizes the build across millions of
  * queries, which needs the index as a durable LAYOUT:
  *
  *   - store: `<path>/cell=K/part-*.parquet` — the IVF cell is a Hive
  *     partition column, so probing a cell prunes to one directory at
  *     PLANNING time (`PartitionFilters`, before any file opens). Search
  *     cost scales with probed cells because the layout enforces it, not
  *     because a join happens to be selective.
  *   - search: the (small, bounded) query set's probe cells are collected
  *     and pushed as an `isin` partition predicate; candidates join per
  *     cell and rank by exact cosine — identical semantics (and, for the
  *     static quantizer, identical RESULTS) to [[Similarity.annIvfStatic]],
  *     pinned in IndexStoreSpec.
  *
  * The static sign-pattern quantizer matches `n4b`; a trained quantizer
  * (n4/n9/n11) persists the same way with its centroid/codebook table
  * written next to the cells.
  */
object IndexStore {

  private def cellOf(v: org.apache.spark.sql.Column, dims: Int) =
    (0 until dims).map { j =>
      when(element_at(v, j + 1) >= 0, 1 << (dims - 1 - j)).otherwise(0)
    }.reduce(_ + _)

  /** Build + persist the IVF store: (vec_id, v, cell) partitioned by cell. */
  def saveIvfStatic(vectors: DataFrame, dims: Int, path: String): Unit = {
    require(dims >= 1 && dims <= 16)
    vectors
      .select(col("vec_id"), col("v"), cellOf(col("v"), dims).as("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(path)
  }

  /** Search the persisted store: top-k per query by exact cosine within
    * the query's cell. `queries`: (query_id, qv ARRAY<DOUBLE>) — ANN's
    * contract is a bounded query set, so collecting its distinct probe
    * cells (≤ 2^dims values) is a scalar-sized driver round-trip that
    * buys planning-time directory pruning on the corpus-sized store.
    */
  def searchIvfStatic(
      spark: SparkSession, path: String, queries: DataFrame,
      dims: Int, k: Int): DataFrame = {
    val q = queries.select(col("query_id"), col("qv"),
      cellOf(col("qv"), dims).as("cell"))
    val probeCells = q.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val store = spark.read.parquet(path)
      .filter(col("cell").isin(probeCells: _*))
    val scored = q.join(store, "cell")
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("cand_id"),
        round(Similarity.cosine(col("qv"), col("v")), 4).as("cosine"))
    Similarity.rankTopK(scored, k).orderBy(col("query_id"), col("rnk"))
  }

  /** Persist the TUNED layout ([[Similarity.annIvfStaticTuned]]'s
    * parameters — 32 cells, 3-way redundant assignment): every vector is
    * written into its home cell AND its two least-confident-flip cells,
    * so the store is ×3 larger and queries buy boundary recall with
    * probe count instead of scan fraction. Same Hive `cell=K` partition
    * layout as [[saveIvfStatic]] — probing prunes directories at
    * planning time.
    */
  def saveIvfTuned(vectors: DataFrame, path: String): Unit =
    Similarity.tunedAssigned(vectors)
      .select(col("vec_id"), col("v"), col("cell").as("home"),
        explode(Similarity.tunedCandMasks).as("m"))
      .select(col("vec_id"), col("v"),
        col("home").bitwiseXOR(col("m")).as("cell"))
      // The 3 assignment cells (home, flip b1, flip b2) coincide when two
      // coordinates tie on |v| (b1 == b2) — dedup so the store never
      // carries duplicate (vec_id, cell) rows; search results are
      // unchanged either way (rankTopK's insert-time dedup), this keeps
      // the LAYOUT canonical: ≤3 rows per vector, exactly 3 absent ties.
      .dropDuplicates("vec_id", "cell")
      .write.mode("overwrite").partitionBy("cell").parquet(path)

  /** Search the persisted tuned store with the 8-probe perturbation set.
    * Result-identical to [[Similarity.annIvfStaticTuned]] when `queries`
    * is the corpus itself (pinned in IndexStoreSpec): a pair met through
    * several shared cells collapses in the rank stage's insert-time
    * dedup, exactly as in the one-plan spelling.
    */
  def searchIvfTuned(
      spark: SparkSession, path: String, queries: DataFrame,
      k: Int): DataFrame = {
    val q = Similarity.tunedAssigned(
        queries.select(col("query_id").as("vec_id"), col("qv").as("v")))
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("cell"),
        explode(Similarity.tunedQueryMasks).as("m"))
      .select(col("query_id"), col("qv"),
        col("cell").bitwiseXOR(col("m")).as("cell"))
    val probeCells = q.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val store = spark.read.parquet(path)
      .filter(col("cell").isin(probeCells: _*))
    val scored = q.join(store, "cell")
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("cand_id"),
        round(Similarity.cosine(col("qv"), col("v")), 4).as("cosine"))
    Similarity.rankTopK(scored, k).orderBy(col("query_id"), col("rnk"))
  }
}
