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
}
