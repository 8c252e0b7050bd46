package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared undirected-graph normalization for the bounded loop operators
  * ([[KCore]], [[LabelPropagation]]).
  */
private[graph] object Undirected {

  /** Self-loop-free symmetrized edge list from a directed pair list.
    * Dedups the CANONICAL orientation (u < v), then mirrors: the
    * distinct — the heaviest shuffle of the build — sees |E| input rows
    * instead of 2|E|, and the mirrored union needs no re-dedup (a
    * canonical set maps 1:1 to its reversal). Neutral when the distinct
    * fits in memory (2M-edge probe: ~6 s either way); the halved shuffle
    * volume targets the spill-bound regime the 20M-edge probe exposed.
    * Self-loops are dropped — they would let an otherwise-isolated vertex
    * count itself toward a degree bound or double its own label vote.
    * NOT checkpointed; callers own materialization.
    */
  def symmetrize(edges: DataFrame): DataFrame = {
    val base = edges.select(
        col(edges.columns(0)).as("src"), col(edges.columns(1)).as("dst"))
      .filter(col("src") =!= col("dst"))
    val canon = base
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()
    canon.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(canon.select(col("v").as("src"), col("u").as("dst")))
  }
}
