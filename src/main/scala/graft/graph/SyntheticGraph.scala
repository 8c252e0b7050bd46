package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic power-law graph generator — the scale-proof
  * harness for the PageRank flagship beyond toy |V| (WikiData is ~8k
  * vertices; this produces millions of edges with hub-skewed degree
  * distributions, the shape real web graphs have).
  *
  * Generation is fully distributed and reproducible: `spark.range` over
  * edge ids, endpoints drawn via xxhash64-derived uniforms pushed through
  * an inverse-CDF power transform (`floor(N · u^skew)` concentrates mass
  * near vertex 0 — the hubs). No randomness source, no driver-side data,
  * no collected state: the same (nVerts, nEdges, skew) always yields the
  * same graph, on any cluster size, at any parallelism.
  */
object SyntheticGraph {

  /** ~`nEdges` edges over vertex ids `[0, nVerts)`; both endpoints
    * power-skewed (skew > 1 → heavier hubs). Self-loops are dropped
    * (PageRank semantics), multi-edges kept (they weight the hub like
    * repeated links would).
    */
  def powerLaw(
      spark: SparkSession,
      nVerts: Long,
      nEdges: Long,
      skew: Double = 2.0): DataFrame = {
    require(nVerts > 1 && nEdges > 0 && skew >= 1.0)
    def u(salt: String) =
      (pmod(xxhash64(lit(salt), col("id")), lit(1000003L)).cast("double") + 0.5) / 1000003.0
    def zipf(uc: org.apache.spark.sql.Column) =
      floor(pow(uc, skew) * nVerts).cast("long")
    spark.range(nEdges)
      .select(zipf(u("src")).as("src"), zipf(u("dst")).as("dst"))
      .filter(col("src") =!= col("dst"))
  }
}
