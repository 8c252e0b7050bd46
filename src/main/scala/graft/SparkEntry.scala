package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.PageRank

/** Driver contract — see /root/repo/SURVEY.md §7.
  *
  * `queries` holds one named entry per implemented operator from SURVEY §2
  * (plus the large-scale pipeline extensions); `oracleSql` holds the
  * DuckDB-runnable ANSI SQL equivalent for every SQL-expressible entry.
  */
object SparkEntry {

  /** Flagship: PageRank (reference parity, renormalizing fixpoint) over a
    * part→supplier edge graph derived from sf0.001 lineitem; top-100 pages.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val edges = Tables.lineitem(spark, dir)
      .select(col("l_partkey").as("src"), col("l_suppkey").as("dst"))
      .distinct()
    val result = PageRank.run(spark, edges, PageRank.Params(beta = 0.85, delta = 1e-6))
    PageRank.topK(result.ranks, 100)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    api.RelationalQueries.queries ++
      api.GraphQueries.queries ++
      api.EventQueries.queries ++
      api.PipelineQueries.queries ++
      api.BenchmarkQueries.queries

  def oracleSql: Map[String, String] =
    api.RelationalQueries.oracleSql ++
      api.GraphQueries.oracleSql ++
      api.EventQueries.oracleSql ++
      api.PipelineQueries.oracleSql ++
      api.BenchmarkQueries.oracleSql
}
