package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.graph.PageRank

/** I1/I2 — the iterative fixpoint operator family (SURVEY §2.9), exercised
  * on a part→supplier graph derived from `lineitem`, with ANSI-SQL oracles
  * built by unrolling the iteration into a CTE chain (runs on DuckDB).
  *
  * The reference's convergence-bounded, renormalizing variant
  * (`/root/reference/pageRank.py:116-145`) is not fixed-iteration and hence
  * not SQL-unrollable a priori; it ships as `pr_renorm` with a rows-only
  * driver check plus golden-output ScalaTest against the reference README.
  */
object GraphQueries {
  type Q = (SparkSession, String) => DataFrame

  private val EdgesSql = "SELECT DISTINCT l_partkey AS src, l_suppkey AS dst FROM lineitem"

  private def edges(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_partkey").as("src"), col("l_suppkey").as("dst"))
      .distinct()

  /** Shared CTE header: edge relation, vertex set, out-degrees, N, r0. */
  private def headerSql(edgesSql: String): String =
    s"""WITH edges AS ($edgesSql),
       |nodes AS (SELECT src AS id FROM edges UNION SELECT dst AS id FROM edges),
       |deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
       |nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
       |r0 AS (SELECT id, 1.0/(SELECT n FROM nn) AS rank FROM nodes)""".stripMargin

  /** One unrolled iteration chain `<p>r1 .. <p>rK` of
    * rank' = (1−β)/N + β·Σ_{u→v} rank(u)/deg(u), starting from shared r0.
    */
  private def chainSql(prefix: String, beta: Double, iterations: Int): String = {
    val sb = new StringBuilder
    for (i <- 1 to iterations) {
      val prev = if (i == 1) "r0" else s"${prefix}r${i - 1}"
      sb.append(s""",
${prefix}r$i AS (
  SELECT nodes.id,
         (1.0 - $beta)/(SELECT n FROM nn) + $beta * COALESCE(c.s, 0.0) AS rank
  FROM nodes
  LEFT JOIN (
    SELECT e.dst AS id, SUM(r.rank / d.d) AS s
    FROM $prev r
    JOIN edges e ON e.src = r.id
    JOIN deg d ON d.src = e.src
    GROUP BY e.dst
  ) c ON nodes.id = c.id)""")
    }
    sb.toString()
  }

  private val Iters = 5
  private val SweepIters = 3
  private val SweepBetas = Seq("b80" -> 0.80, "b85" -> 0.85, "b90" -> 0.90)

  val queries: Map[String, Q] = Map(
    // I1: fixed-iteration PageRank with explicit teleport term.
    "i1_pagerank_fixed" -> ((s, d) =>
      PageRank.fixedIterations(s, edges(s, d), beta = 0.85, iterations = Iters)
        .select(col("id"), round(col("rank"), 9).as("rank"))
        .orderBy(col("id"))),

    // I2: teleport-parameter sweep (README.md:273-283 surface) — the edge /
    // degree invariants are computed once and reused across all β.
    "i2_beta_sweep" -> ((s, d) => {
      val e = edges(s, d).cache()
      val parts = SweepBetas.map { case (_, b) =>
        PageRank.fixedIterations(s, e, beta = b, iterations = SweepIters)
          .select(lit(b).as("beta"), col("id"), round(col("rank"), 9).as("rank"))
      }
      parts.reduce(_.union(_)).orderBy(col("beta"), col("id"))
    }),

    // Reference-faithful renormalizing fixpoint (rows-only driver check;
    // golden-tested against README §8 in PageRankSpec).
    "pr_renorm" -> ((s, d) => {
      val res = PageRank.run(s, edges(s, d), PageRank.Params(beta = 0.85, delta = 1e-8))
      res.ranks.select(col("id"), round(col("rank"), 9).as("rank")).orderBy(col("id"))
    }),

    // Top-k over the converged ranks (O4 at graph scale): TakeOrderedAndProject.
    // Sorted by the ROUNDED score (ties broken by id) so the ordering is
    // identical to the oracle's, immune to last-ulp summation differences.
    "pr_topk" -> ((s, d) => {
      val r = PageRank.fixedIterations(s, edges(s, d), beta = 0.85, iterations = Iters)
      r.select(col("id"), round(col("rank"), 9).as("rank"))
        .orderBy(col("rank").desc, col("id"))
        .limit(20)
    })
  )

  val oracleSql: Map[String, String] = Map(
    "i1_pagerank_fixed" ->
      (headerSql(EdgesSql) + chainSql("i_", 0.85, Iters) +
        s"\nSELECT id, ROUND(rank, 9) AS rank FROM i_r$Iters ORDER BY id"),

    "i2_beta_sweep" -> {
      val chains = SweepBetas.map { case (p, b) => chainSql(p + "_", b, SweepIters) }.mkString
      val union = SweepBetas
        .map { case (p, b) =>
          s"SELECT CAST($b AS DOUBLE) AS beta, id, ROUND(rank, 9) AS rank FROM ${p}_r$SweepIters" }
        .mkString("\n", "\nUNION ALL\n", "\nORDER BY beta, id")
      headerSql(EdgesSql) + chains + union
    },

    "pr_topk" ->
      (headerSql(EdgesSql) + chainSql("i_", 0.85, Iters) +
        s"\nSELECT id, ROUND(rank, 9) AS rank FROM i_r$Iters ORDER BY rank DESC, id LIMIT 20")
  )
}
