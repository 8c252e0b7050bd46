package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Embedding similarity: exact cosine via codegen'd higher-order functions,
  * brute-force top-k ANN as the correctness baseline, and a random-
  * hyperplane LSH bucketed variant as the scale path (buckets shrink each
  * candidate set from |C| to |C|/2^bits, turning the all-pairs cartesian
  * into a per-bucket join — the 100 TB-viable shape).
  */
object Similarity {

  /** Element-wise cast float→double so all accumulation is in doubles. */
  def asDouble(vec: Column): Column = transform(vec, x => x.cast("double"))

  /** Exact cosine similarity of two double-array columns — a native
    * codegen'd Catalyst expression (single fused loop, no intermediate
    * arrays); left-to-right double accumulation, so results are identical
    * to [[cosineBuiltins]] and to DuckDB's `list_cosine_similarity`.
    */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.CosineSimilarityExpr.cosineSim(a, b)

  /** Builtin-composed equivalent (`zip_with` + `aggregate`), kept as the
    * compositional reference implementation for tests.
    */
  def cosineBuiltins(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val na = aggregate(transform(a, x => x * x), lit(0.0), (acc, v) => acc + v)
    val nb = aggregate(transform(b, x => x * x), lit(0.0), (acc, v) => acc + v)
    dot / (sqrt(na) * sqrt(nb))
  }

  /** Brute-force exact top-k neighbors for each query vector.
    * Queries are expected to be a SMALL relation (they are broadcast); the
    * candidate side streams — so the cartesian is |Q|·|C| with |Q| tiny,
    * scanned once, ranked per query with a per-partition top-k.
    * Ranking uses the ROUNDED score (ties → candidate id) so results are
    * reproducible across engines and summation orders.
    */
  def annBrute(
      queries: DataFrame, // (query_id LONG, qv ARRAY<DOUBLE>)
      candidates: DataFrame, // (cand_id LONG, cv ARRAY<DOUBLE>)
      k: Int): DataFrame = {
    val scored = broadcast(queries).crossJoin(candidates)
      .select(
        col("query_id"), col("cand_id"),
        round(cosine(col("qv"), col("cv")), 4).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("cand_id"), col("rnk"), col("cosine"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** LSH-bucketed ANN: candidates are only compared within the same
    * hyperplane bucket — per-bucket shuffle join instead of a cartesian.
    * Recall is amplified with `tables` independent hash tables (standard
    * OR-amplification): a pair is a candidate if it collides in ANY table;
    * candidates are deduped before the exact re-rank, so output stays
    * deterministic. Recall vs [[annBrute]] is validated in ScalaTest.
    */
  def annLsh(
      vectors: DataFrame, // (vec_id LONG, v ARRAY<DOUBLE>)
      planes: Int,
      tables: Int,
      k: Int): DataFrame = {
    // Relational bucket computation (posexplode → codegen'd hash/arith →
    // two hash-aggregations) instead of per-row higher-order lambdas,
    // which are CodegenFallback: one (vec, dim, plane) row per term, dot
    // products and bit-assembly as map-side-combinable sums.
    val el = vectors.select(col("vec_id"), posexplode(col("v")).as(Seq("i", "x")))
    val terms = el
      .select(col("vec_id"), col("i"), col("x"),
        explode(sequence(lit(0), lit(tables * planes - 1))).as("p"))
      .select(col("vec_id"), col("p"),
        (col("x") *
          ((pmod(xxhash64(lit("plane"), col("p"), col("i")), lit(2000001L)).cast("double")
            - lit(1000000.0)) / lit(1000000.0))).as("term"))
    val dots = terms.groupBy(col("vec_id"), col("p")).agg(sum(col("term")).as("dot"))
    val bitValue = (0 until planes).foldLeft(lit(0L)) { (acc, j) =>
      when(pmod(col("p"), lit(planes)) === j, lit(1L << j)).otherwise(acc)
    }
    val bucketed = dots
      .groupBy(col("vec_id"), floor(col("p") / planes).cast("int").as("tbl"))
      .agg(sum(when(col("dot") >= 0, bitValue).otherwise(lit(0L))).as("bucket"))
      .join(vectors, "vec_id")
    val a = bucketed.select(
      col("tbl"), col("bucket"), col("vec_id").as("query_id"), col("v").as("qv"))
    val b = bucketed.select(
      col("tbl").as("tbl_b"), col("bucket").as("bucket_b"),
      col("vec_id").as("cand_id"), col("v").as("cv"))
    val scored = a.join(b,
        col("tbl") === col("tbl_b") && col("bucket") === col("bucket_b") &&
          col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"), col("qv"), col("cv"))
      .dropDuplicates("query_id", "cand_id")
      .select(
        col("query_id"), col("cand_id"),
        round(cosine(col("qv"), col("cv")), 4).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("cand_id"), col("rnk"), col("cosine"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** IVF (inverted-file) ANN: a coarse k-means quantizer assigns every
    * vector to a cell; queries search only their own cell — per-cell
    * equi-join instead of a cartesian, the classic IVF-flat scale shape
    * (probe count = 1 here; raise `nCells` ∝ √N at scale).
    * Approximate: neighbors in adjacent cells are missed; recall vs
    * [[annBrute]] is asserted in ScalaTest.
    */
  def annIvf(
      spark: org.apache.spark.sql.SparkSession,
      vectors: DataFrame, // (vec_id LONG, v ARRAY<DOUBLE>)
      nCells: Int,
      k: Int): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val withFeat = vectors.withColumn("features", array_to_vector(col("v"))).cache()
    val model = new KMeans()
      .setK(nCells).setSeed(42L).setMaxIter(10)
      .setFeaturesCol("features")
      .fit(withFeat)
    val assigned = model.transform(withFeat)
      .select(col("vec_id"), col("v"), col("prediction").as("cell"))
    val a = assigned.select(col("cell"), col("vec_id").as("query_id"), col("v").as("qv"))
    val b = assigned.select(col("cell").as("cell_b"), col("vec_id").as("cand_id"), col("v").as("cv"))
    val scored = a.join(b,
        col("cell") === col("cell_b") && col("query_id") =!= col("cand_id"))
      .select(
        col("query_id"), col("cand_id"),
        round(cosine(col("qv"), col("cv")), 4).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("cand_id"), col("rnk"), col("cosine"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** All near-duplicate pairs by exact cosine ≥ threshold (id_a < id_b).
    * Quadratic — correctness baseline for the LSH path.
    */
  def cosinePairs(vectors: DataFrame, threshold: Double): DataFrame = {
    val a = vectors.select(col("vec_id").as("vec_a"), col("v").as("va"))
    val b = vectors.select(col("vec_id").as("vec_b"), col("v").as("vb"))
    a.crossJoin(b)
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cos_raw", cosine(col("va"), col("vb")))
      .filter(col("cos_raw") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("cos_raw"), 4).as("cosine"))
      .orderBy(col("vec_a"), col("vec_b"))
  }
}
