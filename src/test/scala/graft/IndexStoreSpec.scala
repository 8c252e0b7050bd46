package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sim.{IndexStore, Similarity}

/** Persisted-index lifecycle: build → save → reload → search must equal
  * the in-plan IVF search exactly, and probing must prune the store at
  * the PARTITION level (planning-time directory pruning).
  */
class IndexStoreSpec extends SparkSpec {

  private def vecs = Tables.embeddings(spark, Sf001)
    .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))

  test("save -> load -> search equals in-plan IVF; probe prunes partitions") {
    val dir = Files.createTempDirectory("graft_ivf_store").toString
    IndexStore.saveIvfStatic(vecs, dims = 3, path = s"$dir/ivf")
    val queries = vecs.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val searched = IndexStore.searchIvfStatic(spark, s"$dir/ivf", queries,
      dims = 3, k = 5)
    val got = searched.collect()
    val exp = Similarity.annIvfStatic(vecs, dims = 3, k = 5)
      .filter(col("query_id") < 20).collect()
    assert(got.sameElements(exp),
      s"store search diverged: got ${got.take(3).mkString(",")} " +
        s"exp ${exp.take(3).mkString(",")}")
    // Layout contract: the store scan must carry the probe cells as a
    // PartitionFilter — pruned against the directory listing at planning
    // time, before any file opens.
    val plan = searched.queryExecution.executedPlan.toString
    assert("PartitionFilters:\\s*\\[cell#\\d+ IN ".r.findFirstIn(plan).isDefined,
      s"probe cells not pushed as a partition filter:\n${plan.take(2000)}")
  }

  test("single-cell query set reads a single partition directory") {
    val dir = Files.createTempDirectory("graft_ivf_one").toString
    import spark.implicits._
    val vs = Seq(
      (1L, Seq(1.0, 1.0, 1.0)), (2L, Seq(1.0, 2.0, 1.0)),
      (3L, Seq(-1.0, 1.0, 1.0)), (4L, Seq(1.0, 1.0, -2.0)))
      .toDF("vec_id", "v")
    IndexStore.saveIvfStatic(vs, dims = 3, path = s"$dir/ivf")
    val q = Seq((10L, Seq(2.0, 1.0, 1.0))).toDF("query_id", "qv")
    val res = IndexStore.searchIvfStatic(spark, s"$dir/ivf", q, dims = 3, k = 2)
    val rows = res.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // Query cell = (+,+,+) = 7 → candidates {1, 2} only; 3 and 4 live in
    // other cells and are never read.
    assert(rows.map(_._2).toSet == Set(1L, 2L), rows.mkString(","))
  }

  test("tuned store (x3 assignment, 8-probe search) equals the one-plan tuned ANN") {
    val dir = Files.createTempDirectory("graft_ivf_tuned").toString
    IndexStore.saveIvfTuned(vecs, path = s"$dir/ivf")
    // The store holds each vector AT MOST 3 times (home + 2 flips); the
    // write dedups (vec_id, cell), so with this fixture's tie-free |v|
    // coordinates the 3 cells are distinct and the count is exactly 3N.
    val stored = spark.read.parquet(s"$dir/ivf")
    assert(stored.count() == vecs.count() * 3)
    assert(stored.select("vec_id", "cell").distinct().count() == stored.count())
    val queries = vecs
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val searched = IndexStore.searchIvfTuned(spark, s"$dir/ivf", queries, k = 5)
    val got = searched.collect()
    val exp = Similarity.annIvfStaticTuned(vecs, k = 5).collect()
    assert(got.sameElements(exp),
      s"tuned store search diverged: got ${got.take(3).mkString(",")} " +
        s"exp ${exp.take(3).mkString(",")}")
    // Same layout contract as the static store: probe cells must prune
    // at the partition level, before any file opens. With > 10 probed
    // cells Spark renders the predicate as INSET, not IN.
    val plan = searched.queryExecution.executedPlan.toString
    assert("PartitionFilters:\\s*\\[cell#\\d+ IN(SET)? ".r.findFirstIn(plan).isDefined,
      s"tuned probe cells not pushed as a partition filter:\n${plan.take(2000)}")
  }
}
