package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.dedup.{Dedup, DedupStore}

/** Persisted near-duplicate index: an incremental probe of a NEW batch
  * against stored bands+shingles must equal the batch operator run on
  * the full union, restricted to pairs that touch the new batch — the
  * determinism-across-batches property the store's hash family
  * guarantees. Plus the append lifecycle: two increments == one save.
  */
class DedupStoreSpec extends SparkSpec {

  private val (n, bands, rpb, thr) = (3, 16, 4, 0.5)

  private def docs = Tables.documents(spark, Sf001)
    .select(col("doc_id"), col("text"))

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("searchNew == batch operator on the union, restricted to new-touching pairs") {
    val dir = Files.createTempDirectory("graft_dedup_store").toString
    val old = docs.filter(col("doc_id") < 300)
    val fresh = docs.filter(col("doc_id") >= 300)
    DedupStore.save(old, "doc_id", "text", n, bands, rpb, s"$dir/ix")
    val got = pairs(DedupStore.searchNew(
      spark, s"$dir/ix", fresh, "doc_id", "text", n, bands, rpb, thr))
    val full = pairs(Dedup.minhashLshPairs(docs, "doc_id", "text", n, bands, rpb, thr))
    val expected = full.filter { case (a, b, _) => a >= 300 || b >= 300 }
    assert(got == expected,
      s"got ${got.size} pairs vs expected ${expected.size}; " +
        s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    // And it must include cross-batch pairs (old x new), or the test
    // corpus split proves nothing.
    assert(expected.exists { case (a, b, _) => a < 300 && b >= 300 },
      "sf0.001 split yields no cross-batch near-dups; pick another split")
  }

  test("searchNew is leak-neutral (QueriesSpec contract for store probes)") {
    val dir = Files.createTempDirectory("graft_dedup_leak").toString
    DedupStore.save(docs.filter(col("doc_id") < 300),
      "doc_id", "text", n, bands, rpb, s"$dir/ix")
    val before = RddScope.persisted(spark)
    val df = DedupStore.searchNew(spark, s"$dir/ix",
      docs.filter(col("doc_id") >= 300), "doc_id", "text", n, bands, rpb, thr)
    assert(df.count() >= 0)
    // Only checkpoint backings REACHABLE from the result plan may remain
    // (the caller frees those via the standard sweep). An intermediate
    // checkpoint orphaned by a later lineage truncation fails here — the
    // round-10 n13 leak class.
    val keep = org.apache.spark.sql.graft.GraftInternals.checkpointRddIds(df)
    val leaked = RddScope.persisted(spark) -- before -- keep
    assert(leaked.isEmpty,
      s"searchNew left persisted RDDs $leaked unreachable from its result")
    org.apache.spark.sql.graft.GraftInternals.freeLocalCheckpoint(df)
  }

  test("append lifecycle: save(old) + append(new) == save(all)") {
    val dir = Files.createTempDirectory("graft_dedup_append").toString
    val old = docs.filter(col("doc_id") < 300)
    val fresh = docs.filter(col("doc_id") >= 300)
    DedupStore.save(old, "doc_id", "text", n, bands, rpb, s"$dir/inc")
    DedupStore.append(fresh, "doc_id", "text", n, bands, rpb, s"$dir/inc")
    DedupStore.save(docs, "doc_id", "text", n, bands, rpb, s"$dir/full")
    def rel(p: String) = spark.read.parquet(p)
      .collect().map(_.toSeq).toSet
    assert(rel(s"$dir/inc/bands") == rel(s"$dir/full/bands"))
    assert(rel(s"$dir/inc/shingles") == rel(s"$dir/full/shingles"))
    // Per-batch count rows union to the full corpus counts because ids
    // never repeat across batches (the caller contract).
    assert(rel(s"$dir/inc/counts") == rel(s"$dir/full/counts"))
  }
}
