package graft

import org.apache.spark.sql.functions._

/** Focused pins for PipelineQueries' r18 single-pass helpers. */
class PipelineHelpersSpec extends SparkSpec {
  import spark.implicits._

  test("p21 releasedSplitRows: one pass, zero rows for EMPTY splits, counts exact") {
    // Neither test SF has an empty released split (sf0.001: 279/27/32),
    // so the literal-stage-table left join's zero arm — the behavior the
    // old per-split filtered aggregates produced by construction — is
    // pinned here: a released relation with only train rows must still
    // emit all three rows, val/test at (0, 0).
    val trainOnly = Seq(
      (1L, "alpha beta gamma", "train"),
      (2L, "delta", "train"),
      (3L, "epsilon zeta", "train")).toDF("doc_id", "text_dedup", "split")
    val got = api.PipelineQueries.releasedSplitRows(trainOnly)
      .orderBy(col("stage_ord"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == Seq(
      (3L, "released_train", 3L, 6L),
      (4L, "released_val", 0L, 0L),
      (5L, "released_test", 0L, 0L)), got)

    // All three splits populated: counts match the per-split filtered
    // aggregates exactly (integer token counts — the hash-oracle identity).
    val mixed = Seq(
      (1L, "a b", "train"), (2L, "c", "val"), (3L, "d e f", "test"),
      (4L, "", "val")).toDF("doc_id", "text_dedup", "split")
    val got2 = api.PipelineQueries.releasedSplitRows(mixed)
      .orderBy(col("stage_ord"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got2 == Seq(
      (3L, "released_train", 1L, 2L),
      (4L, "released_val", 2L, 1L),
      (5L, "released_test", 1L, 3L)), got2)
  }
}
