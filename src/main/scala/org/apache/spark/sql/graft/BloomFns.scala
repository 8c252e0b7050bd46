package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.XxHash64
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.classic.ExpressionUtils

/** Column-API surface over Spark's own bloom-filter machinery — the exact
  * expressions Catalyst's runtime-filter rule injects
  * (`InjectRuntimeFilter`, already pinned in PlanShapeSpec), here exposed
  * for EXPLICIT use: build a mergeable bloom over a key column in one
  * combinable aggregate, broadcast the resulting binary, and prefilter an
  * arbitrarily large probe side before an exact join. The probe predicate
  * is a codegen'd xxhash64 + bit-test — no UDF, no shuffle.
  *
  * This is the 100 TB decontamination shape: a benchmark shingle SET can
  * outgrow a broadcast hash relation long before its BLOOM does (1 G
  * shingles ≈ 1.2 GB as a set, ~150 MB of bloom bits at 1% FP), and the
  * bloom prefilter cuts the corpus side to ~FP-rate before the exact
  * confirm join.
  */
object BloomFns {

  /** Mergeable bloom build over xxhash64(c); `numBits` sizes the filter
    * (≈ 1.44 · n · log2(1/fp) bits — callers pick from the expected
    * distinct count).
    */
  def bloomAgg(c: Column, expectedItems: Long, numBits: Long): Column =
    ExpressionUtils.column(
      new BloomFilterAggregate(
        new XxHash64(Seq(ExpressionUtils.expression(c))),
        org.apache.spark.sql.catalyst.expressions.Literal(expectedItems),
        org.apache.spark.sql.catalyst.expressions.Literal(numBits))
        .toAggregateExpression())

  /** Membership probe: true iff xxhash64(value) may be in the bloom built
    * by `bloomDf` (a one-row/one-column [[bloomAgg]] result). No false
    * negatives. `might_contain` requires its bloom side to be a constant
    * or scalar subquery — the same contract Catalyst's InjectRuntimeFilter
    * satisfies — so the build plan is wrapped in a ScalarSubquery here:
    * it executes once, and the probe side sees the binary as a runtime
    * constant (never a join).
    */
  def mightContain(bloomDf: org.apache.spark.sql.DataFrame, value: Column): Column =
    ExpressionUtils.column(
      BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
          bloomDf.queryExecution.analyzed),
        new XxHash64(Seq(ExpressionUtils.expression(value)))))
}
