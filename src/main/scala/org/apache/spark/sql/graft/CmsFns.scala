package org.apache.spark.sql.graft

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, LongType, StringType, TypeCollection}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Point-query estimator over Spark's OWN `count_min_sketch` aggregate
  * (Cormode & Muthukrishnan, "An improved data stream summary: the
  * count-min sketch and its applications", J. Algorithms 2005).
  *
  * Spark ships the BUILD side (`functions.count_min_sketch(col, eps,
  * confidence, seed)` → binary, mergeable, map-side combinable) but no
  * SQL/Column READ side — the binary is only usable from JVM code via
  * `CountMinSketch.readFrom`. `cms_estimate(sketch, key)` closes that
  * gap, so a 100 TB pipeline can persist per-partition/per-day sketches
  * (constant size: d=⌈ln(1/δ)⌉ rows × w=⌈e/ε⌉ counters) and answer
  * frequency point queries later without re-scanning — the frequency
  * twin of [[ThetaSketchAgg]]'s stored set sketches.
  *
  * Guarantee: estimate ≥ true count always (counters only over-count),
  * and ≤ true + ε·n with probability ≥ confidence. Both ends are
  * property-tested in SketchSpec; the a21b query additionally replays
  * the same d×w estimator RELATIONALLY with the portable md5 hash
  * family so DuckDB reproduces the math bit-for-bit (the production
  * binary uses Spark-internal hashing and is checked rows-only).
  *
  * Interpreted eval (CodegenFallback) is the right rung: inputs are one
  * sketch per GROUP, not per corpus row — never a hot path. The sketch
  * is re-wrapped per evaluation; callers probing many keys against one
  * stored sketch should join keys against the one-row sketch relation,
  * which keeps deserialization per-partition via the broadcast, not
  * per-key (the a21 query demonstrates the shape).
  */
case class CmsEstimateExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(BinaryType, TypeCollection(LongType, StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override def nullSafeEval(sketchBytes: Any, key: Any): Any = {
    val sketch = CountMinSketch.readFrom(
      new ByteArrayInputStream(sketchBytes.asInstanceOf[Array[Byte]]))
    key match {
      // Long keys must probe the same add-path the aggregate used
      // (addLong); strings hash their UTF-8 bytes on both sides.
      case l: java.lang.Long => sketch.estimateCount(l)
      case s: UTF8String => sketch.estimateCount(s.toString)
      case other => sketch.estimateCount(other)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CmsFns {
  /** Column-API entry point: frequency estimate of `key` in a stored
    * `count_min_sketch` binary.
    */
  def cmsEstimate(sketch: Column, key: Column): Column =
    ExpressionUtils.column(CmsEstimateExpr(
      ExpressionUtils.expression(sketch), ExpressionUtils.expression(key)))
}
