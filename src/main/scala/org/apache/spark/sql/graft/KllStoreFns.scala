package org.apache.spark.sql.graft

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, DoubleType}

/** STORED-sketch surface for the KLL quantile family — the piece that
  * makes quantiles part of the sketch warehouse next to stored theta
  * sets ([[ThetaSketchAgg]]), stored HLL (Spark's `hll_sketch_agg`,
  * rolled up in a22) and stored count-min ([[CmsEstimateExpr]]):
  *
  *  - `kll_sketch(col[, k])` — binary KLL sketch per group
  *    ([[KllSketchBinAgg]]; [[KllQuantilesAgg]] is its evaluate-now twin
  *    returning quantile values directly)
  *  - `kll_merge(bin[, k])` — re-aggregate STORED sketches
  *    ([[KllMergeBinAgg]]) without rescanning the facts
  *  - `kll_value(bin, rank)` — read a quantile off a stored sketch
  *    ([[KllValueExpr]])
  *
  * A 100 TB pipeline sketches each partition/day once and answers later
  * percentile questions from the stored binaries. KLL is EXACT while a
  * sketch has seen ≤ k items (no compaction can have fired), and the
  * INCLUSIVE quantile of exact data is the item at 1-based position
  * ⌈r·n⌉ — which is how a23's oracle reproduces merged-sketch medians
  * with a window expression; the estimation-regime rank-error envelope
  * is property-tested in SketchSpec.
  */
case class KllSketchBinAgg(
    child: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  require(k >= 8 && k <= 65535, s"KLL k must be in [8, 65535]; got $k")

  override def children: Seq[Expression] = Seq(child)
  // Numerics implicitly widen to double at analysis; a non-castable input
  // (timestamp, array, …) fails analysis with a typed error instead of a
  // MatchError mid-task in update() (r8 ADVICE).
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kll_sketch"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v match {
      case d: Double => d
      case f: Float => f.toDouble
      case n: Number => n.doubleValue()
      case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
    })
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchBinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchBinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Merge STORED KLL sketch binaries into one sketch binary. */
case class KllMergeBinAgg(
    child: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  require(k >= 8 && k <= 65535, s"KLL k must be in [8, 65535]; got $k")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kll_merge"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeBinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeBinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Quantile read off a stored KLL sketch binary (INCLUSIVE search — the
  * convention whose exact-regime value is the item at position ⌈r·n⌉).
  * Group-level data; interpreted eval is the right rung (see
  * [[ThetaEstimateExpr]]).
  */
case class KllValueExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, DoubleType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "kll_value"
  override def nullSafeEval(bin: Any, rank: Any): Any = {
    val sk = KllDoublesSketch.heapify(
      Memory.wrap(bin.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) Double.NaN
    else sk.getQuantile(rank.asInstanceOf[Double], QuantileSearchCriteria.INCLUSIVE)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object KllStoreFns {
  /** Binary KLL sketch of `c` (store it; read with [[kllValue]]). */
  def kllSketch(c: Column, k: Int = 200): Column =
    ExpressionUtils.column(
      KllSketchBinAgg(ExpressionUtils.expression(c), k).toAggregateExpression())

  /** Merge stored KLL sketch binaries into one. */
  def kllMerge(c: Column, k: Int = 200): Column =
    ExpressionUtils.column(
      KllMergeBinAgg(ExpressionUtils.expression(c), k).toAggregateExpression())

  /** Quantile at `rank` from a stored sketch binary. */
  def kllValue(sketch: Column, rank: Column): Column =
    ExpressionUtils.column(KllValueExpr(
      ExpressionUtils.expression(sketch), ExpressionUtils.expression(rank)))
}
