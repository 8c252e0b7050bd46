package org.apache.spark.sql.graft

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketch, Union}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable distinct-SET sketch over the Apache DataSketches theta family
  * (Dasgupta et al., "Theta-Sketch Framework", 2016) — the SET-ALGEBRA
  * member of the sketch family next to [[HllSketchAgg]] (distinct counts),
  * [[MisraGriesAgg]] (frequencies), [[KllQuantilesAgg]] (quantiles) and
  * `BloomFns` (membership). HLL answers |A| only; theta sketches keep a
  * uniform hash SAMPLE of the set, so two sketches built independently
  * (different segments, different days, different clusters) compose after
  * the fact: |A∪B|, |A∩B|, |A∖B| — the audience-overlap / cross-segment
  * questions a 100 TB warehouse cannot answer by re-scanning.
  *
  * Returns the compact sketch as BINARY; [[ThetaEstimateExpr]] /
  * [[ThetaSetEstExpr]] evaluate estimates over stored sketches. State is
  * O(2^lgK) per group, map-side combinable; the default lgK=12 (4096
  * retained hashes, ~1.6% RSE in estimation mode) matches the library
  * default. The sketch is EXACT below its nominal-entries threshold —
  * queries that pin lgK above the true cardinality (a20) are in the exact
  * regime and hash-oracle against COUNT(DISTINCT); the sampling regime's
  * error bound is property-tested in SketchSpec.
  */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] {

  require(lgK >= 4 && lgK <= 26, s"theta lgK must be in [4, 26]; got $lgK")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_sketch"

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) v match {
      case l: Long => buf.update(l)
      case i: Int => buf.update(i.toLong)
      case s: UTF8String => buf.update(s.toString)
      case d: Double => buf.update(d)
      case f: Float => buf.update(f.toDouble)
      case b: Array[Byte] => buf.update(b)
      case other => buf.update(other.toString)
    }
    buf
  }

  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult)
    buf
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray

  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object ThetaSketchAgg {
  /** Column-API entry point: compact theta sketch of the distinct values. */
  def thetaSketch(c: Column, lgK: Int = 12): Column =
    ExpressionUtils.column(
      ThetaSketchAgg(ExpressionUtils.expression(c), lgK).toAggregateExpression())

  private[graft] def wrap(bytes: Array[Byte]): Sketch =
    CompactSketch.wrap(Memory.wrap(bytes))

  /** |sketch| estimate. */
  def thetaEstimate(c: Column): Column =
    ExpressionUtils.column(ThetaEstimateExpr(ExpressionUtils.expression(c)))

  /** |A∪B| estimate of two stored sketches. */
  def thetaUnionEst(a: Column, b: Column): Column =
    ExpressionUtils.column(ThetaSetEstExpr(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b), "union"))

  /** |A∩B| estimate of two stored sketches. */
  def thetaIntersectEst(a: Column, b: Column): Column =
    ExpressionUtils.column(ThetaSetEstExpr(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b), "intersect"))

  /** |A∖B| estimate of two stored sketches. */
  def thetaAnotBEst(a: Column, b: Column): Column =
    ExpressionUtils.column(ThetaSetEstExpr(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b), "anotb"))
}

/** Cardinality estimate of a stored compact theta sketch. Interpreted
  * evaluation (CodegenFallback) is the right rung here: the input is one
  * sketch per GROUP, not per corpus row — never a hot path.
  */
case class ThetaEstimateExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_estimate"
  override def nullSafeEval(v: Any): Any =
    ThetaSketchAgg.wrap(v.asInstanceOf[Array[Byte]]).getEstimate
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Set-operation estimate over two stored compact theta sketches:
  * `op` ∈ union | intersect | anotb. Group-level data (see
  * [[ThetaEstimateExpr]] on why interpreted eval suffices).
  */
case class ThetaSetEstExpr(left: Expression, right: Expression, op: String)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {
  require(Set("union", "intersect", "anotb")(op),
    s"theta set op must be union|intersect|anotb; got $op")
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = s"theta_${op}_est"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val sa = ThetaSketchAgg.wrap(a.asInstanceOf[Array[Byte]])
    val sb = ThetaSketchAgg.wrap(b.asInstanceOf[Array[Byte]])
    op match {
      case "union" =>
        val u = SetOperation.builder().buildUnion()
        u.union(sa); u.union(sb); u.getResult.getEstimate
      case "intersect" =>
        val i = SetOperation.builder().buildIntersection()
        i.intersect(sa); i.intersect(sb); i.getResult.getEstimate
      case "anotb" =>
        val d = SetOperation.builder().buildANotB()
        d.setA(sa); d.notB(sb); d.getResult(true).getEstimate
    }
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
