package org.apache.spark.sql.graft

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Mergeable streaming-quantile aggregate over the Apache DataSketches KLL
  * sketch (Karnin–Lang–Liberty, FOCS 2016) — the quantile member of the
  * mergeable-sketch family next to [[HllSketchAgg]] (distincts),
  * [[MisraGriesAgg]] (frequencies) and `BloomFns` (membership).
  *
  * Returns the approximate quantiles at the requested ranks as
  * `array<double>`. KLL's guarantee is on RANK, not value: the returned
  * value's true rank is within ε(k) of the requested rank with 99%
  * confidence (ε ≈ 2.9% at the k=200 default, shrinking ~1/k) — preserved
  * under merge, so a 1000-executor cluster computes corpus quantiles with
  * one combinable aggregation and O(k log n) state, never sorting or
  * shuffling the data itself. (`percentile` — exact, full sort — is the
  * small-data path; `a12_quantiles` keeps it as this operator's exact
  * twin.)
  */
case class KllQuantilesAgg(
    child: Expression,
    ranks: Seq[Double],
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  require(ranks.nonEmpty && ranks.forall(r => r >= 0.0 && r <= 1.0),
    s"ranks must be in [0, 1]; got $ranks")
  require(k >= 8 && k <= 65535, s"KLL k must be in [8, 65535]; got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "kll_quantiles"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v match {
      case d: Double => d
      case f: Float => f.toDouble
      case n: Number => n.doubleValue()
    })
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any =
    if (buf.isEmpty) new GenericArrayData(ranks.map(_ => Double.NaN).toArray)
    else new GenericArrayData(
      buf.getQuantiles(ranks.toArray, QuantileSearchCriteria.INCLUSIVE))

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllQuantilesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllQuantilesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object KllQuantilesAgg {
  /** Column-API entry point: approximate quantiles of `c` at `ranks`. */
  def kllQuantiles(c: Column, ranks: Seq[Double], k: Int = 200): Column =
    ExpressionUtils.column(
      KllQuantilesAgg(ExpressionUtils.expression(c), ranks, k).toAggregateExpression())
}
