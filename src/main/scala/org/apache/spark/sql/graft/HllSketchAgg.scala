package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable HyperLogLog register array. */
final class HllBuffer(val p: Int) extends Serializable {
  val m: Int = 1 << p
  val registers: Array[Byte] = new Array[Byte](m)

  def add(hash: Long): Unit = {
    val idx = (hash >>> (64 - p)).toInt
    // rank = leading zeros of the remaining bits + 1, capped at 64-p+1
    val w = hash << p
    val rank = (if (w == 0) 64 - p else java.lang.Long.numberOfLeadingZeros(w)) + 1
    val r = math.min(rank, 64 - p + 1).toByte
    if (r > registers(idx)) registers(idx) = r
  }

  def merge(other: HllBuffer): Unit = {
    var i = 0
    while (i < m) {
      if (other.registers(i) > registers(i)) registers(i) = other.registers(i)
      i += 1
    }
  }

  /** Standard HLL estimator with small-range (linear counting) correction. */
  def estimate: Long = {
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      invSum += 1.0 / (1L << registers(i))
      if (registers(i) == 0) zeros += 1
      i += 1
    }
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    val raw = alpha * m * m / invSum
    val corrected =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else raw
    math.round(corrected)
  }
}

/** Custom `TypedImperativeAggregate`: approximate COUNT(DISTINCT) via a
  * hand-rolled HyperLogLog sketch (2^p byte registers, xxhash64 input
  * hashing, linear-counting small-range correction).
  *
  * Demonstrates the mutable-buffer aggregation surface (SURVEY §4/§7.5):
  * partial sketches are built map-side, serialized as raw register arrays,
  * and merged with a register-wise max — the shape that lets a 1000-
  * executor cluster compute distinct counts with constant-size shuffle
  * traffic. (Spark's builtin `approx_count_distinct` is the production
  * path; this is the custom-sketch mechanism.)
  */
case class HllSketchAgg(
    child: Expression,
    p: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HllBuffer] {

  require(p >= 4 && p <= 16, "precision p must be in [4, 16]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "hll_distinct"

  override def createAggregationBuffer(): HllBuffer = new HllBuffer(p)

  override def update(buf: HllBuffer, input: InternalRow): HllBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val h = v match {
        case s: UTF8String =>
          XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
        case l: Long => XXH64.hashLong(l, 42L)
        case i: Int => XXH64.hashLong(i.toLong, 42L)
        case other => XXH64.hashLong(other.hashCode().toLong, 42L)
      }
      buf.add(h)
    }
    buf
  }

  override def merge(buf: HllBuffer, other: HllBuffer): HllBuffer = {
    buf.merge(other)
    buf
  }

  override def eval(buf: HllBuffer): Any = buf.estimate

  override def serialize(buf: HllBuffer): Array[Byte] = {
    val out = new Array[Byte](1 + buf.m)
    out(0) = buf.p.toByte
    System.arraycopy(buf.registers, 0, out, 1, buf.m)
    out
  }

  override def deserialize(bytes: Array[Byte]): HllBuffer = {
    val buf = new HllBuffer(bytes(0).toInt)
    System.arraycopy(bytes, 1, buf.registers, 0, buf.m)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object HllSketchAgg {
  /** Column-API entry point: approximate distinct count of `c`. */
  def hllDistinct(c: Column, p: Int = 12): Column =
    ExpressionUtils.column(
      HllSketchAgg(ExpressionUtils.expression(c), p).toAggregateExpression())
}
