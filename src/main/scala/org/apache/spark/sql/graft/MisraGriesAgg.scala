package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable Misra–Gries heavy-hitters summary: at most `k` tracked keys.
  *
  * Guarantees (standard MG / mergeable-summaries results): for every key
  * x with true frequency f(x) over n processed rows,
  * `apx(x) ≤ f(x) ≤ apx(x) + n/(k+1)`, and every x with
  * `f(x) > n/(k+1)` is present in the summary — preserved under merge
  * (Agarwal et al., "Mergeable Summaries", PODS 2012).
  */
final class MgBuffer(val k: Int) extends Serializable {
  val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty

  def add(key: String, w: Long = 1L): Unit = {
    counts.get(key) match {
      case Some(c) => counts.update(key, c + w)
      case None if counts.size < k => counts.update(key, w)
      case None =>
        // Decrement-all by the smallest of (w, current min) repeatedly is
        // the weighted generalization; for w = 1 it is the classic single
        // decrement sweep. Evict zeros.
        var rem = w
        while (rem > 0 && counts.size >= k) {
          val dec = math.min(rem, counts.values.min)
          val dead = mutable.ArrayBuffer.empty[String]
          counts.mapValuesInPlace((_, c) => c - dec)
          counts.foreach { case (key2, c) => if (c == 0L) dead += key2 }
          dead.foreach(counts.remove)
          rem -= dec
        }
        if (rem > 0) counts.update(key, rem)
    }
  }

  /** Keywise sum, then trim back to k by subtracting the (k+1)-th largest
    * count from every entry (the mergeable-summaries reduction).
    */
  def merge(other: MgBuffer): Unit = {
    other.counts.foreach { case (key, c) =>
      counts.update(key, counts.getOrElse(key, 0L) + c)
    }
    if (counts.size > k) {
      val kth = counts.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      val dead = mutable.ArrayBuffer.empty[String]
      counts.mapValuesInPlace((_, c) => c - kth)
      counts.foreach { case (key, c) => if (c <= 0L) dead += key }
      dead.foreach(counts.remove)
    }
  }
}

/** Custom `TypedImperativeAggregate`: approximate heavy hitters
  * (Misra–Gries summary), the mergeable top-terms primitive for corpus
  * statistics at 100 TB — constant-size (≤ k entries) partial state per
  * partition, map-side combinable, summary-merge on shuffle, versus the
  * exact `groupBy(term).count()` whose shuffle is vocabulary-sized.
  *
  * Returns `array<struct<term string, apx bigint>>` sorted by
  * (apx desc, term asc). When the true key cardinality never exceeds k,
  * no decrement ever fires and the summary is EXACT — which is how the
  * a17 query stays hash-oracle-able on the fixed-vocabulary corpus; the
  * eviction and merge-trim paths are property-tested in SketchSpec.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgBuffer]
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  require(k >= 1, s"k must be positive; got $k")

  override def children: Seq[Expression] = Seq(child)
  // Declared input type + implicit cast: misra_gries(l_partkey, 10) casts
  // the key to string at analysis time instead of CCE'ing mid-job.
  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("apx", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(k)

  override def update(buf: MgBuffer, input: InternalRow): MgBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: MgBuffer, other: MgBuffer): MgBuffer = {
    buf.merge(other)
    buf
  }

  override def eval(buf: MgBuffer): Any = {
    val sorted = buf.counts.toArray.sortBy { case (t, c) => (-c, t) }
    new GenericArrayData(sorted.map { case (t, c) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(t), c))
    })
  }

  override def serialize(buf: MgBuffer): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    // Version marker: the v1 format began with writeInt(k) whose first
    // byte is 0 for any sane k, so 0xFF is unambiguous. Lets a streaming
    // state store checkpointed under v1 restart on this code.
    out.writeByte(0xFF)
    out.writeInt(buf.k)
    out.writeInt(buf.counts.size)
    // Length-prefixed raw UTF-8, not writeUTF: writeUTF caps a term at
    // 64 KB and would fail partial-aggregate serialization if a caller
    // tracks whole-document keys.
    buf.counts.foreach { case (t, c) =>
      val tb = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(tb.length)
      out.write(tb)
      out.writeLong(c)
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(b: Array[Byte]): MgBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(b))
    val v2 = b.nonEmpty && b(0) == 0xFF.toByte
    if (v2) in.readByte()
    val buf = new MgBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val t =
        if (v2) {
          val tb = new Array[Byte](in.readInt())
          in.readFully(tb)
          new String(tb, java.nio.charset.StandardCharsets.UTF_8)
        } else in.readUTF() // v1 (writeUTF) checkpoint compatibility
      val c = in.readLong()
      buf.counts.update(t, c)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MisraGriesAgg {
  /** Column-API entry point: ≤k-entry heavy-hitters summary of `c`
    * (string column), sorted by (apx desc, term asc).
    */
  def heavyHitters(c: Column, k: Int): Column =
    ExpressionUtils.column(
      MisraGriesAgg(ExpressionUtils.expression(c), k).toAggregateExpression())
}
