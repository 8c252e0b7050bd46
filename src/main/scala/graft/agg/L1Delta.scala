package graft.agg

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: L1 norm of the difference between two aligned value columns
  * — the reference's convergence metric (Σ|new−old|, pageRank.py:137-139)
  * as a mergeable `Aggregator[(Double, Double), Double, Double]`.
  *
  * `sum(abs(a-b))` expresses the same thing declaratively (and is what the
  * PageRank loop uses — it codegens better); this demonstrates the typed-
  * aggregation surface (SURVEY §2.11/§7.4) with proper partial-merge
  * semantics for distributed execution.
  */
class L1Delta extends Aggregator[(Double, Double), Double, Double] {
  override def zero: Double = 0.0
  override def reduce(acc: Double, pair: (Double, Double)): Double =
    acc + math.abs(pair._1 - pair._2)
  override def merge(a: Double, b: Double): Double = a + b
  override def finish(acc: Double): Double = acc
  override def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
