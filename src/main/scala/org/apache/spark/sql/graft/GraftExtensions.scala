package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Catalyst extension wiring: registers graft's native functions into every
  * session built with
  * `.withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`.
  * This is the cluster-deployment path — no per-session imperative
  * registration needed.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarityExpr].getName, null, "cosine_sim"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarityExpr(exprs(0), exprs(1))))
    extensions.injectFunction((
      new FunctionIdentifier("hll_distinct"),
      new ExpressionInfo(classOf[HllSketchAgg].getName, null, "hll_distinct"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        if (exprs.length > 1)
          HllSketchAgg(exprs(0),
            exprs(1).eval().asInstanceOf[Number].intValue())
        else HllSketchAgg(exprs(0))))
    extensions.injectFunction((
      new FunctionIdentifier("misra_gries"),
      new ExpressionInfo(classOf[MisraGriesAgg].getName, null, "misra_gries"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MisraGriesAgg(exprs(0),
          exprs(1).eval().asInstanceOf[Number].intValue())))
  }
}
