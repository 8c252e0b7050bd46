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

  /** Clear wrong-arity message instead of an IndexOutOfBounds from the
    * builder; `eval()` on the guarded args additionally requires them
    * foldable (a non-literal k/ranks arg fails here with a named error,
    * not an unbound-attribute internal one).
    */
  private def arity(name: String, exprs: Seq[_], allowed: Set[Int]): Unit =
    if (!allowed.contains(exprs.length))
      throw new IllegalArgumentException(
        s"$name expects ${allowed.toSeq.sorted.mkString(" or ")} argument(s); " +
          s"got ${exprs.length}")

  /** Fold a tuning argument (k, lgK, items, bits) to an integral value
    * with a NAMED planning-time error. Without the guard, a column
    * reference reaches `eval()` and dies with an unbound-attribute
    * internal error, and a fractional/string literal with a
    * ClassCastException — neither tells the user which argument of which
    * function is wrong (r8 ADVICE).
    */
  private def intLit(
      fn: String, what: String,
      e: org.apache.spark.sql.catalyst.expressions.Expression): Long = {
    if (!e.foldable)
      throw new IllegalArgumentException(
        s"$fn: $what must be an integer literal, not a column or non-foldable expression")
    e.eval() match {
      case n: java.lang.Integer => n.longValue()
      case n: java.lang.Long => n.longValue()
      case n: java.lang.Short => n.longValue()
      case n: java.lang.Byte => n.longValue()
      case other => throw new IllegalArgumentException(
        s"$fn: $what must be an integer literal; got " +
          s"${if (other == null) "NULL" else other.getClass.getSimpleName} ($other)")
    }
  }

  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarityExpr].getName, null, "cosine_sim"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        arity("cosine_sim", exprs, Set(2))
        CosineSimilarityExpr(exprs(0), exprs(1))
      }))
    extensions.injectFunction((
      new FunctionIdentifier("hll_distinct"),
      new ExpressionInfo(classOf[HllSketchAgg].getName, null, "hll_distinct"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        arity("hll_distinct", exprs, Set(1, 2))
        if (exprs.length > 1)
          HllSketchAgg(exprs(0), intLit("hll_distinct", "lgK", exprs(1)).toInt)
        else HllSketchAgg(exprs(0))
      }))
    extensions.injectFunction((
      new FunctionIdentifier("misra_gries"),
      new ExpressionInfo(classOf[MisraGriesAgg].getName, null, "misra_gries"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        arity("misra_gries", exprs, Set(2))
        MisraGriesAgg(exprs(0), intLit("misra_gries", "k", exprs(1)).toInt)
      }))
    extensions.injectFunction((
      new FunctionIdentifier("kll_quantiles"),
      new ExpressionInfo(classOf[KllQuantilesAgg].getName, null, "kll_quantiles"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        arity("kll_quantiles", exprs, Set(2, 3))
        // array(0.25, 0.5) parses as array<decimal> — convert elementwise
        // rather than via toDoubleArray (which would CCE on Decimal).
        // Every malformed ranks argument gets a NAMED error, matching the
        // arity guard's contract.
        val elemType = exprs(1).dataType match {
          case a: org.apache.spark.sql.types.ArrayType => a.elementType
          case other => throw new IllegalArgumentException(
            s"kll_quantiles ranks must be an array of numbers; got $other")
        }
        val evaled = exprs(1).eval()
        if (evaled == null) throw new IllegalArgumentException(
          "kll_quantiles ranks must not be NULL")
        val arr = evaled.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        val ranks = arr.toObjectArray(elemType).toSeq.map {
          case d: org.apache.spark.sql.types.Decimal => d.toDouble
          case n: Number => n.doubleValue()
          case null => throw new IllegalArgumentException(
            "kll_quantiles ranks must not contain NULL elements")
          case other => throw new IllegalArgumentException(
            s"kll_quantiles rank element has unsupported type: ${other.getClass}")
        }
        KllQuantilesAgg(
          exprs(0),
          ranks,
          if (exprs.length > 2) intLit("kll_quantiles", "k", exprs(2)).toInt
          else 200)
      }))
    // Spark's own bloom machinery (the InjectRuntimeFilter expressions),
    // exposed for explicit SQL use: bloom_agg(key, items, bits) builds the
    // binary, bloom_contains(bloom, key) probes it. Keys are xxhash64'd
    // here so callers pass the raw column on both sides.
    extensions.injectFunction((
      new FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        null, "bloom_agg"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        arity("bloom_agg", exprs, Set(3))
        // items/bits must be BIGINT literals; SQL integer literals parse as
        // INT, so re-literalize the folded values as longs.
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          new org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(exprs(0))),
          org.apache.spark.sql.catalyst.expressions.Literal(
            intLit("bloom_agg", "items", exprs(1))),
          org.apache.spark.sql.catalyst.expressions.Literal(
            intLit("bloom_agg", "bits", exprs(2))))
      }))
    extensions.injectFunction((
      new FunctionIdentifier("bloom_contains"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        null, "bloom_contains"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        arity("bloom_contains", exprs, Set(2))
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          exprs(0),
          new org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(exprs(1))))
      }))
    // Theta set-algebra sketches: theta_sketch(col[, lgK]) builds the
    // binary; theta_estimate(bin) and theta_{union,intersect,anotb}_est
    // (a, b) evaluate cardinalities over stored sketches.
    extensions.injectFunction((
      new FunctionIdentifier("theta_sketch"),
      new ExpressionInfo(classOf[ThetaSketchAgg].getName, null, "theta_sketch"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        arity("theta_sketch", exprs, Set(1, 2))
        if (exprs.length > 1)
          ThetaSketchAgg(exprs(0), intLit("theta_sketch", "lgK", exprs(1)).toInt)
        else ThetaSketchAgg(exprs(0))
      }))
    extensions.injectFunction((
      new FunctionIdentifier("theta_estimate"),
      new ExpressionInfo(classOf[ThetaEstimateExpr].getName, null, "theta_estimate"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        arity("theta_estimate", exprs, Set(1))
        ThetaEstimateExpr(exprs(0))
      }))
    Seq("union", "intersect", "anotb").foreach { op =>
      extensions.injectFunction((
        new FunctionIdentifier(s"theta_${op}_est"),
        new ExpressionInfo(classOf[ThetaSetEstExpr].getName, null, s"theta_${op}_est"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
          arity(s"theta_${op}_est", exprs, Set(2))
          ThetaSetEstExpr(exprs(0), exprs(1), op)
        }))
    }
    // Stored-KLL surface: kll_sketch(col[, k]) builds the binary,
    // kll_merge(bin[, k]) re-aggregates stored sketches, kll_value(bin,
    // rank) reads a quantile off one.
    extensions.injectFunction((
      new FunctionIdentifier("kll_sketch"),
      new ExpressionInfo(classOf[KllSketchBinAgg].getName, null, "kll_sketch"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        arity("kll_sketch", exprs, Set(1, 2))
        if (exprs.length > 1)
          KllSketchBinAgg(exprs(0), intLit("kll_sketch", "k", exprs(1)).toInt)
        else KllSketchBinAgg(exprs(0))
      }))
    extensions.injectFunction((
      new FunctionIdentifier("kll_merge"),
      new ExpressionInfo(classOf[KllMergeBinAgg].getName, null, "kll_merge"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        arity("kll_merge", exprs, Set(1, 2))
        if (exprs.length > 1)
          KllMergeBinAgg(exprs(0), intLit("kll_merge", "k", exprs(1)).toInt)
        else KllMergeBinAgg(exprs(0))
      }))
    extensions.injectFunction((
      new FunctionIdentifier("kll_value"),
      new ExpressionInfo(classOf[KllValueExpr].getName, null, "kll_value"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        arity("kll_value", exprs, Set(2))
        KllValueExpr(exprs(0), exprs(1))
      }))
    // Read side of Spark's own count_min_sketch aggregate: the builtin
    // builds the binary but offers no estimator function.
    extensions.injectFunction((
      new FunctionIdentifier("cms_estimate"),
      new ExpressionInfo(classOf[CmsEstimateExpr].getName, null, "cms_estimate"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        arity("cms_estimate", exprs, Set(2))
        CmsEstimateExpr(exprs(0), exprs(1))
      }))
  }
}
