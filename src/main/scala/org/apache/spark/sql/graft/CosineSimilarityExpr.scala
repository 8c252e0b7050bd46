package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Native Catalyst expression: cosine similarity of two ARRAY<DOUBLE>
  * columns in a single fused loop.
  *
  * The builtin-composed form (`aggregate(zip_with(a,b,*), ...)`) allocates
  * an intermediate array per row and evaluates three lambda chains; this
  * expression reads both `ArrayData` buffers once with no allocation and
  * participates in whole-stage codegen via `doGenCode` — the hot path of
  * ANN / near-dup scoring at embedding-table scale.
  *
  * Lives under `org.apache.spark.sql` because `ExpressionUtils` /
  * `AbstractDataType` are `private[sql]` — the standard placement for
  * Catalyst extensions built outside the Spark tree.
  *
  * Accumulation is left-to-right in doubles, matching both the builtin
  * composition and DuckDB's `list_cosine_similarity`, so oracle parity is
  * bit-exact. Null ELEMENTS are not expected (embedding vectors); a null
  * array yields null via `nullSafeEval`. Zero-norm input yields NaN, same
  * as the compositional form.
  */
case class CosineSimilarityExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getDouble(i)
      val yv = y.getDouble(i)
      dot += xv * yv
      nx += xv * xv
      ny += yv * yv
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName: the expression may be inlined more than once into one
      // codegen stage (e.g. filter predicate + projection after alias
      // substitution); fixed local names would collide.
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = $a.getDouble($i);
         |  double $yv = $b.getDouble($i);
         |  $dot += $xv * $yv;
         |  $nx += $xv * $xv;
         |  $ny += $yv * $yv;
         |}
         |${ev.value} = $dot /
         |  (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarityExpr {
  /** Column-API entry point. */
  def cosineSim(a: Column, b: Column): Column =
    ExpressionUtils.column(CosineSimilarityExpr(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Expose as a SQL function (`SELECT cosine_sim(a, b) ...`). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSimilarityExpr(exprs(0), exprs(1)), "scala_udf")
}
