package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen expressions for the embedding (`array<float>`) hot
  * path: constant-vector dot products and self dot products. These
  * replace interpreted higher-order-function folds
  * (`aggregate(zip_with(...))` allocates closures and boxes every
  * element, per row, per plane/centroid — 16-24 folds per row in the
  * LSH/IVF signature stage) with a tight generated loop, while keeping
  * whole-stage codegen intact.
  *
  * NUMERIC CONTRACT: the kernels accumulate STRICTLY left-to-right from
  * 0.0 — the same association order as the HOF fold they replace and as
  * the DuckDB `0 + t1 + t2 + …` oracle chain — so the produced doubles
  * are bit-identical and every oracle stays green (asserted in
  * SimilaritySpec/CORRECTNESS; see Similarity.Dialect).
  */
object VectorKernels {

  /** Σ a[i]·w[i], left-associated from 0.0. */
  def dotConst(a: ArrayData, w: Array[Double]): Double = {
    var acc = 0.0
    val n = math.min(a.numElements(), w.length)
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * w(i)
      i += 1
    }
    acc
  }

  /** Σ a[i]², left-associated from 0.0. */
  def dotSelf(a: ArrayData): Double = {
    var acc = 0.0
    val n = a.numElements()
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      acc += x * x
      i += 1
    }
    acc
  }
}

/** `float_dot_const(arr) = Σ arr[i]·weights[i]` over `array<float>`. */
case class FloatDotConstExpr(child: Expression, weights: Seq[Double]) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "float_dot_const"

  @transient private lazy val w: Array[Double] = weights.toArray

  override protected def nullSafeEval(a: Any): Any =
    VectorKernels.dotConst(a.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("weights", w, "double[]")
    defineCodeGen(ctx, ev, a => s"graft.functions.VectorKernels.dotConst($a, $ref)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `float_dot_self(arr) = Σ arr[i]²` over `array<float>`. */
case class FloatDotSelfExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "float_dot_self"

  override protected def nullSafeEval(a: Any): Any =
    VectorKernels.dotSelf(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VectorKernels.dotSelf($a)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
