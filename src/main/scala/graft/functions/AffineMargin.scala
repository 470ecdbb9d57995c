package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** `w . x + b` over a double-array column, with `[w..., b]` riding as
  * ONE referenced object.
  *
  * Exists for the iterative trainers: building the margin from
  * `array(lit(w0), lit(w1), ...) + lit(b)` bakes each gradient step's
  * values into the generated source, so EVERY step pays a fresh Janino
  * whole-stage compile (the [[CentroidDots]] lesson — 1-2 s of fixed
  * cost per iteration that dwarfs the actual scan on small data). With
  * the parameters as a reference object the generated source is
  * byte-identical across steps, the codegen cache hits, and an
  * iteration costs only its job. The bias lives in the same array
  * (last slot) so no scalar literal sneaks back into the source. */
case class AffineMargin(child: Expression, weightsAndBias: Array[Double])
    extends UnaryExpression with ExpectsInputTypes {
  require(weightsAndBias.nonEmpty, "weightsAndBias must carry at least the bias")
  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_affine_margin"

  override protected def nullSafeEval(input: Any): Any =
    AffineMargin.compute(input.asInstanceOf[ArrayData], weightsAndBias)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("affineWb", weightsAndBias, "double[]")
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.AffineMargin.compute($in, $w);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AffineMargin {
  def compute(x: ArrayData, wb: Array[Double]): Double = {
    val d = wb.length - 1
    val n = math.min(x.numElements(), d)
    var s = wb(d) // bias
    var i = 0
    while (i < n) { s += x.getDouble(i) * wb(i); i += 1 }
    s
  }

  /** Column API: `margin(vec, w, b)`; vec must already be array<double>
    * (cast upstream — the expression does not coerce). */
  def margin(vec: Column, weights: Array[Double], bias: Double): Column = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    column(AffineMargin(expression(vec), weights :+ bias))
  }
}
