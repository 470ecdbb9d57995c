package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Affine mat-vec `y_i = Σ_j M[i][j]·x[j] − off[i]` as one codegen'd
  * expression — the PCA transform shape `W(x − μ)` with the constant
  * `W·μ` folded into per-row offsets on the driver, so the executor-side
  * work is exactly one mat-vec and k subtractions. Same referenced-object
  * design as [[CentroidDots]] (flat row-major matrix + offsets ride in
  * the references array): generated source is identical across models,
  * Janino compiles once per session. */
case class AffineDots(child: Expression, matrix: Array[Double],
                      offsets: Array[Double]) extends UnaryExpression {
  require(offsets.nonEmpty && matrix.length % offsets.length == 0,
    s"matrix length ${matrix.length} must be a multiple of k=${offsets.length}")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_affine_dots"

  override protected def nullSafeEval(v: Any): Any =
    AffineDots.compute(v.asInstanceOf[ArrayData], matrix, offsets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("matrix", matrix, "double[]")
    val o = ctx.addReferenceObj("offsets", offsets, "double[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.AffineDots.compute($v, $m, $o);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AffineDots {
  def compute(vec: ArrayData, matrix: Array[Double],
              offsets: Array[Double]): ArrayData = {
    val k = offsets.length
    val d = matrix.length / k
    // fail loud on a dimension mismatch: a silent min() would project a
    // truncated/zero-padded vector — a wrong answer, not an error — and
    // Pca.fit already enforces length == dim at fit time
    if (vec.numElements() != d) throw new IllegalArgumentException(
      s"graft_affine_dots: vector length ${vec.numElements()} != fitted dim $d")
    val out = new Array[Double](k)
    var c = 0
    while (c < k) {
      val base = c * d
      var s = 0.0
      var t = 0
      while (t < d) { s += vec.getDouble(t) * matrix(base + t); t += 1 }
      out(c) = s - offsets(c)
      c += 1
    }
    new GenericArrayData(out)
  }

  def apply(c: Column, matrix: Array[Double], offsets: Array[Double]): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      AffineDots(org.apache.spark.sql.GraftColumnBridge.expression(c), matrix, offsets))
}
