package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** Rank bucket of a double against sorted boundary values: returns the
  * count of boundaries <= value (0 .. boundaries.length), via binary
  * search. With boundaries taken at equi-spaced quantiles this maps a
  * SKEWED dimension onto near-uniform bucket ranks — the normalization
  * [[graft.operators.Layout.zorderByRank]] feeds into Morton codes,
  * where raw uniform binning would collapse a dense region into one
  * bucket and forfeit pruning inside it.
  *
  * The boundary array rides in as a referenced object
  * (`ctx.addReferenceObj`), not literals: generated source stays
  * identical across different boundary sets, so repeated layout jobs
  * hit the codegen cache (the [[CentroidDots]] lesson). Null-in,
  * null-out; NaN sorts above every boundary (Java compare semantics),
  * landing it in the top bucket rather than throwing. */
case class BucketIndex(child: Expression, boundaries: Array[Double])
    extends UnaryExpression with ExpectsInputTypes {
  require(boundaries.nonEmpty, "boundaries must be non-empty")
  override def inputTypes = Seq(DoubleType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_bucket_index"

  override protected def nullSafeEval(v: Any): Any =
    BucketIndex.bucket(v.asInstanceOf[Double], boundaries)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bs = ctx.addReferenceObj("boundaries", boundaries, "double[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.BucketIndex.bucket($v, $bs);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BucketIndex {
  /** Number of boundaries <= v (boundaries sorted ascending). */
  def bucket(v: Double, boundaries: Array[Double]): Int = {
    var lo = 0
    var hi = boundaries.length // invariant: boundaries[<lo] <= v < boundaries[>=hi]
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (java.lang.Double.compare(boundaries(mid), v) <= 0) lo = mid + 1 else hi = mid
    }
    lo
  }

  def apply(c: Column, boundaries: Array[Double]): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      BucketIndex(org.apache.spark.sql.GraftColumnBridge.expression(c), boundaries))
}
