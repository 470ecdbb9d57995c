package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}

/** Linear margin of a hashed bag-of-words over a token array: each
  * non-null token hashes to bucket `floorMod(xxhash64(token), B)` and
  * contributes `weights(bucket)`; with `normalize` the sum divides by
  * the non-null token count (term frequency c_b/total — the feature the
  * hashed-text logistic regression trains on). One narrow codegen pass:
  * the 100 TB corpus-scoring half of
  * [[graft.operators.Classifier.trainHashedText]], no explode, no join,
  * no shuffle.
  *
  * Bucket parity is EXACT with the DataFrame training side
  * (`pmod(xxhash64(tok), B)`): XXH64 seed 42 over the token's UTF8
  * bytes is precisely Spark's `xxhash64` on a string column, and
  * `floorMod` matches `pmod` on negative hashes (ClassifierSpec asserts
  * the equality on randomized tokens). The weight vector rides in as a
  * referenced object, not a literal array — generated source stays
  * identical across models, so re-scoring with retrained weights never
  * pays a Janino recompile (the [[CentroidDots]] lesson). */
case class HashedBagMargin(child: Expression, weights: Array[Double],
                           normalize: Boolean)
    extends UnaryExpression with ExpectsInputTypes {
  require(weights.nonEmpty, "weights must be non-empty")
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_hashed_bag_margin"

  override protected def nullSafeEval(input: Any): Any =
    HashedBagMargin.compute(input.asInstanceOf[ArrayData], weights, normalize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("hbWeights", weights, "double[]")
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.HashedBagMargin.compute($in, $w, $normalize);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashedBagMargin {
  def compute(toks: ArrayData, w: Array[Double], normalize: Boolean): Double = {
    val n = toks.numElements()
    val b = w.length.toLong
    var s = 0.0
    var cnt = 0
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val t = toks.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, 42L)
        s += w(java.lang.Math.floorMod(h, b).toInt)
        cnt += 1
      }
      i += 1
    }
    if (normalize && cnt > 0) s / cnt else s
  }

  def margin(tokens: Column, weights: Array[Double], normalize: Boolean): Column = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    column(HashedBagMargin(expression(tokens), weights, normalize))
  }
}
