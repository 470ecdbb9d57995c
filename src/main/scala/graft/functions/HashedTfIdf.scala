package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Feature-hashed term-frequency vector (the "hashing trick" —
  * Weinberger et al. 2009; the published Spark MLlib HashingTF shape):
  * each token xxhash64-buckets into `dim` slots and the slot counts its
  * occurrences. No vocabulary, no fit pass, no shuffle — a NARROW
  * per-row map whose output dimension is fixed up front, which is what
  * makes text → vector viable in one scan at 100 TB (a dictionary-based
  * vectorizer needs a corpus-sized distinct + broadcast).
  *
  * Collisions are the accepted trade (two tokens sharing a slot add
  * their counts); dim is the knob. Null tokens are skipped. */
case class HashedTfVector(child: Expression, dim: Int, seed: Long)
    extends UnaryExpression with ExpectsInputTypes {
  require(dim > 0, "dim must be > 0")
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_hashed_tf"

  override protected def nullSafeEval(input: Any): Any =
    HashedTfVector.compute(input.asInstanceOf[ArrayData], dim, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.HashedTfVector.compute($in, $dim, ${seed}L);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashedTfVector {
  def compute(words: ArrayData, dim: Int, seed: Long): ArrayData = {
    val v = new Array[Double](dim)
    val n = words.numElements()
    var i = 0
    while (i < n) {
      // empty tokens are skipped (the whitespace tokenizer emits [""]
      // for blank text) — mirrors the engine-wide `length(token) > 0`
      // convention, and keeps blank docs as exact zero vectors
      if (!words.isNullAt(i) && words.getUTF8String(i).numBytes > 0) {
        val w = words.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(w.getBaseObject, w.getBaseOffset, w.numBytes, seed)
        // floorMod: hash is signed
        val slot = ((h % dim) + dim) % dim
        v(slot.toInt) += 1.0
      }
      i += 1
    }
    new GenericArrayData(v)
  }

  def apply(words: org.apache.spark.sql.Column, dim: Int, seed: Long): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      HashedTfVector(org.apache.spark.sql.GraftColumnBridge.expression(words), dim, seed))
}

/** Elementwise product with a fixed weight vector — the IDF application
  * step. The weights ride into generated code as ONE reference object
  * (a dim-length double array, serialized once per task), NOT as a
  * dim-term literal expression tree — at dim 2^16 an `array(lit...)`
  * plan would blow past Janino's method limits; a referenced array is
  * O(1) plan size at any dim. */
case class WeightScale(child: Expression, weights: Array[Double])
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_weight_scale"

  override protected def nullSafeEval(input: Any): Any =
    WeightScale.compute(input.asInstanceOf[ArrayData], weights)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("scaleWeights", weights, "double[]")
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.WeightScale.compute($in, $w);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WeightScale {
  def compute(vec: ArrayData, weights: Array[Double]): ArrayData = {
    val n = vec.numElements()
    require(n == weights.length,
      s"vector length $n != weight length ${weights.length}")
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = vec.getDouble(i) * weights(i); i += 1 }
    new GenericArrayData(out)
  }

  def apply(vec: org.apache.spark.sql.Column, weights: Array[Double]): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      WeightScale(org.apache.spark.sql.GraftColumnBridge.expression(vec), weights))
}
