package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe of a 64-bit hash against a pre-built Bloom filter
  * (Spark's own `util.sketch.BloomFilter`, built distributed via
  * `df.stat.bloomFilter`). `true` may be a false positive at the
  * filter's configured fpp; `false` is exact — the right asymmetry for
  * decontamination, where a false positive only OVER-flags a training
  * document (safe direction).
  *
  * The sketch rides into generated code as a referenced object
  * (`ctx.addReferenceObj`), not a literal: the generated source stays
  * identical across different filters (codegen cache hits), and the
  * sketch ships to executors once per task binary instead of being
  * re-encoded per row. Same pattern as [[CentroidDots]] /
  * [[PqExpressions]].
  */
case class BloomContainsLong(child: Expression, bloom: BloomFilter)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  override protected def nullSafeEval(h: Any): Any =
    bloom.mightContainLong(h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, h => s"${ev.value} = $b.mightContainLong($h);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomContainsLong {
  def apply(c: Column, bloom: BloomFilter): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      BloomContainsLong(org.apache.spark.sql.GraftColumnBridge.expression(c), bloom))
}
