package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fraction of all word bigrams held by the single most frequent bigram
  * (the Gopher top-2-gram repetition rule) as ONE native expression:
  * a tight loop + hash-map count over adjacent token pairs. 0.0 for
  * arrays with fewer than 2 tokens; null-in-null-out.
  *
  * Replaces the composable formulation (transform(sequence) ->
  * array_sort -> aggregate fold with struct state): that stack is
  * CodegenFallback, and fused into a wider projection (the
  * txt_quality_gate shape) it pushed the generated consume() past the
  * JIT's huge-method threshold — the whole stage then ran interpreted,
  * ~20x slower than the metrics evaluated separately. One static call
  * keeps the generated method tiny. */
case class TopBigramFraction(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_top_bigram_fraction"

  override protected def nullSafeEval(input: Any): Any =
    TopBigramFraction.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.TopBigramFraction.compute($in);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TopBigramFraction {
  private val Space = UTF8String.fromString(" ")

  def compute(arr: ArrayData): Double = {
    val n = arr.numElements()
    if (n < 2) return 0.0
    def tok(i: Int): UTF8String = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
    val counts = new java.util.HashMap[UTF8String, Integer](n * 2)
    var best = 0
    var i = 0
    while (i < n - 1) {
      // concatWs skips nulls — identical to the SQL concat_ws bigram
      val bg = UTF8String.concatWs(Space, tok(i), tok(i + 1))
      val c = counts.merge(bg, 1, (a, b) => a + b)
      if (c > best) best = c
      i += 1
    }
    best.toDouble / (n - 1).toDouble
  }

  def apply(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      TopBigramFraction(org.apache.spark.sql.GraftColumnBridge.expression(c)))
}
