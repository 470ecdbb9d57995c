package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** 64-bit Morton (Z-order) code of two 32-bit ints: bits of `x` and `y`
  * interleave (x in even positions, y in odd), so sorting by the code
  * places rows close in BOTH dimensions into the same neighborhood —
  * the multi-dimensional clustering recipe behind Z-ordered table
  * layouts (public technique; Morton 1966, used by Delta/Iceberg
  * OPTIMIZE ZORDER). Inputs are treated as UNSIGNED bit patterns: a
  * caller wanting order-preserving codes for signed/skewed values
  * should rank-normalize first ([[graft.operators.Layout.zorderBy]]
  * does). Bit-spreading is the standard mask sequence — five shift-or
  * steps per operand, branch-free, codegen'd to one static call.
  *
  * Null semantics: null-in-null-out (BinaryExpression default). */
case class MortonCode(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(IntegerType, IntegerType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_morton"

  override protected def nullSafeEval(x: Any, y: Any): Any =
    MortonCode.interleave(x.asInstanceOf[Int], y.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.MortonCode.interleave($x, $y);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object MortonCode {
  /** Spread the 32 bits of `v` into the even bit positions of a long. */
  def spread(v: Int): Long = {
    var x = v.toLong & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  def interleave(x: Int, y: Int): Long = spread(x) | (spread(y) << 1)

  def apply(x: Column, y: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      MortonCode(
        org.apache.spark.sql.GraftColumnBridge.expression(x),
        org.apache.spark.sql.GraftColumnBridge.expression(y)))
}
