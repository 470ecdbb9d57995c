package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Symmetric int8 embedding quantization — the 4x storage/bandwidth
  * compression for embedding columns (public technique: max-abs scaled
  * int8, the same scheme faiss' SQ8 and common serving stacks use).
  * Self-contained layout: 4-byte big-endian float scale, then one byte
  * per dimension (`round(v/scale)` clamped to [-127, 127]), so a code
  * carries everything needed to score it — no side table, unlike PQ
  * ([[PqEncode]]), trading PQ's 8-32x ratio for near-exact dot
  * products and zero training.
  *
  * [[Int8Dot]] scores two codes without materializing floats: integer
  * multiply-accumulate (JIT vectorizes the i8*i8 loop), one float
  * rescale at the end. Null-in-null-out throughout. */
case class QuantizeInt8(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  // array<float> (the natural embedding type) implicitly casts to
  // array<double> at analysis — without the declaration, the SQL
  // registration read float elements as doubles (garbage or CCE)
  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType = BinaryType
  // nullable beyond child nullability: a null ELEMENT nulls the whole
  // code (see compute) — UnsafeArrayData.getDouble would otherwise read
  // it as 0.0 and quantize a phantom zero, breaking null-in-null-out
  override def nullable: Boolean = true
  override def prettyName: String = "graft_quantize_int8"

  override protected def nullSafeEval(v: Any): Any =
    QuantizeInt8.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val tmp = ctx.freshName("i8q")
      s"""
         |byte[] $tmp = graft.functions.QuantizeInt8.compute($v);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QuantizeInt8 {
  // returns null (-> SQL NULL) when any ELEMENT is null: a partially-null
  // vector has no meaningful max-abs scale, and silently reading nulls as
  // 0.0 would fabricate real zero components in the code
  def compute(vec: ArrayData): Array[Byte] = {
    val n = vec.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      if (vec.isNullAt(i)) return null
      val a = math.abs(vec.getDouble(i))
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val scale = if (maxAbs == 0.0) 0.0f else (maxAbs / 127.0).toFloat
    val out = new Array[Byte](4 + n)
    val bits = java.lang.Float.floatToIntBits(scale)
    out(0) = (bits >>> 24).toByte; out(1) = (bits >>> 16).toByte
    out(2) = (bits >>> 8).toByte; out(3) = bits.toByte
    if (scale != 0.0f) {
      i = 0
      while (i < n) {
        val q = math.rint(vec.getDouble(i) / scale)
        out(4 + i) = math.max(-127, math.min(127, q)).toByte
        i += 1
      }
    }
    out
  }

  def apply(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      QuantizeInt8(org.apache.spark.sql.GraftColumnBridge.expression(c)))
}

/** Dot product of two [[QuantizeInt8]] codes (see layout above).
  * Returns NULL — not a fabricated score — for malformed codes
  * (shorter than the 4-byte header) or mismatched dimensions: a ragged
  * corpus must surface as missing scores that a ranking window sorts
  * last, never as silently truncated prefix products. */
case class Int8Dot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(BinaryType, BinaryType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_int8_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Int8Dot.compute(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("i8dot")
      s"""
         |java.lang.Double $tmp = graft.functions.Int8Dot.compute($a, $b);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Int8Dot {
  private def scaleOf(b: Array[Byte]): Float = java.lang.Float.intBitsToFloat(
    ((b(0) & 0xff) << 24) | ((b(1) & 0xff) << 16) | ((b(2) & 0xff) << 8) | (b(3) & 0xff))

  // boxed Double so malformed/mismatched inputs can yield SQL NULL
  def compute(a: Array[Byte], b: Array[Byte]): java.lang.Double = {
    if (a.length < 4 || b.length < 4 || a.length != b.length) return null
    val n = a.length - 4
    var acc = 0L
    var i = 0
    while (i < n) { acc += a(4 + i) * b(4 + i); i += 1 }
    scaleOf(a).toDouble * scaleOf(b).toDouble * acc
  }

  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      Int8Dot(
        org.apache.spark.sql.GraftColumnBridge.expression(a),
        org.apache.spark.sql.GraftColumnBridge.expression(b)))
}
