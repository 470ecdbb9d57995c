package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode script profile in ONE character walk: per-class counts for
  * the five dominant script blocks plus the dominant-script label —
  * replacing five separate `regexp_count` passes (and, for the label,
  * five more CSE-dependent duplicates) with a single narrow codegen
  * scan. Measured 5 regex passes → 1 walk on the documents fixture
  * (BENCH_NOTES #34).
  *
  * The class ranges are EXACTLY
  * [[graft.operators.TextAnalysis.ScriptRanges]] — the \x{hhhh} ranges
  * the RE2-based oracle runs verbatim: latin A-Z a-z U+00C0-024F, cjk
  * U+4E00-9FFF U+3040-30FF U+AC00-D7AF, cyrillic U+0400-04FF, arabic
  * U+0600-06FF, devanagari U+0900-097F. All ranges are BMP, so a char
  * walk is code-point exact (surrogate halves of supplementary chars
  * fall in U+D800-DFFF, which no class contains — same non-match the
  * regex engines produce). Label = first class attaining the max count
  * in range order ("none" when no class matches), byte-for-byte the
  * argmax chain of [[graft.operators.TextAnalysis.dominantScript]]. */
case class ScriptProfile(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ScriptProfile.schema
  override def prettyName: String = "graft_script_profile"

  override protected def nullSafeEval(input: Any): Any =
    ScriptProfile.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.ScriptProfile.compute($in);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ScriptProfile {

  val classNames: Seq[String] = Seq("latin", "cjk", "cyrillic", "arabic", "devanagari")

  val schema: StructType = StructType(
    classNames.map(n => StructField(n, IntegerType, nullable = false)) :+
      StructField("script", StringType, nullable = false))

  private val labels: Array[UTF8String] =
    (classNames :+ "none").map(UTF8String.fromString).toArray

  def compute(text: UTF8String): InternalRow = {
    val s = text.toString
    val counts = new Array[Int](5)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
          (c >= 0x00C0 && c <= 0x024F)) counts(0) += 1
      else if ((c >= 0x4E00 && c <= 0x9FFF) || (c >= 0x3040 && c <= 0x30FF) ||
               (c >= 0xAC00 && c <= 0xD7AF)) counts(1) += 1
      else if (c >= 0x0400 && c <= 0x04FF) counts(2) += 1
      else if (c >= 0x0600 && c <= 0x06FF) counts(3) += 1
      else if (c >= 0x0900 && c <= 0x097F) counts(4) += 1
      i += 1
    }
    // first class attaining the max, in range order; "none" on all-zero
    var best = 0
    var k = 1
    while (k < 5) { if (counts(k) > counts(best)) best = k; k += 1 }
    val label = if (counts(best) == 0) labels(5) else labels(best)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](counts(0), counts(1), counts(2), counts(3), counts(4), label))
  }

  def apply(text: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      ScriptProfile(org.apache.spark.sql.GraftColumnBridge.expression(text)))
}
