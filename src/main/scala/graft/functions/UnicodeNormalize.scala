package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization to a CALLER-CHOSEN form (NFC/NFD/NFKC/NFKD) —
  * the form-parametrized sibling of [[NfcNormalize]], needed because
  * published tokenizer artifacts pin a specific form in their
  * `normalizer` section (NFKC for many SentencePiece exports, NFD
  * inside BertNormalizer) and budget-counting under the wrong form
  * silently drifts. Same JDK `java.text.Normalizer` tables, same
  * fast paths: ASCII is invariant under ALL four forms (one
  * byte-length check), and `isNormalized` short-circuits the
  * allocation for already-normal text. The form is an expression
  * parameter fixed at plan time, so codegen embeds the enum constant
  * directly — no per-row dispatch. Null-in-null-out. */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_unicode_normalize"

  // plan-time validation only (cheap string compare — safe to run on
  // every Catalyst copy, per the AhoCorasick eager-require lesson)
  require(UnicodeNormalize.forms.contains(form),
    s"unknown Unicode normalization form '$form' (want one of ${UnicodeNormalize.forms.mkString("/")})")

  @transient private lazy val f = java.text.Normalizer.Form.valueOf(form)

  override protected def nullSafeEval(input: Any): Any =
    UnicodeNormalize.normalize(input.asInstanceOf[UTF8String], f)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.UnicodeNormalize.normalize($in, java.text.Normalizer.Form.$form);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeNormalize {
  private[functions] val forms = Set("NFC", "NFD", "NFKC", "NFKD")

  def normalize(s: UTF8String, form: java.text.Normalizer.Form): UTF8String = {
    // ASCII is closed under every normalization form: byte-length scan
    if (s.numBytes == s.numChars) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, form))
  }

  def apply(c: Column, form: String): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      UnicodeNormalize(org.apache.spark.sql.GraftColumnBridge.expression(c), form))
}
