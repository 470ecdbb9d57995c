package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Checksum validators for structural PII detection (the
  * txt_pii_ner surface): pattern matches alone over-trigger on
  * arbitrary digit runs — the checksum is what separates a real
  * card/account number from a timestamp or serial. Both are public
  * algorithms (Luhn: ISO/IEC 7812; IBAN: ISO 13616 mod-97), both
  * codegen'd, allocation-free, null-in-null-out, whole-stage
  * friendly — usable inside HOF lambdas over
  * `regexp_extract_all` candidates. */
case class LuhnValid(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_luhn_valid"

  override protected def nullSafeEval(input: Any): Any =
    Checksums.luhnValid(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.Checksums.luhnValid($in);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class IbanValid(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_iban_valid"

  override protected def nullSafeEval(input: Any): Any =
    Checksums.ibanValid(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.Checksums.ibanValid($in);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Checksums {

  /** Luhn (mod-10) check over a candidate card number. Spaces and
    * dashes are ignored (the standard grouping separators the
    * candidate regex admits); any other non-digit, or a digit count
    * outside [12, 19] (the ISO/IEC 7812 PAN length range), is false —
    * the validator REJECTS malformed input rather than guessing. */
  def luhnValid(s: UTF8String): Boolean = luhn(s.toString)

  def luhn(raw: String): Boolean = {
    var nDigits = 0
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (c >= '0' && c <= '9') nDigits += 1
      else if (c != ' ' && c != '-') return false
      i += 1
    }
    if (nDigits < 12 || nDigits > 19) return false
    var sum = 0
    var posFromRight = 0 // 0-based; odd positions double
    i = raw.length - 1
    while (i >= 0) {
      val c = raw.charAt(i)
      if (c >= '0' && c <= '9') {
        val d = c - '0'
        val v = if (posFromRight % 2 == 1) { val t = 2 * d; if (t > 9) t - 9 else t } else d
        sum += v
        posFromRight += 1
      }
      i -= 1
    }
    sum % 10 == 0
  }

  /** ISO 13616 IBAN check: move the first four chars to the end, map
    * letters A..Z to 10..35, fold the resulting decimal string mod 97
    * (digit step ×10, letter step ×100 — no bignum needed), valid iff
    * the remainder is 1. Uppercase letters and digits only, length
    * [15, 34]; anything else is false. */
  def ibanValid(s: UTF8String): Boolean = iban(s.toString)

  def iban(raw: String): Boolean = {
    val n = raw.length
    if (n < 15 || n > 34) return false
    var i = 0
    while (i < n) {
      val c = raw.charAt(i)
      val ok = (c >= '0' && c <= '9') || (c >= 'A' && c <= 'Z')
      if (!ok) return false
      i += 1
    }
    var acc = 0L
    var j = 0
    while (j < n) {
      // rearranged order: chars 4..n-1 then 0..3
      val c = raw.charAt(if (j < n - 4) j + 4 else j - (n - 4))
      if (c >= '0' && c <= '9') acc = (acc * 10 + (c - '0')) % 97
      else acc = (acc * 100 + (c - 'A' + 10)) % 97
      j += 1
    }
    acc == 1L
  }
}
