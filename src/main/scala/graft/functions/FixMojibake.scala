package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Repair classic mojibake: UTF-8 bytes that some upstream system
  * decoded as Windows-1252/Latin-1, turning "café" into "cafÃ©" and
  * curly quotes into "â€™" — endemic in web crawls, and poison for
  * dedup/fingerprints (the corrupted and clean forms of the same text
  * never match). The inverse transform re-encodes each char through the
  * cp1252 byte it came from and strictly re-decodes as UTF-8.
  *
  * SAFETY is the design center — the repair applies only when ALL hold:
  *  1. every char maps to a cp1252 byte (any genuinely non-Latin char
  *     — CJK, Cyrillic, emoji — makes the row untouchable);
  *  2. at least one mapped byte is a UTF-8 multi-byte LEAD (0xC2-0xF4)
  *     — pure ASCII/Latin text short-circuits untouched;
  *  3. the byte sequence decodes as STRICTLY valid UTF-8 (malformed
  *     anywhere → untouched): legitimate text like "São" survives
  *     because 'Ã'+'o' is 0xC3 0x6F — an invalid continuation, so the
  *     strict decode rejects the repair.
  * Double-encoded text (mojibake of mojibake) repairs in the second of
  * two capped passes. Null-in-null-out; one narrow codegen map. */
case class FixMojibake(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_fix_mojibake"

  override protected def nullSafeEval(input: Any): Any =
    FixMojibake.fix(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.FixMojibake.fix($in);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FixMojibake {

  /** char -> cp1252 byte, or -1. Chars 0x00-0xFF map to themselves
    * EXCEPT 0x80-0x9F (undefined in cp1252 — upstreams that decoded
    * with latin-1 pass these through, so accept them too); the 27
    * cp1252 glyphs at 0x80-0x9F map back to their byte. */
  private val glyphToByte: java.util.HashMap[Character, java.lang.Byte] = {
    // derive from the JDK's own windows-1252 tables: byte -> glyph,
    // inverted (hand-typing the 0x80-0x9F row invites slot-misalignment
    // bugs around its five undefined positions)
    val m = new java.util.HashMap[Character, java.lang.Byte]()
    val cs = java.nio.charset.Charset.forName("windows-1252")
    var b = 0x80
    while (b <= 0x9f) {
      val c = new String(Array(b.toByte), cs).charAt(0)
      if (c != '\ufffd') m.put(c, java.lang.Byte.valueOf(b.toByte))
      b += 1
    }
    m
  }

  private def charToByte(c: Char): Int = {
    if (c < 0x80) c
    else if (c >= 0x80 && c <= 0x9f) c // latin-1-decoded control range
    else if (c <= 0xff) c
    else {
      val b = glyphToByte.get(c)
      if (b == null) -1 else b.byteValue() & 0xff
    }
  }

  private def tryOnce(s: String): String = {
    val n = s.length
    if (n == 0) return null
    val bytes = new Array[Byte](n)
    var suspicious = false
    var i = 0
    while (i < n) {
      val b = charToByte(s.charAt(i))
      if (b < 0) return null
      if (b >= 0xc2 && b <= 0xf4) suspicious = true
      bytes(i) = b.toByte
      i += 1
    }
    if (!suspicious) return null
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try {
      val out = dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
      if (out == s) null else out
    } catch { case _: java.nio.charset.CharacterCodingException => null }
  }

  def fix(u: UTF8String): UTF8String = {
    // pure ASCII can't be mojibake: byte==char count short-circuit
    if (u.numBytes == u.numChars) return u
    var cur = u.toString
    var changed = false
    var pass = 0
    while (pass < 2) { // double-encoded text needs exactly two
      val r = tryOnce(cur)
      if (r == null) pass = 2
      else { cur = r; changed = true; pass += 1 }
    }
    if (changed) UTF8String.fromString(cur) else u
  }

  def apply(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    column(FixMojibake(expression(text)))
  }
}
