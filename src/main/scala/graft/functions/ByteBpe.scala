package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** GPT-2's public byte↔unicode bijection (Radford et al. 2019 released
  * encoder): every byte 0..255 maps to a distinct PRINTABLE BMP code
  * point — the 188 visually-safe bytes (33..126, 161..172, 174..255)
  * map to themselves, the 68 awkward ones (controls, space, DEL, NBSP,
  * SHY) map to 256+k in discovery order. BPE then runs on the mapped
  * one-char-per-byte strings: merges never have to represent raw
  * control bytes, and the map is a bijection, so ANY byte sequence —
  * including invalid UTF-8 — round-trips exactly. */
object ByteCoder {
  /** byte (0..255) -> mapped char */
  val byteToChar: Array[Char] = {
    val direct = (33 to 126) ++ (161 to 172) ++ (174 to 255)
    val isDirect = Array.fill(256)(false)
    direct.foreach(b => isDirect(b) = true)
    val out = new Array[Char](256)
    var next = 256
    var b = 0
    while (b < 256) {
      if (isDirect(b)) out(b) = b.toChar
      else { out(b) = next.toChar; next += 1 }
      b += 1
    }
    out
  }

  /** mapped char -> byte; -1 for chars outside the image (never produced
    * by [[encode]]; guards [[decode]] against foreign input). */
  private val charToByte: Array[Int] = {
    val out = Array.fill(512)(-1)
    var b = 0
    while (b < 256) { out(byteToChar(b).toInt) = b; b += 1 }
    out
  }

  def encode(bytes: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) { sb.append(byteToChar(bytes(i) & 0xff)); i += 1 }
    sb.toString
  }

  def decode(s: String): Array[Byte] = {
    val out = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      val b = if (s.charAt(i) < 512) charToByte(s.charAt(i).toInt) else -1
      require(b >= 0, s"char U+${s.charAt(i).toInt.toHexString} is not in the byte-coder image")
      out(i) = b.toByte
      i += 1
    }
    out
  }
}

/** Byte-level BPE vocabulary: the merge list operates on byte-mapped
  * symbols ([[ByteCoder]]), so every single mapped char is a base
  * symbol by construction — there is NO out-of-vocabulary input, and
  * `decode(encode(bytes)) == bytes` for arbitrary bytes (the GPT-2
  * property the code-point-level [[BpeVocab]] cannot give, since it
  * falls back to whole code points that a vocab id table would miss).
  * Delegates the merge machinery to [[BpeVocab]] — ranks, the LRU word
  * cache, and the greedy lowest-rank-first loop are identical. */
final class ByteBpeVocab(val merges: Array[(String, String)]) extends Serializable {
  val inner = new BpeVocab(merges)

  /** Tokens over the byte-mapped alphabet. */
  def encodeBytes(bytes: Array[Byte]): Array[String] =
    inner.encode(ByteCoder.encode(bytes))

  /** Tokens of a STRING's UTF-8 bytes (the Column path). */
  def encodeString(word: String): Array[String] =
    encodeBytes(word.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Inverse of [[encodeBytes]]: concatenate and unmap. */
  def decodeTokens(tokens: Seq[String]): Array[Byte] =
    ByteCoder.decode(tokens.mkString)
}

/** Byte-level sibling of [[BpeEncodeWords]]: each word's UTF-8 bytes map
  * through [[ByteCoder]] and subword-split; tokens from consecutive
  * words concatenate in order. Same codegen shape — one static call per
  * row, vocab as a task-serialized reference object. */
case class ByteBpeEncodeWords(child: Expression, vocab: ByteBpeVocab)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_byte_bpe_encode"

  override protected def nullSafeEval(input: Any): Any =
    ByteBpeEncodeWords.compute(input.asInstanceOf[ArrayData], vocab)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val v = ctx.addReferenceObj("byteBpeVocab", vocab, "graft.functions.ByteBpeVocab")
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.ByteBpeEncodeWords.compute($in, $v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ByteBpeEncodeWords {
  def compute(words: ArrayData, vocab: ByteBpeVocab): ArrayData = {
    val n = words.numElements()
    val out = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
    var i = 0
    while (i < n) {
      if (!words.isNullAt(i)) {
        // UTF8String.getBytes IS the string's UTF-8 — no transcode hop
        val toks = vocab.encodeBytes(words.getUTF8String(i).getBytes)
        var j = 0
        while (j < toks.length) {
          out += UTF8String.fromString(toks(j))
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  def apply(words: Column, vocab: ByteBpeVocab): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      ByteBpeEncodeWords(org.apache.spark.sql.GraftColumnBridge.expression(words), vocab))
}
