package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** A trained WordPiece tokenizer vocabulary (Schuster & Nakajima 2012;
  * the BERT tokenizer, Devlin et al. 2019 §4, and the published
  * `tokenization.py` WordpieceTokenizer semantics): a SET of tokens
  * where word-initial pieces appear bare and word-internal pieces carry
  * the `##` continuation prefix. A word encodes by GREEDY
  * LONGEST-MATCH-FIRST left-to-right; if at any position no prefix (of
  * any length ≥ 1) is in the vocabulary, the WHOLE word emits as the
  * single unknown token — WordPiece is deliberately lossy on
  * out-of-alphabet input, unlike [[BpeVocab]]/[[UnigramVocab]] (that
  * fidelity is the point of having all three models behind one seam).
  *
  * Same deployment shape as [[UnigramVocab]]: rides into generated code
  * as ONE reference object (`ctx.addReferenceObj`, serialized once per
  * task) with a per-thread `@transient` LRU word cache — natural text
  * re-uses a small working set of words, so most rows encode via hash
  * lookups, not match scans.
  *
  * The matcher is O(maxTokenCp) per emitted token: at position i it
  * probes candidate lengths from `min(remaining, maxTokenCp)` DOWN to 1
  * (longest-first), so pathological quadratic scans are bounded by the
  * longest token actually in the vocabulary.
  */
final class WordPieceVocab(val tokens: Array[String],
                           val unkToken: String) extends Serializable {

  /** max token length in code points (continuation `##` excluded) —
    * bounds the longest-match scan */
  val maxTokenCp: Int = {
    var m = 1
    var i = 0
    while (i < tokens.length) {
      val t = tokens(i)
      val body = if (t.startsWith("##")) t.substring(2) else t
      val cp = body.codePointCount(0, body.length)
      if (cp > m) m = cp
      i += 1
    }
    m
  }

  private val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](tokens.length * 2)
    var i = 0
    while (i < tokens.length) { s.add(tokens(i)); i += 1 }
    s
  }

  def contains(tok: String): Boolean = set.contains(tok)

  private val CacheCap = 8192

  @transient private lazy val cache
      : ThreadLocal[java.util.LinkedHashMap[String, Array[String]]] =
    ThreadLocal.withInitial { () =>
      new java.util.LinkedHashMap[String, Array[String]](1024, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, Array[String]]): Boolean =
          size() > CacheCap
      }
    }

  def encode(word: String): Array[String] = {
    if (word.isEmpty) return Array.empty
    val c = cache.get()
    val hit = c.get(word)
    if (hit != null) return hit
    val out = greedy(word)
    c.put(word, out)
    out
  }

  /** Greedy longest-match-first over code-point boundaries
    * (surrogate-safe). Word-internal candidates probe with the `##`
    * prefix. No match at any position → the whole word is `unkToken`
    * (published WordPiece behavior — not per-character fallback). */
  private def greedy(word: String): Array[String] = {
    val bounds = {
      val b = scala.collection.mutable.ArrayBuffer.empty[Int]
      var i = 0
      b += 0
      while (i < word.length) {
        i += Character.charCount(word.codePointAt(i))
        b += i
      }
      b.toArray
    }
    val n = bounds.length - 1
    val toks = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < n) {
      var j = math.min(n, i + maxTokenCp)
      var matched: String = null
      while (matched == null && j > i) {
        val cand0 = word.substring(bounds(i), bounds(j))
        val cand = if (i > 0) "##" + cand0 else cand0
        if (set.contains(cand)) matched = cand
        else j -= 1
      }
      if (matched == null) return Array(unkToken)
      toks += matched
      i = j
    }
    toks.toArray
  }
}

/** WordPiece-encode a word array: each word expands to its greedy
  * longest-match segmentation, concatenated in order; unmatchable words
  * emit the unknown token. Null words are skipped (defensive — upstream
  * tokenizers never emit them). One static call per row from generated
  * code — stays inside WholeStageCodegen. Mirror of
  * [[UnigramEncodeWords]] for the WordPiece model. */
case class WordPieceEncodeWords(child: Expression, vocab: WordPieceVocab)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_wordpiece_encode"

  override protected def nullSafeEval(input: Any): Any =
    WordPieceEncodeWords.compute(input.asInstanceOf[ArrayData], vocab)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val v = ctx.addReferenceObj("wordPieceVocab", vocab, "graft.functions.WordPieceVocab")
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.WordPieceEncodeWords.compute($in, $v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordPieceEncodeWords {
  def compute(words: ArrayData, vocab: WordPieceVocab): ArrayData = {
    val n = words.numElements()
    val out = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
    var i = 0
    while (i < n) {
      if (!words.isNullAt(i)) {
        val toks = vocab.encode(words.getUTF8String(i).toString)
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

  def apply(words: org.apache.spark.sql.Column, vocab: WordPieceVocab): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      WordPieceEncodeWords(org.apache.spark.sql.GraftColumnBridge.expression(words), vocab))
}
