package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** A trained unigram-LM tokenizer vocabulary (Kudo 2018, "Subword
  * Regularization" — the SentencePiece unigram model): each token
  * carries a log-probability, and a word encodes as the segmentation
  * maximizing the sum of token log-probs, found by Viterbi over the
  * word's substring lattice.
  *
  * Same deployment shape as [[BpeVocab]]: rides into generated code as
  * ONE reference object (`ctx.addReferenceObj`, serialized once per
  * task) with a per-thread `@transient` LRU word cache — natural text
  * re-uses a small working set of words, so most rows encode via hash
  * lookups, not lattice walks.
  *
  * Coverage is total: a code point absent from the vocab scores
  * `unkLogProb` (below every real token) but still emits as its own
  * single-character token, so concatenating a word's tokens ALWAYS
  * reproduces the word — lossless round-trip is structural, not
  * probabilistic.
  *
  * Viterbi ties break toward the LONGER token ending at the position
  * (i.e. the smaller start index wins on equal score) — deterministic
  * for a given vocab, and biased the way users expect (prefer whole
  * pieces over fragment chains when the model is indifferent).
  */
final class UnigramVocab(val tokens: Array[(String, Double)],
                         val unkLogProb: Double) extends Serializable {

  /** max token length in code points — bounds the Viterbi inner loop */
  val maxTokenCp: Int = {
    var m = 1
    var i = 0
    while (i < tokens.length) {
      val cp = tokens(i)._1.codePointCount(0, tokens(i)._1.length)
      if (cp > m) m = cp
      i += 1
    }
    m
  }

  private val logp: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](tokens.length * 2)
    var i = 0
    while (i < tokens.length) { m.put(tokens(i)._1, tokens(i)._2); i += 1 }
    m
  }

  def score(tok: String): Double = {
    val v = logp.get(tok)
    if (v == null) Double.NegativeInfinity else v.doubleValue()
  }

  def contains(tok: String): Boolean = logp.containsKey(tok)

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
    val out = viterbi(word)
    c.put(word, out)
    out
  }

  /** Viterbi over code-point boundaries: `best(i)` = max score of any
    * segmentation of the prefix ending at boundary i; candidates at i
    * are tokens `word[j..i)` for the last `maxTokenCp` boundaries j,
    * plus the single unknown code point when nothing matches. */
  private def viterbi(word: String): Array[String] = {
    // code-point boundary offsets into the string (surrogate-safe)
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
    val n = bounds.length - 1 // number of code points
    val best = new Array[Double](n + 1)
    val back = new Array[Int](n + 1) // back(i) = start boundary of last token
    java.util.Arrays.fill(best, Double.NegativeInfinity)
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      val jLo = math.max(0, i - maxTokenCp)
      var j = i - 1
      var found = false
      while (j >= jLo) {
        val sub = word.substring(bounds(j), bounds(i))
        val s = score(sub)
        if (s != Double.NegativeInfinity && best(j) != Double.NegativeInfinity) {
          val cand = best(j) + s
          found = true
          // on equal score the smaller start j (longer token) wins —
          // the explicit j comparison makes this scan-order-independent
          if (cand > best(i) || (cand == best(i) && j < back(i))) {
            best(i) = cand; back(i) = j
          }
        }
        j -= 1
      }
      if (!found || best(i) == Double.NegativeInfinity) {
        // unknown single code point: lossless fallback
        val cand = best(i - 1) + unkLogProb
        if (cand > best(i)) { best(i) = cand; back(i) = i - 1 }
      }
      i += 1
    }
    // walk back
    val toks = scala.collection.mutable.ArrayBuffer.empty[String]
    var at = n
    while (at > 0) {
      val j = back(at)
      toks += word.substring(bounds(j), bounds(at))
      at = j
    }
    toks.reverseIterator.toArray
  }
}

/** Unigram-encode a word array: each word expands to its Viterbi
  * segmentation, concatenated in order. Null words are skipped
  * (defensive — upstream tokenizers never emit them). One static call
  * per row from generated code — stays inside WholeStageCodegen.
  * Mirror of [[BpeEncodeWords]] for the unigram model. */
case class UnigramEncodeWords(child: Expression, vocab: UnigramVocab)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_unigram_encode"

  override protected def nullSafeEval(input: Any): Any =
    UnigramEncodeWords.compute(input.asInstanceOf[ArrayData], vocab)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val v = ctx.addReferenceObj("unigramVocab", vocab, "graft.functions.UnigramVocab")
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.UnigramEncodeWords.compute($in, $v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnigramEncodeWords {
  def compute(words: ArrayData, vocab: UnigramVocab): ArrayData = {
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

  def apply(words: org.apache.spark.sql.Column, vocab: UnigramVocab): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      UnigramEncodeWords(org.apache.spark.sql.GraftColumnBridge.expression(words), vocab))
}
