package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Porter stemming (Porter 1980, "An algorithm for suffix stripping") as
  * a codegen'd scalar — conflates inflected English forms
  * ("relational"/"relations"/"relate" → "relat") so token statistics,
  * TF-IDF/BM25 postings, and vocabulary reports aggregate word families
  * instead of surface forms. Implements the algorithm's five steps over
  * the measure/condition framework (m, *v*, *d, *o) with the two
  * standard departures the published reference vocabulary reflects
  * (bli→ble in step 2, logi→log).
  *
  * ASCII-lowercase input is assumed (the tokenizer lowercases upstream);
  * non-ASCII-letter content and words of length ≤ 2 pass through
  * unchanged, so the expression is safe directly over multilingual token
  * streams — only English-alphabet words are transformed.
  * Null-in-null-out; per-row, allocation-light, whole-stage friendly. */
case class PorterStem(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_porter_stem"

  override protected def nullSafeEval(input: Any): Any =
    PorterStem.stemUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.PorterStem.stemUtf8($in);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PorterStem {

  def stemUtf8(s: UTF8String): UTF8String = {
    val str = s.toString
    val out = stem(str)
    if (out eq str) s else UTF8String.fromString(out)
  }

  /** Stem one word. Returns the input reference unchanged when no rule
    * applies (length ≤ 2 or non a-z content). */
  def stem(word: String): String = {
    if (word.length <= 2) return word
    // real English words are far below this; beyond it stemming is
    // meaningless and the per-char 'y' classification (which recurses
    // left through y-runs) must stay bounded on adversarial tokens
    if (word.length > 64) return word
    var i = 0
    while (i < word.length) {
      val c = word.charAt(i)
      if (c < 'a' || c > 'z') return word
      i += 1
    }
    val st = new Stemmer(word.toCharArray)
    st.run()
    val out = new String(st.b, 0, st.k + 1)
    if (out == word) word else out
  }

  /** Mutable working state: `b[0..k]` is the current word, `j` the stem
    * end set by the latest suffix match. Direct port of the published
    * step structure. */
  private final class Stemmer(val b: Array[Char]) {
    var k: Int = b.length - 1
    var j: Int = 0

    private def cons(i: Int): Boolean = b(i) match {
      case 'a' | 'e' | 'i' | 'o' | 'u' => false
      case 'y' => if (i == 0) true else !cons(i - 1)
      case _ => true
    }

    /** m(): number of VC sequences in b[0..j]. */
    private def m(): Int = {
      var n = 0
      var i = 0
      while (true) {
        if (i > j) return n
        if (!cons(i)) {
          // found leading vowel; now alternate
          i += 1
          while (true) {
            while (i <= j && !cons(i)) i += 1
            if (i > j) return n
            n += 1
            while (i <= j && cons(i)) i += 1
            if (i > j) return n
          }
        }
        i += 1
      }
      n
    }

    private def vowelInStem(): Boolean = {
      var i = 0
      while (i <= j) { if (!cons(i)) return true; i += 1 }
      false
    }

    private def doublec(i: Int): Boolean =
      i >= 1 && b(i) == b(i - 1) && cons(i)

    /** *o: stem ends cvc where the final c is not w, x or y. */
    private def cvc(i: Int): Boolean = {
      if (i < 2 || !cons(i) || cons(i - 1) || !cons(i - 2)) return false
      val ch = b(i)
      ch != 'w' && ch != 'x' && ch != 'y'
    }

    private def ends(s: String): Boolean = {
      val l = s.length
      if (l > k + 1) return false
      var i = 0
      while (i < l) {
        if (b(k - l + 1 + i) != s.charAt(i)) return false
        i += 1
      }
      j = k - l
      true
    }

    private def setto(s: String): Unit = {
      var i = 0
      while (i < s.length) { b(j + 1 + i) = s.charAt(i); i += 1 }
      k = j + s.length
    }

    private def r(s: String): Unit = if (m() > 0) setto(s)

    private def step1ab(): Unit = {
      if (b(k) == 's') {
        if (ends("sses")) k -= 2
        else if (ends("ies")) setto("i")
        else if (b(k - 1) != 's') k -= 1
      }
      if (ends("eed")) { if (m() > 0) k -= 1 }
      else if ((ends("ed") || ends("ing")) && vowelInStem()) {
        k = j
        if (ends("at")) setto("ate")
        else if (ends("bl")) setto("ble")
        else if (ends("iz")) setto("ize")
        else if (doublec(k)) {
          k -= 1
          val ch = b(k)
          if (ch == 'l' || ch == 's' || ch == 'z') k += 1
        } else if (m() == 1 && cvc(k)) setto("e")
      }
    }

    private def step1c(): Unit =
      if (ends("y") && vowelInStem()) b(k) = 'i'

    private def step2(): Unit = {
      if (k < 1) return
      b(k - 1) match {
        case 'a' =>
          if (ends("ational")) r("ate")
          else if (ends("tional")) r("tion")
        case 'c' =>
          if (ends("enci")) r("ence")
          else if (ends("anci")) r("ance")
        case 'e' =>
          if (ends("izer")) r("ize")
        case 'l' =>
          if (ends("bli")) r("ble") // departure: paper has abli→able
          else if (ends("alli")) r("al")
          else if (ends("entli")) r("ent")
          else if (ends("eli")) r("e")
          else if (ends("ousli")) r("ous")
        case 'o' =>
          if (ends("ization")) r("ize")
          else if (ends("ation")) r("ate")
          else if (ends("ator")) r("ate")
        case 's' =>
          if (ends("alism")) r("al")
          else if (ends("iveness")) r("ive")
          else if (ends("fulness")) r("ful")
          else if (ends("ousness")) r("ous")
        case 't' =>
          if (ends("aliti")) r("al")
          else if (ends("iviti")) r("ive")
          else if (ends("biliti")) r("ble")
        case 'g' =>
          if (ends("logi")) r("log") // departure, per the reference vocabulary
        case _ =>
      }
    }

    private def step3(): Unit = b(k) match {
      case 'e' =>
        if (ends("icate")) r("ic")
        else if (ends("ative")) r("")
        else if (ends("alize")) r("al")
      case 'i' =>
        if (ends("iciti")) r("ic")
      case 'l' =>
        if (ends("ical")) r("ic")
        else if (ends("ful")) r("")
      case 's' =>
        if (ends("ness")) r("")
      case _ =>
    }

    private def step4(): Unit = {
      if (k < 1) return
      val matched = b(k - 1) match {
        case 'a' => ends("al")
        case 'c' => ends("ance") || ends("ence")
        case 'e' => ends("er")
        case 'i' => ends("ic")
        case 'l' => ends("able") || ends("ible")
        case 'n' => ends("ant") || ends("ement") || ends("ment") || ends("ent")
        case 'o' => (ends("ion") && j >= 0 && (b(j) == 's' || b(j) == 't')) || ends("ou")
        case 's' => ends("ism")
        case 't' => ends("ate") || ends("iti")
        case 'u' => ends("ous")
        case 'v' => ends("ive")
        case 'z' => ends("ize")
        case _ => false
      }
      if (matched && m() > 1) k = j
    }

    private def step5(): Unit = {
      j = k
      if (b(k) == 'e') {
        val a = m()
        if (a > 1 || (a == 1 && !cvc(k - 1))) k -= 1
      }
      if (b(k) == 'l' && doublec(k) && m() > 1) k -= 1
    }

    def run(): Unit = {
      step1ab(); step1c(); step2(); step3(); step4(); step5()
    }
  }

  def apply(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      PorterStem(org.apache.spark.sql.GraftColumnBridge.expression(c)))
}
