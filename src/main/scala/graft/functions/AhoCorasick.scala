package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-literal automaton (Aho & Corasick 1975) — the
  * gazetteer SCALE path: one pass over the text finds hits from a
  * dictionary of any size, where the regex-alternation form
  * ([[graft.operators.TextAnalysis.NameRe]]) costs a scan whose inner
  * loop grows with the dictionary. At 10⁴–10⁵ names (a real locale
  * gazetteer) the alternation is untenable; the automaton's per-char
  * work stays O(1) amortized.
  *
  * The automaton is built ONCE on the driver and rides the plan as a
  * referenced object (the CentroidDots/TrigramLangId pattern); the
  * generated code calls the same scan the interpreted path uses, so
  * codegen and interpreted agree by construction. */
object AcAutomaton {
  /** Prefix-freedom check, automaton-free so expressions can validate
    * EAGERLY at construction (a sort + adjacent startsWith — O(n log n)
    * over a driver-bounded dictionary). */
  def prefixFree(patterns: Seq[String]): Boolean = {
    val sorted = patterns.distinct.sorted
    !sorted.sliding(2).exists(w => w.length == 2 && w(1).startsWith(w(0)))
  }
}

final class AcAutomaton(val patterns: Array[String]) extends Serializable {
  require(patterns.nonEmpty, "need at least one pattern")
  require(patterns.forall(_.nonEmpty), "patterns must be non-empty")

  // trie: children as per-node char->state maps (built once; lookups in
  // the scan go through a flat sorted array pair per node for cache-
  // friendly binary search). Outputs keep EVERY pattern length ending at
  // a state (descending), not only the longest: a boundary check can
  // legitimately reject the longest candidate while a shorter suffix
  // pattern ending at the same position satisfies it ({"free software",
  // "software"} on "unfree software" — the regex counts "software"), so
  // the scan must be able to fall through candidate lengths.
  private val (childKeys, childVals, fail, outLens) = {
    import scala.collection.mutable
    val kids = mutable.ArrayBuffer(mutable.TreeMap.empty[Char, Int])
    val own = mutable.ArrayBuffer(0) // the pattern length terminal at this node (its depth), else 0
    patterns.foreach { p =>
      var s = 0
      p.foreach { c =>
        s = kids(s).getOrElseUpdate(c, {
          kids += mutable.TreeMap.empty[Char, Int]
          own += 0
          kids.size - 1
        })
      }
      own(s) = p.length // equal-length duplicates collapse
    }
    val n = kids.size
    val f = Array.fill(n)(0)
    // all pattern lengths ending at each state, DESCENDING: the node's
    // own length (= its depth) followed by its fail state's list — every
    // fail-chain length is a proper suffix, hence strictly shorter, so
    // concatenation preserves the order with no sort. BFS order makes
    // the fail state's list complete before it is consumed.
    val outs = Array.fill[Array[Int]](n)(Array.emptyIntArray)
    val q = mutable.Queue.empty[Int]
    kids(0).foreach { case (_, s) => q.enqueue(s) }
    while (q.nonEmpty) {
      val u = q.dequeue()
      val inherited = outs(f(u))
      outs(u) =
        if (own(u) > 0) {
          val a = new Array[Int](inherited.length + 1)
          a(0) = own(u)
          System.arraycopy(inherited, 0, a, 1, inherited.length)
          a
        } else inherited
      kids(u).foreach { case (c, v) =>
        var fs = f(u)
        while (fs != 0 && !kids(fs).contains(c)) fs = f(fs)
        f(v) = kids(fs).get(c).filter(_ != v).getOrElse(0)
        q.enqueue(v)
      }
    }
    (kids.map(_.keysIterator.toArray).toArray,
      kids.map(_.valuesIterator.toArray).toArray, f, outs)
  }

  /** Whether any pattern is a PROPER prefix of another — the name-rule
    * equivalence proof ([[AcGazetteerNameCount]]) requires prefix-free
    * dictionaries (two same-start candidates would make leftmost-match
    * order observable). */
  val prefixFree: Boolean =
    AcAutomaton.prefixFree(scala.collection.immutable.ArraySeq.unsafeWrapArray(patterns))

  @inline private def step(state0: Int, c: Char): Int = {
    var state = state0
    while (true) {
      val ks = childKeys(state)
      val i = java.util.Arrays.binarySearch(ks, c)
      if (i >= 0) return childVals(state)(i)
      if (state == 0) return 0
      state = fail(state)
    }
    0
  }

  @inline private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'

  /** Count of non-overlapping, word-boundary-delimited dictionary hits
    * (leftmost semantics: after a hit the scan resumes past it —
    * `regexp_count(text, "\b(p1|...|pk)\b")`). Every candidate length
    * ending at a position is boundary-tested longest-first: the right
    * boundary is shared (same end), the left varies per length, and the
    * regex counts one match per end position whichever alternative
    * satisfies its boundaries — so the first passing candidate counts
    * and the scan resumes past the match end. */
  def countWholeWords(text: String): Int = {
    var n = 0
    var state = 0
    var i = 0
    while (i < text.length) {
      state = step(state, text.charAt(i))
      val lens = outLens(state)
      if (lens.length > 0) {
        val okR = i == text.length - 1 || !isWordChar(text.charAt(i + 1))
        if (okR) {
          var k = 0
          var hit = false
          while (!hit && k < lens.length) {
            val start = i - lens(k) + 1
            if (start == 0 || !isWordChar(text.charAt(start - 1))) hit = true
            else k += 1
          }
          if (hit) { n += 1; state = 0 }
        }
      }
      i += 1
    }
    n
  }

  /** The structural person-name rule, automaton form: a word-boundary
    * gazetteer hit followed by " Surname" ([A-Z][a-z]+ then a word
    * boundary). EXACTLY the [[graft.operators.TextAnalysis.NameRe]]
    * regex semantics on a prefix-free dictionary (spec-pinned equal on
    * randomized text): on a full match the scan resumes after the
    * surname (regex `find()` consumption); on a failed tail it
    * continues in-place (the regex finds no other same-start
    * alternative — prefix-freedom). */
  def countNames(text: String): Int = {
    var n = 0
    var state = 0
    var i = 0
    while (i < text.length) {
      state = step(state, text.charAt(i))
      val lens = outLens(state)
      var advanced = false
      if (lens.length > 0) {
        // the surname tail depends only on the shared end position, so
        // test it once; the left boundary varies per candidate length —
        // any passing candidate yields the same counted match span end
        if (i + 2 < text.length && text.charAt(i + 1) == ' ') {
          val c2 = text.charAt(i + 2)
          if (c2 >= 'A' && c2 <= 'Z') {
            var j = i + 3
            while (j < text.length && text.charAt(j) >= 'a' && text.charAt(j) <= 'z') j += 1
            val surnameLen = j - (i + 2)
            val okR = j == text.length || !isWordChar(text.charAt(j))
            if (surnameLen >= 2 && okR) {
              var k = 0
              var okL = false
              while (!okL && k < lens.length) {
                val start = i - lens(k) + 1
                if (start == 0 || !isWordChar(text.charAt(start - 1))) okL = true
                else k += 1
              }
              if (okL) {
                n += 1
                state = 0
                i = j // resume after the full match (for-loop ++ lands at j)
                advanced = true
              }
            }
          }
        }
      }
      if (!advanced) i += 1
    }
    n
  }
}

/** Count of gazetteer-name + capitalized-surname matches — the
  * automaton twin of `regexp_count(text, NameRe)`. Null-in-null-out;
  * interpreted and generated paths share one scan. */
case class AcGazetteerNameCount(child: Expression, names: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {
  require(names.nonEmpty, "gazetteer must be non-empty")
  // validated EAGERLY in the body (not inside the lazy automaton): an
  // invalid gazetteer must fail at plan construction with this message,
  // not as a mid-job task failure the first time a partition evaluates.
  // Memoized by Seq IDENTITY: Catalyst rebuilds this node on every
  // transformUp/withNewChildren during analysis+optimization, but every
  // copy shares the SAME names instance — the O(n log n) distinct+sort
  // runs once per gazetteer object, each copy pays one reference lookup
  require(AcGazetteerNameCount.prefixFreeCached(names),
    "gazetteer must be prefix-free for regex-equivalent name counting " +
      "(a name that prefixes another makes match order observable)")

  @transient lazy val automaton: AcAutomaton = new AcAutomaton(names.toArray)

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_ac_name_count"

  override protected def nullSafeEval(input: Any): Any =
    automaton.countNames(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[AcAutomaton].getName)
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = $acRef.countNames($in.toString());")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AcGazetteerNameCount {
  // identity-keyed (not equals-keyed): a hit is one reference compare,
  // never an O(n) Seq hash. Bounded: gazetteers are process-lifetime
  // dictionary objects — the clear() path exists only as a leak guard
  // against pathological per-row Seq construction.
  private val validated = java.util.Collections.synchronizedMap(
    new java.util.IdentityHashMap[Seq[String], java.lang.Boolean]())
  private[functions] def prefixFreeCached(names: Seq[String]): Boolean = {
    if (validated.size > 1024) validated.clear()
    validated.computeIfAbsent(names, n => AcAutomaton.prefixFree(n))
  }
}

/** Count of non-overlapping whole-word dictionary hits — the automaton
  * form of `regexp_count(text, "\b(p1|...|pk)\b")` for blocklists,
  * decontamination seed phrases, keyword audits. */
case class AcWholeWordCount(child: Expression, dict: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {
  require(dict.nonEmpty, "dictionary must be non-empty")

  @transient lazy val automaton: AcAutomaton = new AcAutomaton(dict.toArray)

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_ac_word_count"

  override protected def nullSafeEval(input: Any): Any =
    automaton.countWholeWords(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[AcAutomaton].getName)
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = $acRef.countWholeWords($in.toString());")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
