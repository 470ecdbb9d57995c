package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Trained character-trigram language profiles for the Cavnar–Trenkle
  * (1994) rank-order classifier — the published n-gram text-categorization
  * method every practical language identifier descends from. The model is
  * DELIBERATELY all-integer: a document's trigram profile (its top
  * `docTopK` trigrams by count desc, trigram asc) is compared to each
  * language's ranked profile by summed rank displacement, out-of-profile
  * trigrams costing `penalty`. No floats anywhere, so an SQL twin
  * recomputes the prediction bit-exactly — the property the oracle gate
  * stands on (a log-likelihood formulation would put the argmax one FP
  * ulp from flipping cross-engine).
  *
  * `langs` is sorted ascending and ties break to the FIRST entry, so
  * prediction is deterministic for any input, including the empty
  * profile (all distances 0 → first language).
  *
  * Bounded by construction: `langs.length × topK` short strings ride to
  * executors as one reference object — never corpus text. */
final class TrigramLangRanks(val langs: Array[String],
                             val ranks: Array[java.util.HashMap[String, Integer]],
                             val penalty: Int,
                             val docTopK: Int) extends Serializable {
  require(langs.length == ranks.length, "one rank table per language")
  require(langs.sorted.sameElements(langs), "langs must be sorted (tie-break order)")
}

/** Predicted language of an (already-lowercased) text column under a
  * [[TrigramLangRanks]] model. Narrow, zero-shuffle, one static call per
  * row from generated code — the langid of 100 TB is a map-only scan. */
case class TrigramLangId(child: Expression, model: TrigramLangRanks)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_langid_trigram"

  override protected def nullSafeEval(input: Any): Any =
    TrigramLangId.compute(input.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("langRanks", model, "graft.functions.TrigramLangRanks")
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.TrigramLangId.compute($in, $m);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Character trigrams of an (already-lowercased) string as one linear
  * walk — the training-side extraction. The HOF formulation this
  * replaced (`transform(sequence(1, len-2), i => substr(i, 3))`) was
  * QUADRATIC per document: UTF8String substring seeks codepoints from
  * the start on every call, and it measured 7.5 s for txt_langid at
  * sf0.1 where this walk takes a fraction of that. Windows are
  * Java-char-based, IDENTICAL to [[TrigramLangId.compute]]'s scoring
  * windows — training and scoring can never disagree on a boundary,
  * astral planes included. */
case class CharTrigrams(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_char_trigrams"

  override protected def nullSafeEval(input: Any): Any =
    CharTrigrams.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.CharTrigrams.compute($in);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharTrigrams {
  def compute(text: UTF8String): GenericArrayData = {
    val s = text.toString
    val n = math.max(s.length - 2, 0)
    val out = new Array[AnyRef](n)
    var i = 0
    while (i < n) {
      out(i) = UTF8String.fromString(s.substring(i, i + 3))
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(text: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      CharTrigrams(org.apache.spark.sql.GraftColumnBridge.expression(text)))
}

object TrigramLangId {
  def compute(text: UTF8String, model: TrigramLangRanks): UTF8String = {
    val s = text.toString
    // doc trigram counts (consecutive 3-char windows, 1 step). Scoring
    // and engine-side TRAINING both window over Java chars (training
    // uses CharTrigrams), so engine train/score never diverge; only the
    // DuckDB retrain twin windows over codepoints, so astral-plane text
    // (outside every fixture and most corpora) could shift a TWIN window
    // boundary — an oracle-side caveat, not an engine one.
    val counts = new java.util.HashMap[String, Integer]()
    var i = 0
    while (i + 3 <= s.length) {
      val t = s.substring(i, i + 3)
      val c = counts.get(t)
      counts.put(t, if (c == null) 1 else c + 1)
      i += 1
    }
    // doc profile: top docTopK by (count desc, trigram asc), 1-based rank
    // — the same row_number() the SQL twin computes
    val entries = new java.util.ArrayList[java.util.Map.Entry[String, Integer]](counts.entrySet())
    entries.sort { (a, b) =>
      val c = Integer.compare(b.getValue, a.getValue)
      if (c != 0) c else a.getKey.compareTo(b.getKey)
    }
    val profLen = math.min(model.docTopK, entries.size())
    // rank displacement per language; argmin, ties to first (sorted) lang
    var bestLang = 0
    var bestDist = Long.MaxValue
    var l = 0
    while (l < model.langs.length) {
      val table = model.ranks(l)
      var dist = 0L
      var p = 0
      while (p < profLen) {
        val rk = table.get(entries.get(p).getKey)
        dist += (if (rk == null) model.penalty.toLong else math.abs((p + 1).toLong - rk.toLong))
        p += 1
      }
      if (dist < bestDist) { bestDist = dist; bestLang = l }
      l += 1
    }
    UTF8String.fromString(model.langs(bestLang))
  }

  def apply(text: Column, model: TrigramLangRanks): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      TrigramLangId(org.apache.spark.sql.GraftColumnBridge.expression(text), model))
}
