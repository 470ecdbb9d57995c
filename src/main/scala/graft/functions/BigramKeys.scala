package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Vocabulary for n-gram language modeling: the top-`maxVocab` token
  * set; everything else maps to `&lt;unk&gt;` (the standard
  * closed-vocabulary trick that bounds LM table size regardless of
  * corpus size — the knob that keeps a 100 TB corpus's bigram table
  * joinable). Rides into generated code as one reference object. */
final class LmVocab(val tokens: Array[String]) extends Serializable {
  @transient private lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](tokens.length * 2)
    tokens.foreach(s.add)
    s
  }
  def map(t: String): String = if (set.contains(t)) t else LmVocab.Unk
  def size: Int = tokens.length
}

object LmVocab {
  val Unk = "<unk>"
  val Bos = "<s>"
}

/** Per-row bigram keys of a token array under a closed vocabulary:
  * token i emits `"prev cur"` where prev is `&lt;s&gt;` at i=0 and each
  * side is vocab-mapped (OOV -> `&lt;unk&gt;`; the BOS marker is its own
  * symbol, never mapped). Tokens come from whitespace splitting so they
  * cannot contain the `' '` separator — keys cannot alias.
  *
  * One narrow codegen pass replacing posexplode + window-lag + two
  * vocab joins (BENCH_NOTES #7: per-row array-building expressions
  * beat explode pipelines — this keeps the token stream narrow until
  * the single LM-count shuffle). */
case class BigramKeys(child: Expression, vocab: LmVocab)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bigram_keys"

  override protected def nullSafeEval(input: Any): Any =
    BigramKeys.compute(input.asInstanceOf[ArrayData], vocab)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val v = ctx.addReferenceObj("lmVocab", vocab, "graft.functions.LmVocab")
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.BigramKeys.compute($in, $v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BigramKeys {
  def compute(toks: ArrayData, vocab: LmVocab): ArrayData = {
    val n = toks.numElements()
    val out = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
    var prev = LmVocab.Bos
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val raw = toks.getUTF8String(i).toString
        if (raw.nonEmpty) {
          val cur = vocab.map(raw)
          out += UTF8String.fromString(prev + " " + cur)
          prev = cur
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  def apply(toks: Column, vocab: LmVocab): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      BigramKeys(org.apache.spark.sql.GraftColumnBridge.expression(toks), vocab))
}
