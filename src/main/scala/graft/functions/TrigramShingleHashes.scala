package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DISTINCT word-trigram shingle hashes of a token array as ONE native
  * expression: sorted array of xxhash64("t0 t1 t2", seed 42) over each
  * consecutive trigram; arrays shorter than 3 tokens hash their whole
  * space-joined text (the [[graft.operators.Dedup.shingles3]] contract).
  *
  * Hash values are BYTE-IDENTICAL to
  * `xxhash64(concat_ws(" ", t0, t1, t2))` (UTF8String.concatWs + XXH64
  * seed 42, null tokens skipped like concat_ws), so swapping this in for
  * the explode+window formulation changes no downstream result — MinHash
  * signatures, LSH band keys, and posting joins see the same longs.
  *
  * Why it exists: the composable formulation of "per-doc trigram
  * postings" (posexplode -> window lead(1)/lead(2) over (id, pos) ->
  * hash -> distinct) costs a full shuffle + sort of every POSTING plus a
  * distinct exchange, just to pair each token with its two successors.
  * That pairing is a per-ROW loop — this expression does it in one
  * narrow pass, so the entire posting stage of
  * [[graft.operators.Dedup]] / [[graft.operators.Decontaminate]] becomes
  * shuffle-free. Work and memory are O(tokens) per row. */
case class TrigramShingleHashes(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_trigram_hashes"

  override protected def nullSafeEval(input: Any): Any =
    TrigramShingleHashes.compute(input.asInstanceOf[ArrayData])

  // one static call per row from generated code: stays inside
  // WholeStageCodegen (not CodegenFallback), no expression-tree
  // interpretation in the hot loop
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.TrigramShingleHashes.compute($in);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TrigramShingleHashes {
  private val Space = UTF8String.fromString(" ")

  private def hashOf(parts: Array[UTF8String]): Long = {
    // concatWs skips null inputs — same semantics as SQL concat_ws
    val s = UTF8String.concatWs(Space, parts: _*)
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
  }

  /** Sorted distinct trigram hashes (whole-text hash when <3 tokens). */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    def tok(i: Int): UTF8String = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
    if (n < 3) {
      val all = new Array[UTF8String](n)
      var i = 0
      while (i < n) { all(i) = tok(i); i += 1 }
      return new GenericArrayData(Array(hashOf(all)))
    }
    val out = new Array[Long](n - 2)
    var i = 0
    while (i < n - 2) {
      out(i) = hashOf(Array(tok(i), tok(i + 1), tok(i + 2)))
      i += 1
    }
    java.util.Arrays.sort(out)
    // in-place unique
    var w = 1
    var r = 1
    while (r < out.length) {
      if (out(r) != out(w - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }

  def apply(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      TrigramShingleHashes(org.apache.spark.sql.GraftColumnBridge.expression(c)))
}
