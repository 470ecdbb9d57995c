package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** POSITIONAL k-token span hashes of a token array: element i is
  * xxhash64 of tokens i..i+k-1 joined with single spaces (seed 42, the
  * engine-wide shingle seed). Unlike [[TrigramShingleHashes]] the output
  * is NOT deduplicated or sorted — position is the point: span i of the
  * result aligns with token i of the input, which is what substring-span
  * deduplication (Lee et al. 2022, "Deduplicating Training Data Makes
  * Language Models Better" — public recipe) needs to map a duplicated
  * span hash back to the token range it covers.
  *
  * Arrays shorter than k produce an EMPTY array (a short document has no
  * k-spans to dedup — distinct from the trigram contract, where the
  * whole text backstops as one shingle, because span dedup must never
  * delete a document merely for being short).
  *
  * Hash values are byte-identical to `xxhash64(concat_ws(" ", ...))`
  * over the same k tokens, so equal spans collide exactly like the SQL
  * formulation would. Work is O(tokens * k) per row with zero shuffle —
  * the per-window re-hash keeps the value compatible with composed SQL;
  * a Rabin-Karp rolling variant would be O(tokens) but engine-private.
  * One static call per row from generated code: stays inside
  * WholeStageCodegen, never CodegenFallback (a generator above a
  * CodegenFallback child re-evaluates it per OUTPUT row — measured ~20x).
  */
case class SpanHashes(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k >= 2, "span width k must be >= 2")
  // inputTypes left inferred: AbstractDataType is private[sql], invisible here
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_span_hashes"

  override protected def nullSafeEval(input: Any): Any =
    SpanHashes.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.SpanHashes.compute($in, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SpanHashes {
  private val Space = UTF8String.fromString(" ")
  private val Empty: ArrayData = new GenericArrayData(Array.emptyLongArray)

  /** Positional window hashes; length max(0, n-k+1). */
  def compute(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    if (n < k) return Empty
    def tok(i: Int): UTF8String = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
    val out = new Array[Long](n - k + 1)
    val win = new Array[UTF8String](k)
    var i = 0
    while (i <= n - k) {
      var j = 0
      while (j < k) { win(j) = tok(i + j); j += 1 }
      // concatWs skips null inputs — same semantics as SQL concat_ws
      val s = UTF8String.concatWs(Space, win: _*)
      out(i) = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(c: Column, k: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      SpanHashes(org.apache.spark.sql.GraftColumnBridge.expression(c), k))
}
