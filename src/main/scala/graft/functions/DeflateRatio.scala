package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** zlib-deflate compression ratio of a string's UTF-8 bytes
  * (compressed/original, rounded to 4 decimals; empty input -> 1.0) —
  * the classic machine-generated/boilerplate detector from web-curation
  * pipelines (RefinedWeb/MassiveText use exactly this signal, public
  * recipe): templated or repetitive documents compress far below
  * natural prose, and unlike n-gram rules the signal catches LONG-range
  * repetition in one pass. Complements [[TopBigramFraction]] (local
  * repetition) and the dup-line rule (exact line repeats).
  *
  * One `Deflater` per thread (thread-local, `reset()` per row) — the
  * object allocates native zlib state, so per-row construction would
  * dominate; BEST_SPEED level because the signal needs relative ratio,
  * not optimal compression. Null-in-null-out.
  *
  * KNOWN HOLD: the thread-local Deflater is never `end()`'d, so each
  * executor thread that ever evaluates this expression retains one
  * native zlib state (~256 KB) for the thread's lifetime. Bounded by
  * the task-thread pool size on Spark executors (fixed pools, threads
  * live for the executor's life anyway); only a concern for embedders
  * running this expression on large CHURNING thread pools, who should
  * evaluate it from a bounded pool instead. */
case class DeflateRatio(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_deflate_ratio"

  override protected def nullSafeEval(input: Any): Any =
    DeflateRatio.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.DeflateRatio.compute($in);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeflateRatio {
  private val deflaters = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED, true)
  }

  def compute(s: UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.length == 0) return 1.0
    val d = deflaters.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var compressed = 0L
    while (!d.finished()) compressed += d.deflate(buf)
    math.rint(compressed.toDouble / bytes.length * 10000) / 10000
  }

  def apply(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      DeflateRatio(org.apache.spark.sql.GraftColumnBridge.expression(c)))
}
