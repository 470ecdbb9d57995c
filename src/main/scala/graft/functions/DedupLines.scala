package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Keep the first occurrence of each line of a document, dropping exact
  * repeats — the intra-document boilerplate collapser (repeated nav
  * bars, footers, cookie banners inside one page). Lines split on '\n'
  * only (real-world docs are already newline-normalized upstream);
  * comparison is exact bytes AFTER trimming trailing '\r' (CRLF and LF
  * copies of the same line are the same line). Blank lines (empty or
  * spaces-only after the '\r' trim) are structural — paragraph
  * separators, never deduplicated — matching
  * [[graft.operators.Dedup.stripBoilerplateLines]]'s stance (which
  * likewise exempts `trim(line) = ''`). Order of survivors is the
  * original order; the output joins with '\n'.
  *
  * One narrow codegen'd pass with a per-row HashSet sized to the line
  * count — no explode, no window, no shuffle. */
case class DedupLines(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_dedup_lines"

  override protected def nullSafeEval(input: Any): Any =
    DedupLines.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.DedupLines.compute($in);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DedupLines {
  def compute(text: UTF8String): UTF8String = {
    val s = text.toString
    if (s.isEmpty) return text
    val lines = s.split("\n", -1)
    val seen = new java.util.HashSet[String](lines.length * 2)
    val out = new java.lang.StringBuilder(s.length)
    var first = true
    var i = 0
    while (i < lines.length) {
      val line = if (lines(i).endsWith("\r")) lines(i).dropRight(1) else lines(i)
      // spaces-only = structural blank (same key rule as
      // stripBoilerplateLines's Spark trim, which strips ' ' only)
      var blank = true
      var j = 0
      while (blank && j < line.length) { blank = line.charAt(j) == ' '; j += 1 }
      if (blank || seen.add(line)) {
        if (!first) out.append('\n')
        out.append(line)
        first = false
      }
      i += 1
    }
    UTF8String.fromString(out.toString)
  }

  def apply(text: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      DedupLines(org.apache.spark.sql.GraftColumnBridge.expression(text)))
}
