package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-bit SimHash of a token array as ONE native expression: each token
  * is xxhash64'd (seed 42 — identical to `functions.xxhash64`) and votes
  * its bits into 64 population counters; output bit i is set when the
  * multiset majority has bit i set (`2*count_i > n`).
  *
  * The built-in formulations both lose: a per-row `aggregate` lambda fold
  * is CodegenFallback, and explode + 64 `sum(shiftrightunsigned...)`
  * aggregate columns costs a full shuffle on the doc id plus a huge
  * generated HashAggregate class (~tens of seconds cold at sf0.1 —
  * measured as the dedup_simhash bench outlier). This is a narrow map:
  * no shuffle, no wide aggregate, one tight 64 x n loop per row.
  *
  * Null semantics: null-in-null-out (standard UnaryExpression null
  * propagation) — a null token ARRAY yields a null hash, distinct from
  * the empty array's all-zero-votes hash of 0L. Null ELEMENTS vote with
  * the seed, matching `xxhash64(null)`. Input is type-checked at
  * analysis (array<string>), so the SQL-registered `graft_simhash64`
  * raises AnalysisException on a wrong type instead of a runtime cast
  * error. */
case class SimHash64(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var j = 0
    while (j < n) {
      // null element hashes to the seed, matching xxhash64(null) = seed
      val h =
        if (arr.isNullAt(j)) 42L
        else {
          val s = arr.getUTF8String(j)
          XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        }
      var i = 0
      while (i < 64) { counts(i) += ((h >>> i) & 1L).toInt; i += 1 }
      j += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (counts(i) * 2 > n) out |= (1L << i); i += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val cnt = ctx.freshName("cnt")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val s = ctx.freshName("s")
      val xxh = classOf[XXH64].getName
      s"""
         |int[] $cnt = new int[64];
         |int $n = $in.numElements();
         |for (int $j = 0; $j < $n; $j++) {
         |  long $h;
         |  if ($in.isNullAt($j)) {
         |    $h = 42L;
         |  } else {
         |    org.apache.spark.unsafe.types.UTF8String $s = $in.getUTF8String($j);
         |    $h = $xxh.hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
         |  }
         |  for (int $i = 0; $i < 64; $i++) $cnt[$i] += (int) (($h >>> $i) & 1L);
         |}
         |${ev.value} = 0L;
         |for (int $i = 0; $i < 64; $i++) {
         |  if ($cnt[$i] * 2 > $n) ${ev.value} |= (1L << $i);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  def apply(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      SimHash64(org.apache.spark.sql.GraftColumnBridge.expression(c)))
}
