package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature sketch as ONE native expression: k simulated
  * permutations via seeded xxhash64 re-hashes of each element of a
  * 64-bit shingle-hash set; sig[i] = min over the set.
  *
  * The built-in formulations both lose: k `transform` lambdas are
  * CodegenFallback (and explode-amplified), and explode + k min-aggregates
  * costs a shuffle plus a 48-column codegen'd HashAggregate whose
  * generated class takes ~1s to compile. This is a narrow map —
  * no shuffle, no wide aggregate, one tight k x n loop per row. */
case class MinHashSignature(child: Expression, k: Int) extends UnaryExpression with ExpectsInputTypes {
  require(k > 0)
  // analysis-time type check: the SQL-registered graft_minhash_sig on a
  // non-array<bigint> input fails as AnalysisException, not a runtime cast
  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var i = 0
      while (i < k) {
        val v = XXH64.hashLong(h, i)
        if (v < out(i)) out(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val xxh = classOf[XXH64].getName
      s"""
         |long[] $out = new long[$k];
         |java.util.Arrays.fill($out, Long.MAX_VALUE);
         |for (int $j = 0; $j < $in.numElements(); $j++) {
         |  long $h = $in.getLong($j);
         |  for (int $i = 0; $i < $k; $i++) {
         |    long $v = $xxh.hashLong($h, (long) $i);
         |    if ($v < $out[$i]) $out[$i] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {
  def apply(c: Column, k: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      MinHashSignature(org.apache.spark.sql.GraftColumnBridge.expression(c), k))
}
