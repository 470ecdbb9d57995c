package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Product-quantization kernels (Jégou et al. 2011, "Product
  * Quantization for Nearest Neighbor Search" — public recipe) for the
  * IVF-PQ index in [[graft.operators.Ivf]].
  *
  * A d-dim residual is split into `m` sub-vectors of d/m dims; each is
  * quantized to one of `ks` (<= 256) codewords, so a corpus vector is
  * stored as `m` BYTES instead of d floats/doubles — the 100 TB memory
  * story (64-dim double vectors at m=8: 512 -> 8 bytes, 64x). Search
  * never decodes: a query precomputes the m x ks table of sub-vector dot
  * products ONCE ([[PqAdcLut]]) and each candidate scores with m table
  * lookups ([[PqLookupSum]]) — asymmetric distance computation.
  *
  * Codebooks/centroids ride into generated code as referenced objects
  * (`ctx.addReferenceObj`, serialized once per task), NOT as array
  * literals — a k x ks x dsub literal tree would blow past codegen
  * limits. All three kernels are single static calls from generated
  * code: inside WholeStageCodegen, never CodegenFallback.
  *
  * Flat layouts: `centroids[cell*d + t]` (coarse), and
  * `codebook[((j*ks) + c)*dsub + t]` for subspace j, code c.
  */
case class PqEncode(vec: Expression, cell: Expression, centroids: Array[Double],
                    codebook: Array[Double], m: Int, ks: Int) extends BinaryExpression {
  require(ks >= 1 && ks <= 256, "ks must fit one byte (1..256)")
  override def left: Expression = vec
  override def right: Expression = cell
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_pq_encode"

  override protected def nullSafeEval(v: Any, c: Any): Any =
    PqEncode.compute(v.asInstanceOf[ArrayData], c.asInstanceOf[Int], centroids, codebook, m, ks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("pqCentroids", centroids, "double[]")
    val cb = ctx.addReferenceObj("pqCodebook", codebook, "double[]")
    nullSafeCodeGen(ctx, ev, (v, c) =>
      s"${ev.value} = graft.functions.PqEncode.compute($v, $c, $cents, $cb, $m, $ks);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(vec = l, cell = r)
}

object PqEncode {
  /** Codes = per-subspace L2-argmin codeword of (vec - centroids[cell]).
    * O(d * ks) per row. Code c stored as its unsigned byte. */
  def compute(vec: ArrayData, cell: Int, centroids: Array[Double], codebook: Array[Double],
              m: Int, ks: Int): Array[Byte] = {
    // dimensions come from the TRAINED MODEL (codebook length), never the
    // incoming row: a ragged vector must not re-derive dsub and silently
    // read other subspaces' components. Row reads clamp to the row's
    // actual length with missing components as 0 — the defensive-min
    // convention CentroidDots documents.
    val dsub = codebook.length / (m * ks)
    val d = m * dsub
    val n = math.min(vec.numElements(), d)
    val out = new Array[Byte](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestDist = Double.MaxValue
      var c = 0
      while (c < ks) {
        val base = ((j * ks) + c) * dsub
        var dist = 0.0
        var t = 0
        while (t < dsub) {
          val vi = j * dsub + t
          val v = if (vi < n) vec.getDouble(vi) else 0.0
          val r = v - centroids(cell * d + vi)
          val diff = r - codebook(base + t)
          dist += diff * diff
          t += 1
        }
        if (dist < bestDist) { bestDist = dist; best = c }
        c += 1
      }
      out(j) = best.toByte
      j += 1
    }
    out
  }
}

/** Per-query ADC lookup table: element j*ks + c is the dot product of
  * the query's j-th sub-vector with codeword (j, c). Computed ONCE per
  * query row — independent of the probed cell, because for
  * inner-product scoring cos(q, v) = q . centroid[cell] + q . residual,
  * and only the first term depends on the cell. */
case class PqAdcLut(child: Expression, codebook: Array[Double], m: Int, ks: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_pq_adc_lut"

  override protected def nullSafeEval(q: Any): Any =
    PqAdcLut.compute(q.asInstanceOf[ArrayData], codebook, m, ks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebook", codebook, "double[]")
    nullSafeCodeGen(ctx, ev, q =>
      s"${ev.value} = graft.functions.PqAdcLut.compute($q, $cb, $m, $ks);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqAdcLut {
  def compute(q: ArrayData, codebook: Array[Double], m: Int, ks: Int): ArrayData = {
    // model-derived dsub + clamped row reads — see PqEncode.compute
    val dsub = codebook.length / (m * ks)
    val n = math.min(q.numElements(), m * dsub)
    val out = new Array[Double](m * ks)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < ks) {
        val base = ((j * ks) + c) * dsub
        var s = 0.0
        var t = 0
        while (t < dsub) {
          val qi = j * dsub + t
          if (qi < n) s += q.getDouble(qi) * codebook(base + t)
          t += 1
        }
        out(j * ks + c) = s
        c += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Asymmetric distance: sum of m LUT lookups — the per-candidate cost
  * of PQ search (no decode, no per-dimension arithmetic). ks is derived
  * as lut.length / codes.length. */
case class PqLookupSum(codes: Expression, lut: Expression) extends BinaryExpression {
  override def left: Expression = codes
  override def right: Expression = lut
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_lookup_sum"

  override protected def nullSafeEval(c: Any, l: Any): Any =
    PqLookupSum.compute(c.asInstanceOf[Array[Byte]], l.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, l) =>
      s"${ev.value} = graft.functions.PqLookupSum.compute($c, $l);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(codes = l, lut = r)
}

object PqLookupSum {
  def compute(codes: Array[Byte], lut: ArrayData): Double = {
    val m = codes.length
    if (m == 0) return 0.0
    val ks = lut.numElements() / m
    var s = 0.0
    var j = 0
    while (j < m) { s += lut.getDouble(j * ks + (codes(j) & 0xFF)); j += 1 }
    s
  }
}
