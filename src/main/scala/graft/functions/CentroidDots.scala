package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Dot products of a vector with each of k centroids, as one expression.
  *
  * Replaces the `array(dot(v, lit(c0)), dot(v, lit(c1)), ...)` literal
  * construction in the IVF paths. Beyond being one tight loop, the real
  * win is COMPILATION: centroid literals bake each round's values into
  * the generated source, so every Lloyd iteration (new centroids → new
  * source) forced a fresh Janino compile (~1-2 s/round of fixed cost,
  * pitfall: iterative DataFrame algorithms pay per-round codegen). The
  * centroid matrix rides in as a referenced object
  * (`ctx.addReferenceObj`), leaving the generated source IDENTICAL
  * across rounds — the codegen cache hits and re-planning is cheap.
  *
  * Flat layout `centroids[c*dsub + t]` where dsub = centroids.length / k;
  * a vector whose length differs from dsub fails loud (a silent min
  * would score a truncated vector — wrong answer, not an error —
  * inconsistent with the fit-side length checks).
  */
case class CentroidDots(child: Expression, centroids: Array[Double], k: Int)
    extends UnaryExpression {
  require(k > 0 && centroids.length % k == 0,
    s"centroid matrix length ${centroids.length} must be a multiple of k=$k")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_centroid_dots"

  override protected def nullSafeEval(v: Any): Any =
    CentroidDots.compute(v.asInstanceOf[ArrayData], centroids, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("centroids", centroids, "double[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.CentroidDots.compute($v, $cents, $k);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CentroidDots {
  def compute(vec: ArrayData, centroids: Array[Double], k: Int): ArrayData = {
    val d = centroids.length / k
    if (vec.numElements() != d) throw new IllegalArgumentException(
      s"graft_centroid_dots: vector length ${vec.numElements()} != centroid dim $d")
    val out = new Array[Double](k)
    var c = 0
    while (c < k) {
      val base = c * d
      var s = 0.0
      var t = 0
      while (t < d) { s += vec.getDouble(t) * centroids(base + t); t += 1 }
      out(c) = s
      c += 1
    }
    new GenericArrayData(out)
  }
}

/** The top-`n` centroid indexes by dot product (ties → lower index), as
  * one expression — the multi-assignment sibling of [[CentroidDots]]:
  * SemDeDup-style blocking probes a vector into its n nearest cells so
  * near-dup pairs straddling ONE cell boundary still collide. Same
  * referenced-object shape: the generated source is identical across
  * retrains, no per-model recompiles. */
case class TopCells(child: Expression, centroids: Array[Double], k: Int, n: Int)
    extends UnaryExpression {
  require(k > 0 && centroids.length % k == 0,
    s"centroid matrix length ${centroids.length} must be a multiple of k=$k")
  require(n >= 1 && n <= k, s"top-n $n must be in [1, $k]")
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "graft_top_cells"

  override protected def nullSafeEval(v: Any): Any =
    TopCells.compute(v.asInstanceOf[ArrayData], centroids, k, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("centroids", centroids, "double[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.TopCells.compute($v, $cents, $k, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Banded sign-LSH bucket ids from a hyperplane-dot array: band `b`'s
  * bucket packs its `bitsPerBand` dot SIGNS into a long, tagged with the
  * band index in the high bits so distinct bands never collide. One
  * expression and one loop for the whole banding step — building it
  * from per-bit when/element_at column algebra generated a
  * bands×bits-node tree (488 nodes at the derived 61×8 sizing) whose
  * codegen dwarfed the actual math. */
case class SignBandBuckets(child: Expression, bands: Int, bitsPerBand: Int)
    extends UnaryExpression {
  require(bands >= 1 && bitsPerBand >= 1 && bitsPerBand <= 48,
    s"need bands >= 1 and 1 <= bitsPerBand <= 48, got ($bands, $bitsPerBand)")
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "graft_sign_band_buckets"

  override protected def nullSafeEval(v: Any): Any =
    SignBandBuckets.compute(v.asInstanceOf[ArrayData], bands, bitsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.SignBandBuckets.compute($v, $bands, $bitsPerBand);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SignBandBuckets {
  def compute(dots: ArrayData, bands: Int, bitsPerBand: Int): ArrayData = {
    if (dots.numElements() != bands * bitsPerBand) throw new IllegalArgumentException(
      s"graft_sign_band_buckets: ${dots.numElements()} dots != $bands bands x $bitsPerBand bits")
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var key = 0L
      var i = 0
      while (i < bitsPerBand) {
        if (dots.getDouble(b * bitsPerBand + i) >= 0) key |= 1L << i
        i += 1
      }
      out(b) = key + b.toLong * (1L << bitsPerBand)
      b += 1
    }
    new GenericArrayData(out)
  }
}

object TopCells {
  def compute(vec: ArrayData, centroids: Array[Double], k: Int, n: Int): ArrayData = {
    val scores = CentroidDots.compute(vec, centroids, k)
    val taken = new Array[Boolean](k)
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      var c = 0
      while (c < k) {
        val s = scores.getDouble(c)
        if (!taken(c) && s > bestScore) { best = c; bestScore = s }
        c += 1
      }
      // NaN guard: a NaN vector component poisons every dot and
      // `NaN > x` is always false, leaving best = -1 — fall back to the
      // first untaken index so the multi-probe path degrades to an
      // arbitrary-but-valid cell (as the single-probe argmax path does)
      // instead of crashing the job
      if (best == -1) best = taken.indexOf(false)
      taken(best) = true
      out(i) = best
      i += 1
    }
    new GenericArrayData(out)
  }
}
