package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.AffineDots

/** PCA dimensionality reduction for embedding columns — the principled
  * sibling of [[RandomProjection]]: axes are LEARNED from the corpus
  * covariance, so for a given output dimension the retained variance
  * (and downstream kNN/cluster fidelity) is optimal among linear maps.
  * The SemDeDup-style pipelines reduce with PCA before cell blocking for
  * exactly this reason.
  *
  * Scale shape:
  *   - **fit** = ONE distributed pass: a treeAggregate whose state is
  *     (n, Σx, upper-triangular Σxxᵀ) — `d + d(d+1)/2` doubles, bounded
  *     by the CHOSEN input dimension, independent of corpus size. The
  *     covariance eigen-decomposition (cyclic Jacobi, O(d³)) runs on the
  *     driver: trivial for embedding-sized d (64–2048). Beyond ~4k dims
  *     the dense covariance no longer fits this recipe — use randomized
  *     sketching; this operator guards with a require.
  *   - **transform** = a narrow codegen'd affine mat-vec
  *     ([[AffineDots]]: `W(x−μ)` with `W·μ` folded into offsets) — no
  *     shuffle, model rides as a referenced object.
  *
  * Determinism: the aggregation is FP-order dependent across partitions
  * only in the last bits; Jacobi is deterministic given the matrix; each
  * component's sign is canonicalized (largest-|coordinate| positive) so
  * repeated fits agree to FP noise.
  */
object Pca {

  /** mean (d), components (k×d row-major, orthonormal rows, descending
    * eigenvalue), eigenvalues (k, variance along each component). */
  final case class Model(mean: Array[Double], components: Array[Double],
                         eigenvalues: Array[Double]) {
    def k: Int = eigenvalues.length
    def d: Int = mean.length
  }

  /** Fit a PCA model on `df(vecCol)` (array<float|double>, constant
    * length d ≤ maxDim). */
  def fit(df: DataFrame, vecCol: String, dim: Int, k: Int,
          maxDim: Int = 4096): Model = {
    require(dim > 0 && dim <= maxDim,
      s"dim=$dim out of range (dense covariance path caps at $maxDim)")
    require(k > 0 && k <= dim, s"k=$k must be in [1, $dim]")
    val spark = df.sparkSession
    import spark.implicits._
    val tri = dim * (dim + 1) / 2
    // state: [n, sum_0..d-1, upper-tri sums]
    val zero = new Array[Double](1 + dim + tri)
    val agg = df.select(col(vecCol).cast("array<double>")).as[Array[Double]].rdd
      .treeAggregate(zero)(
        seqOp = (acc, v) => {
          require(v != null,
            s"PCA fit: null vector in column '$vecCol' — filter nulls before fitting")
          require(v.length == dim, s"vector length ${v.length} != dim $dim")
          acc(0) += 1
          var i = 0
          var t = 1 + dim
          while (i < dim) {
            acc(1 + i) += v(i)
            var j = i
            while (j < dim) { acc(t) += v(i) * v(j); j += 1; t += 1 }
            i += 1
          }
          acc
        },
        combOp = (a, b) => {
          var i = 0
          while (i < a.length) { a(i) += b(i); i += 1 }
          a
        })
    val n = agg(0)
    require(n >= 2, s"need at least 2 vectors, got $n")
    val mean = Array.tabulate(dim)(i => agg(1 + i) / n)
    // C[i][j] = E[x_i x_j] - mu_i mu_j
    val c = Array.ofDim[Double](dim, dim)
    var t = 1 + dim
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val v = agg(t) / n - mean(i) * mean(j)
        c(i)(j) = v; c(j)(i) = v
        j += 1; t += 1
      }
      i += 1
    }
    val (values, vectors) = jacobiEigen(c)
    val order = values.indices.sortBy(ix => -values(ix)).take(k)
    val comps = new Array[Double](k * dim)
    val eig = new Array[Double](k)
    var r = 0
    while (r < k) {
      val ix = order(r)
      eig(r) = values(ix)
      // canonical sign: largest-|coordinate| positive
      var best = 0
      var j2 = 1
      while (j2 < dim) {
        if (math.abs(vectors(j2)(ix)) > math.abs(vectors(best)(ix))) best = j2
        j2 += 1
      }
      val s = if (vectors(best)(ix) < 0) -1.0 else 1.0
      var j3 = 0
      while (j3 < dim) { comps(r * dim + j3) = s * vectors(j3)(ix); j3 += 1 }
      r += 1
    }
    Model(mean, comps, eig)
  }

  /** `W(x − μ)` as a narrow projection column (array<double>, length k). */
  def transformColumn(vecCol: Column, model: Model): Column = {
    val offsets = Array.tabulate(model.k) { r =>
      var s = 0.0
      var j = 0
      while (j < model.d) { s += model.components(r * model.d + j) * model.mean(j); j += 1 }
      s
    }
    AffineDots(vecCol.cast("array<double>"), model.components, offsets)
  }

  /** Fit + transform: `df` plus `outCol` (array<double> length k). */
  def fitTransform(df: DataFrame, vecCol: String, outCol: String,
                   dim: Int, k: Int): DataFrame = {
    val m = fit(df, vecCol, dim, k)
    df.withColumn(outCol, transformColumn(col(vecCol), m))
  }

  /** Cyclic Jacobi eigen-decomposition of a symmetric matrix. Returns
    * (eigenvalues, eigenvectors-as-columns). O(d³) per sweep, converges
    * quadratically; plenty for driver-side d ≤ 4096 — the standard
    * textbook method (Golub & Van Loan §8.5). */
  private[operators] def jacobiEigen(a0: Array[Array[Double]],
                                     maxSweeps: Int = 32,
                                     tol: Double = 1e-12): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = Array.tabulate(d, d)((i, j) => a0(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiagNorm(a)
    val scale = math.max(1.0, frobenius(a))
    while (sweep < maxSweeps && off > tol * scale) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val tQ = math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val tt = if (theta == 0.0) 1.0 else tQ
            val cC = 1.0 / math.sqrt(tt * tt + 1.0)
            val sS = tt * cC
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = cC * aip - sS * aiq
              a(i)(q) = sS * aip + cC * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = cC * api - sS * aqi
              a(q)(i) = sS * api + cC * aqi
              i += 1
            }
            i = 0
            while (i < d) {
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = cC * vip - sS * viq
              v(i)(q) = sS * vip + cC * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiagNorm(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiagNorm(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = 0
      while (j < a.length) { if (i != j) s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }

  private def frobenius(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = 0
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }
}
