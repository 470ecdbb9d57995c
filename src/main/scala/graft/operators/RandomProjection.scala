package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.CentroidDots

/** Johnson–Lindenstrauss random projection: reduce an embedding column
  * from `inDim` to `outDim` with a DETERMINISTIC sparse sign matrix
  * (Achlioptas 2003: entries +1 / −1 / 0 with probability 1/6, 1/6,
  * 2/3), derived per-cell from md5 so any engine — including the DuckDB
  * oracle twin — reproduces the exact same matrix with no shipped
  * artifact.
  *
  * Why it matters at 100 TB: every downstream vector operator (brute
  * kNN, IVF build, cosine near-dup) is linear in the dimension. A 64→16
  * projection cuts vector compute AND shuffle bytes 4× while JL
  * preserves pairwise distances within ~ε for outDim = O(log n / ε²);
  * the spec measures the retained kNN recall on the fixture corpus.
  *
  * Scale shape: the matrix is outDim×inDim doubles built ONCE on the
  * driver (KBs) and rides into codegen as a referenced object via
  * [[CentroidDots]] (matrix rows = "centroids", mat-vec = the k dot
  * products) — a pure narrow projection, no shuffle, identical generated
  * source across matrices so Janino compiles once per session.
  *
  * The matrix is unscaled (±1 entries, not ±√3·outDim⁻¹ᐟ²): cosine and
  * relative-distance consumers are scale-invariant, and integer weights
  * keep the oracle twin's arithmetic exactly reproducible.
  */
object RandomProjection {

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  /** Cell weight for (row i of outDim, input coordinate j): the top 32
    * md5 bits of "tag|j|i" mod 6 → {0→+1, 1→−1, else 0}. Public-formula
    * deterministic so SQL twins can recompute it. */
  def cellWeight(tag: String, j: Int, i: Int): Double =
    java.lang.Long.parseLong(md5Hex(s"$tag|$j|$i").substring(0, 8), 16) % 6 match {
      case 0 => 1.0
      case 1 => -1.0
      case _ => 0.0
    }

  /** Flat row-major outDim×inDim sign matrix (row i = output coord). */
  def signMatrix(inDim: Int, outDim: Int, tag: String = "rp"): Array[Double] = {
    require(inDim > 0 && outDim > 0, "dims must be positive")
    val m = new Array[Double](outDim * inDim)
    var i = 0
    while (i < outDim) {
      var j = 0
      while (j < inDim) { m(i * inDim + j) = cellWeight(tag, j, i); j += 1 }
      i += 1
    }
    m
  }

  /** `vecCol` (array<float|double>, length ≥ inDim) projected to an
    * array<double> of outDim components. */
  def projectColumn(vecCol: Column, inDim: Int, outDim: Int, tag: String = "rp"): Column = {
    val m = signMatrix(inDim, outDim, tag)
    org.apache.spark.sql.GraftColumnBridge.column(CentroidDots(
      org.apache.spark.sql.GraftColumnBridge.expression(vecCol.cast("array<double>")),
      m, outDim))
  }
}
