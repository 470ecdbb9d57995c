package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout operators: how rows are assigned to files/partitions
  * determines what a 100 TB scan can SKIP. Sorting by one column gives
  * min/max file stats that prune predicates on that column only;
  * Z-ordering interleaves two dimensions so file bounding boxes stay
  * tight on BOTH — the clustering behind "OPTIMIZE ZORDER BY" in
  * modern table formats (public technique; Morton codes).
  */
object Layout {

  /** Cluster `df` into `numPartitions` range partitions of the Morton
    * code of (xCol, yCol), each sorted by the code — written out, every
    * file carries a tight bounding box in both dimensions, so min/max
    * stats prune range predicates on EITHER column (a linear sort
    * serves only its leading column; see LayoutSpec for the measured
    * contrast). Values are first normalized to `buckets` uniform bins
    * over the observed [min, max] (one scalar aggregate — a bounded
    * driver fetch of 4 values, broadcast back as literals): Morton
    * interleaving needs non-negative, comparable-range bit patterns,
    * not raw signed/skewed values. Uniform bins are the simple default;
    * heavily skewed dimensions want rank (quantile) normalization —
    * same code shape, boundaries from `percentile_approx` instead of
    * min/max. */
  def zorderBy(df: DataFrame, xCol: String, yCol: String,
               numPartitions: Int, buckets: Int = 1 << 16): DataFrame = {
    require(numPartitions > 0, "numPartitions must be positive")
    require(buckets >= 2 && buckets <= (1 << 30), "buckets must be in [2, 2^30]")
    // NaN is excluded from the bounds: max() orders NaN above every
    // double, so one NaN row would otherwise poison hi and null out
    // width_bucket for ALL rows (total loss of clustering). NaN rows
    // themselves get a null code and cluster together at the range edge.
    def finite(c: String): Column = {
      val d = col(c).cast("double")
      when(isnan(d), lit(null)).otherwise(d)
    }
    val r = df.agg(
      min(finite(xCol)), max(finite(xCol)),
      min(finite(yCol)), max(finite(yCol))).head()
    // isNullAt: empty input or an all-null dimension aggregates to null —
    // degrade to a constant dimension instead of throwing
    def bin(c: String, i: Int): Column = {
      if (r.isNullAt(i) || r.isNullAt(i + 1) || r.getDouble(i) >= r.getDouble(i + 1)) lit(0)
      else (width_bucket(col(c).cast("double"), lit(r.getDouble(i)), lit(r.getDouble(i + 1)), lit(buckets - 1)) - 1).cast("int")
    }
    val z = graft.functions.MortonCode(bin(xCol, 0), bin(yCol, 2))
    df.repartitionByRange(numPartitions, z).sortWithinPartitions(z)
  }

  /** [[zorderBy]] with RANK (quantile) normalization: each dimension maps
    * to its `buckets`-quantile index before Morton interleaving, so a
    * skewed dimension (where uniform min/max bins collapse the dense
    * region into one bucket, forfeiting pruning inside it) still spreads
    * over the full bucket range. Boundaries come from one
    * `percentile_approx` aggregate per call (a bounded driver fetch of
    * 2*(buckets-1) doubles, shipped back as a referenced object — see
    * [[graft.functions.BucketIndex]]); `buckets` stays moderate (default
    * 4096) because quantile resolution, not bit width, is the knob. */
  def zorderByRank(df: DataFrame, xCol: String, yCol: String,
                   numPartitions: Int, buckets: Int = 4096): DataFrame = {
    require(numPartitions > 0, "numPartitions must be positive")
    require(buckets >= 2 && buckets <= (1 << 20), "buckets must be in [2, 2^20]")
    val fracs = array((1 until buckets).map(i => lit(i.toDouble / buckets)): _*)
    val r = df.agg(
      percentile_approx(col(xCol).cast("double"), fracs, lit(10000)),
      percentile_approx(col(yCol).cast("double"), fracs, lit(10000))).head()
    def bounds(i: Int): Array[Double] = {
      val s = r.getSeq[Double](i)
      if (s == null || s.isEmpty) Array(0.0) else s.toArray
    }
    val z = graft.functions.MortonCode(
      graft.functions.BucketIndex(col(xCol).cast("double"), bounds(0)),
      graft.functions.BucketIndex(col(yCol).cast("double"), bounds(1)))
    df.repartitionByRange(numPartitions, z).sortWithinPartitions(z)
  }
}
