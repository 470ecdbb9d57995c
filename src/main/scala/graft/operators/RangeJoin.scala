package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join.
  *
  * Spark plans a raw `l.ts BETWEEN r.start AND r.end` join as
  * BroadcastNestedLoop (or cartesian) — quadratic per key group and a
  * 100 TB killer. This operator bins time at the maximum interval width:
  * every interval overlaps at most 2 adjacent bins of that width, so
  * exploding each interval to its covered bins and equi-joining points on
  * (keys..., bin) turns the range join into a hash join with bounded
  * fan-out (<= 2 rows per interval), then the exact BETWEEN predicate
  * filters within the bin. Cost: one equi-shuffle of points + 2x the
  * intervals — the standard bin-bucketed range-join formulation (same
  * trick Databricks' range-join optimization applies). */
object RangeJoin {

  /** Inner point-in-interval join: rows of `points` paired with every row
    * of `intervals` (same `keys`) whose [startCol, endCol] contains
    * `tsCol` (inclusive bounds). `maxIntervalWidthSec` is the BIN width:
    * correctness holds for any interval length (sequence covers all
    * spanned bins), but replication per interval is
    * ceil(width/binWidth)+1 — set it near the typical max width so most
    * intervals land in <= 2 bins. Columns from both sides survive
    * (non-key interval columns prefixed `ivl_`). */
  def pointInInterval(points: DataFrame, intervals: DataFrame, keys: Seq[String],
                      tsCol: String, startCol: String, endCol: String,
                      maxIntervalWidthSec: Long): DataFrame = {
    val w = maxIntervalWidthSec
    val p = points.withColumn("_bin", floor(unix_timestamp(col(tsCol)) / w))
    val ivlCols = intervals.columns.toSeq
    val i = intervals
      .withColumn("_b0", floor(unix_timestamp(col(startCol)) / w))
      .withColumn("_b1", floor(unix_timestamp(col(endCol)) / w))
      .withColumn("_bin", explode(sequence(col("_b0"), col("_b1"))))
      .select(keys.map(col) ++ Seq(col("_bin")) ++
        ivlCols.filterNot(keys.contains).map(c => col(c).as(s"ivl_$c")): _*)
    p.join(i, keys :+ "_bin")
      .filter(col(tsCol) >= col(s"ivl_$startCol") && col(tsCol) <= col(s"ivl_$endCol"))
      .drop("_bin")
  }
}
