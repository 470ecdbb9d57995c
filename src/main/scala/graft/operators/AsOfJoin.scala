package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Left as-of join: for each left row, attach the nearest right row at or
  * before (backward) / at or after (forward) the left row's timestamp,
  * within the same key group, optionally bounded by a tolerance
  * (DuckDB `ASOF JOIN`, kdb `aj`, pandas `merge_asof` incl. its
  * `direction=`/`tolerance=` parameters).
  *
  * Spark has no built-in as-of join. Rather than a range cross-join
  * (quadratic in group size) or a custom SparkPlan, this composes it as:
  * union both sides tagged -> one shuffle on the key -> per-key sort by
  * (ts, side) -> `last(right_payload, ignoreNulls)` over an unbounded
  * preceding window (backward; `first` over following for forward) ->
  * keep left rows. Cost: ONE shuffle + sort over |L|+|R| rows, the same
  * as a sort-merge join would pay — this is the 100 TB-safe formulation.
  * Ties (right.ts == left.ts) match in BOTH directions, mirroring
  * DuckDB's `ON l.ts >= r.ts` / `ON l.ts <= r.ts` semantics (side
  * ordering puts the right row inside the frame at equal ts).
  */
object AsOfJoin {

  /** @param left       left (probe) side
    * @param right      right (reference) side
    * @param keys       equi-join key columns (same names on both sides)
    * @param leftTs     left timestamp column
    * @param rightTs    right timestamp column
    * @param rightCols  right payload columns to attach; emitted as
    *                   `asof_<name>` (NULL when no right row matches)
    * @param direction  "backward" (default: latest right.ts <= left.ts)
    *                   or "forward" (earliest right.ts >= left.ts)
    * @param tolerance  optional SQL interval literal body (e.g.
    *                   "30 minutes"): a match farther than this from the
    *                   left timestamp is nulled out, NOT replaced by the
    *                   next-nearest row — pandas merge_asof semantics.
    *                   Requires timestamp-typed ts columns.
    */
  def leftAsOf(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, rightCols: Seq[String],
               direction: String = "backward",
               tolerance: Option[String] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val backward = direction == "backward"
    val payload = struct(rightCols.map(col): _*)
    val payloadType = right.select(payload).schema.fields.head.dataType

    // side ordering: the right row must fall INSIDE the left row's frame
    // at equal ts — before it for backward ([unboundedPreceding, current]),
    // after it for forward ([current, unboundedFollowing])
    val (leftSide, rightSide) = if (backward) (1, 0) else (0, 1)
    val leftCols = left.columns.toSeq
    val l = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("_ts"), lit(leftSide).as("_side"),
        struct(leftCols.map(col): _*).as("_l"),
        lit(null).cast(payloadType).as("_r")): _*)
    // a null-ts REFERENCE row can never satisfy ts <= / >= anything
    // (SQL comparison with NULL is never true) — drop it before the
    // union, or the null would sort to the frame edge and win matches no
    // real row precedes (backward: NULL sorts first, inside every
    // unbounded-preceding frame)
    val r = right.filter(col(rightTs).isNotNull).select(
      keys.map(col) ++ Seq(
        col(rightTs).as("_ts"), lit(rightSide).as("_side"),
        lit(null).cast(l.schema("_l").dataType).as("_l"),
        payload.as("_r")): _*)

    // The payload struct is the final sort key: among right rows sharing
    // (key, ts), the GREATEST payload deterministically wins a backward
    // tie (`last` over asc order) and the SMALLEST a forward tie
    // (`first` over asc order) — without it, the pick is
    // run-order-dependent (partitioning-sensitive), a latent result-hash
    // flake. Left rows all carry a null payload, so their relative order
    // never matters (ignoreNulls skips them). A payload containing an
    // unorderable type (map) falls back to the (ts, side)-only window —
    // it still executes; only duplicate (key, ts) right rows are then
    // run-order-dependent, which no ordering could fix for an
    // uncomparable payload anyway.
    // null-ts PROBE rows must match nothing but still survive (left-join
    // contract; DuckDB ASOF yields NULL for them): order nulls to the
    // frame-empty end — first for backward (nothing precedes), last for
    // forward (nothing follows). Right null-ts rows are already filtered,
    // so the only null-ts neighbors are other left rows, whose payload is
    // null and skipped by ignoreNulls either way.
    val tsKey = if (backward) col("_ts").asc_nulls_first else col("_ts").asc_nulls_last
    val orderKeys =
      if (org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(payloadType))
        Seq(tsKey, col("_side"), col("_r").asc_nulls_first)
      else Seq(tsKey, col("_side"))
    val base = Window.partitionBy(keys.map(col): _*).orderBy(orderKeys: _*)
    val w =
      if (backward) base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      else base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    def nearest(c: Column): Column =
      if (backward) last(c, ignoreNulls = true).over(w)
      else first(c, ignoreNulls = true).over(w)

    // matched payload + its timestamp come from the SAME row: both
    // aggregates skip nulls and each is non-null exactly on right rows,
    // so under the total order above they resolve to one row's values
    val matched = l.unionByName(r)
      .withColumn("_m", nearest(col("_r")))
      .withColumn("_mt", nearest(when(col("_side") === rightSide, col("_ts"))))
      .filter(col("_side") === leftSide)
    val inTol: Column = tolerance match {
      case None => lit(true)
      case Some(t) =>
        if (backward) col("_mt") >= col("_ts") - expr(s"INTERVAL $t")
        else col("_mt") <= col("_ts") + expr(s"INTERVAL $t")
    }
    matched
      .withColumn("_m", when(inTol, col("_m")))
      .select(leftCols.map(c => col(s"_l.$c").as(c)) ++
        rightCols.map(c => col(s"_m.$c").as(s"asof_$c")): _*)
  }

  /** pandas `merge_asof(direction='nearest')`: attach whichever of the
    * backward and forward matches is closer in time; EQUAL distances
    * prefer the backward match (pinned, engine-reproducible). Pure
    * composition of two [[leftAsOf]] passes — each direction's
    * tie-break and tolerance semantics are exactly the proven ones, and
    * the pick compares exact integer microseconds (`unix_micros`), so
    * no floating-point epoch rounding can flip a choice. `tolerance`
    * nulls a side independently before the pick (a too-far backward
    * match never shadows an in-range forward one). Requires
    * timestamp-typed ts columns; `rightCols` must not include
    * `rightTs` (the match timestamps are plumbing, not payload). */
  def leftAsOfNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
                      leftTs: String, rightTs: String, rightCols: Seq[String],
                      tolerance: Option[String] = None): DataFrame = {
    require(!rightCols.contains(rightTs), s"rightCols must not include '$rightTs'")
    val withTs = rightCols :+ rightTs
    require(!left.columns.exists(_.startsWith("_bwd_")), "left must not carry _bwd_* columns")
    val bwd = withTs.foldLeft(
      leftAsOf(left, right, keys, leftTs, rightTs, withTs, "backward", tolerance)) {
      (d, c) => d.withColumnRenamed(s"asof_$c", s"_bwd_$c")
    }
    val both = leftAsOf(bwd, right, keys, leftTs, rightTs, withTs, "forward", tolerance)
    val dtB = unix_micros(col(leftTs)) - unix_micros(col(s"_bwd_$rightTs"))
    val dtF = unix_micros(col(s"asof_$rightTs")) - unix_micros(col(leftTs))
    val useBwd = col(s"_bwd_$rightTs").isNotNull &&
      (col(s"asof_$rightTs").isNull || dtB <= dtF)
    val picked = rightCols.foldLeft(both) { (d, c) =>
      d.withColumn(s"asof_$c", when(useBwd, col(s"_bwd_$c")).otherwise(col(s"asof_$c")))
    }
    picked.drop(withTs.map(c => s"_bwd_$c") :+ s"asof_$rightTs": _*)
  }
}
