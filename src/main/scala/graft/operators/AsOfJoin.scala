package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Left as-of join: for each left row, attach the latest right row whose
  * timestamp is <= the left row's timestamp, within the same key group
  * (DuckDB `ASOF JOIN`, kdb `aj`, pandas `merge_asof`).
  *
  * Spark has no built-in as-of join. Rather than a range cross-join
  * (quadratic in group size) or a custom SparkPlan, this composes it as:
  * union both sides tagged -> one shuffle on the key -> per-key sort by
  * (ts, side) -> `last(right_payload, ignoreNulls)` over an unbounded
  * preceding window -> keep left rows. Cost: ONE shuffle + sort over
  * |L|+|R| rows, the same as a sort-merge join would pay — this is the
  * 100 TB-safe formulation. Ties (right.ts == left.ts) match, mirroring
  * DuckDB's `ON l.ts >= r.ts` semantics (side ordering puts the right
  * row first at equal ts).
  */
object AsOfJoin {

  /** @param left       left (probe) side
    * @param right      right (reference) side
    * @param keys       equi-join key columns (same names on both sides)
    * @param leftTs     left timestamp column
    * @param rightTs    right timestamp column
    * @param rightCols  right payload columns to attach; emitted as
    *                   `asof_<name>` (NULL when no right row precedes)
    */
  def leftAsOf(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, rightCols: Seq[String]): DataFrame = {
    val payload = struct(rightCols.map(col): _*)
    val payloadType = right.select(payload).schema.fields.head.dataType

    val leftCols = left.columns.toSeq
    val l = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("_ts"), lit(1).as("_side"),
        struct(leftCols.map(col): _*).as("_l"),
        lit(null).cast(payloadType).as("_r")): _*)
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("_ts"), lit(0).as("_side"),
        lit(null).cast(l.schema("_l").dataType).as("_l"),
        payload.as("_r")): _*)

    // The payload struct is the final sort key: among right rows sharing
    // (key, ts), the GREATEST payload deterministically wins the tie —
    // without it, `last(_r)` is run-order-dependent (partitioning-
    // sensitive), a latent result-hash flake. Left rows all carry a null
    // payload, so their relative order never matters (ignoreNulls skips
    // them). A payload containing an unorderable type (map) falls back
    // to the (ts, side)-only window — it still executes; only duplicate
    // (key, ts) right rows are then run-order-dependent, which no
    // ordering could fix for an uncomparable payload anyway.
    val orderKeys =
      if (org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(payloadType))
        Seq(col("_ts"), col("_side"), col("_r").asc_nulls_first)
      else Seq(col("_ts"), col("_side"))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderKeys: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(c => col(s"_l.$c").as(c)) ++
        rightCols.map(c => col(s"_m.$c").as(s"asof_$c")): _*)
  }
}
