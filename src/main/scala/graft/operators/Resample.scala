package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-series resampling: densify each key's event stream onto a fixed
  * interval grid spanning its observed range, backward-filled with the
  * latest value via [[AsOfJoin]] — the downsample/ffill step every
  * time-series feature pipeline runs.
  *
  * Plan shape: one per-key min/max aggregate -> `explode(sequence)` grid
  * -> one as-of join (union + single shuffle). No per-point probes, no
  * cross product; grid rows are generated distributed, never collected.
  *
  * THE SCALE FOOTGUN this operator clamps: grid size per key is
  * `span / step`, a function of WALL-CLOCK RANGE, not data volume — one
  * key idle for a year emits 8 760 hourly rows from a handful of events,
  * and a corpus of long-idle keys amplifies a small input into an
  * unbounded output. `maxGridRowsPerKey` bounds it, with two policies:
  *   - `truncate = false` (default): any key whose grid would exceed the
  *     cap fails the job with a per-key error naming the bound — the
  *     fail-loud default, mirroring the engine's null-id stance.
  *   - `truncate = true`: the grid is cut at exactly `maxGridRowsPerKey`
  *     rows from each key's start (later events still exist in the
  *     source; they just get no grid rows) — the "cap the blast radius"
  *     production policy.
  * `maxGridRowsPerKey = 0` disables the clamp (the oracle-pinned default
  * behavior of `ev_resample`). */
object Resample {

  /** Backward-filled fixed-step grid per key.
    *
    * @param events    input frame carrying `keyCols`, `tsCol`, `valueCols`
    * @param truncUnit `date_trunc` unit aligning each key's grid start/end
    *                  ("hour", "day", ...)
    * @param stepSec   grid step in seconds (3600 = hourly)
    * @param maxGridRowsPerKey 0 = unlimited; otherwise the per-key cap
    * @param truncate  cap policy: false = raise on exceed, true = cut the
    *                  grid at the cap
    * @return (keyCols..., grid_ts timestamp, asof_<valueCol>...) — one
    *         row per key per grid point */
  def ffillGrid(events: DataFrame, keyCols: Seq[String], tsCol: String,
                valueCols: Seq[String], truncUnit: String = "hour",
                stepSec: Long = 3600L, maxGridRowsPerKey: Long = 0L,
                truncate: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty, "resample needs at least one key column")
    require(stepSec > 0, "stepSec must be positive")
    require(maxGridRowsPerKey >= 0, "maxGridRowsPerKey must be >= 0 (0 = off)")
    val keys = keyCols.map(col)
    val spans = events.groupBy(keys: _*)
      .agg(date_trunc(truncUnit, min(col(tsCol))).as("_t0"),
        date_trunc(truncUnit, max(col(tsCol))).as("_t1"))
    val bounded =
      if (maxGridRowsPerKey <= 0) spans.withColumn("_t1b", col("_t1"))
      else {
        // grid rows = floor((t1-t0)/step) + 1 over unit-truncated bounds
        val nRows = floor((unix_timestamp(col("_t1")) - unix_timestamp(col("_t0"))) / stepSec) + 1
        val capEnd = timestamp_seconds(
          unix_timestamp(col("_t0")) + (maxGridRowsPerKey - 1) * stepSec)
        val t1b =
          if (truncate) least(col("_t1"), capEnd)
          else when(nRows > maxGridRowsPerKey,
              raise_error(concat(lit(s"Resample.ffillGrid: key ("),
                concat_ws(",", keys: _*),
                lit(s") would emit "), nRows.cast("string"),
                lit(s" grid rows > maxGridRowsPerKey=$maxGridRowsPerKey; " +
                  "raise the cap, widen the step, or pass truncate=true")))
                .cast("timestamp"))
            .otherwise(col("_t1"))
        spans.withColumn("_t1b", t1b)
      }
    val grid = bounded.select(keys :+
      explode(sequence(col("_t0"), col("_t1b"),
        expr(s"INTERVAL $stepSec SECONDS"))).as("grid_ts"): _*)
    AsOfJoin.leftAsOf(grid, events, keyCols, "grid_ts", tsCol, valueCols)
  }

  import org.apache.spark.sql.Column

  /** Holt's linear-trend exponential smoothing over an ORDERED series
    * column (`array<double>`, length >= 2) — one `aggregate` HOF fold,
    * no shuffle, no driver loop. Convention (mirrored exactly by the
    * DuckDB twin): level₀ = x₀, trend₀ = 0; for each subsequent x:
    * forecast = level + trend, err accumulates |x − forecast|, then
    * level' = α·x + (1−α)·forecast, trend' = β·(level'−level) +
    * (1−β)·trend. Returns a struct (level, trend, sae) — the caller
    * derives forecast_next = level + trend and mae = sae/(n−1). The
    * in-sample one-step-ahead MAE is the standard backtest the
    * seasonal-naive baseline (ev_forecast_snaive) is judged against.
    * The series must be BOUNDED (hours × types, not rows — the same
    * collect_list contract as the snaive hourly table). */
  def holtLinear(xs: Column, alpha: Double, beta: Double): Column = {
    require(alpha > 0 && alpha < 1, "alpha must be in (0, 1)")
    require(beta > 0 && beta < 1, "beta must be in (0, 1)")
    aggregate(
      slice(xs, lit(2), size(xs) - 1),
      struct(element_at(xs, 1).as("level"), lit(0.0).as("trend"),
        lit(0.0).as("sae")),
      (acc, x) => {
        val f = acc.getField("level") + acc.getField("trend")
        val nl = lit(alpha) * x + lit(1.0 - alpha) * f
        struct(nl.as("level"),
          (lit(beta) * (nl - acc.getField("level")) +
            lit(1.0 - beta) * acc.getField("trend")).as("trend"),
          (acc.getField("sae") + abs(x - f)).as("sae"))
      })
  }
}
