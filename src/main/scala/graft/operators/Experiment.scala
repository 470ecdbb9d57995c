package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Online-experiment (A/B test) analysis over per-unit outcome tables —
  * the readout step every data-collection experiment (prompt variants,
  * labeling-UI changes, crawler policies) ends with.
  *
  * [[twoProportion]] is the classic two-proportion z-test: variants A/B
  * with binary outcomes, pooled-variance standard error
  * `SE = sqrt(p̂(1-p̂)(1/n_a + 1/n_b))`, `z = (p_b - p_a)/SE`, two-sided
  * significance at α = 0.05. Every reported statistic is a ratio of
  * EXACT integer counts, so the twin's values are bit-identical
  * cross-engine with no summation-order caveat (unlike mean-based
  * t-tests, deliberately not reported here for that reason).
  *
  * Scale shape: one full aggregation over the per-unit table (map-side
  * partial sums; no shuffle of raw rows beyond the upstream per-unit
  * grouping the caller owns) reduced to a single row — at 100 TB the
  * cost is the scan, the reduction is O(1).
  */
object Experiment {

  /** Exact two-sided 97.5 % normal quantile (z for α = 0.05). */
  val Z95: Double = 1.959963984540054

  /** 80 % / 90 % one-sided normal quantiles (z_β for power planning). */
  val Z80: Double = 0.8416212335729143
  val Z90: Double = 1.2815515655446004

  /** Required per-arm sample size for a two-proportion test detecting
    * an absolute lift `delta` off baseline `p` — the standard normal-
    * approximation formula `n = ⌈(z_{α/2}·√(2p̄(1−p̄)) +
    * z_β·√(p(1−p)+p'(1−p')))² / δ²⌉` with `p' = p+δ`, `p̄ = (p+p')/2`.
    * Pure column arithmetic (IEEE sqrt/ceil are exactly-rounded, so
    * identical inputs give identical outputs in any engine). */
  def requiredNPerArm(p: Column, delta: Column, zAlpha: Column,
                      zBeta: Column): Column = {
    val p2 = p + delta
    val pbar = (p + p2) / 2
    val s = zAlpha * sqrt(lit(2.0) * pbar * (lit(1.0) - pbar)) +
      zBeta * sqrt(p * (lit(1.0) - p) + p2 * (lit(1.0) - p2))
    ceil(s * s / (delta * delta)).cast("long")
  }

  /** One-row two-proportion report over `perUnit` (one row per
    * experimental unit). `variantCol`: 0 = control A, nonzero = B.
    * `outcomeCol`: 0/1 (castable to long). Requires both arms non-empty
    * and a pooled rate strictly inside (0, 1) — ANSI mode would
    * otherwise raise on the SE division, which is the right loudness
    * for a degenerate experiment. */
  def twoProportion(perUnit: DataFrame, variantCol: String,
                    outcomeCol: String, metric: String): DataFrame = {
    val agg = perUnit.agg(
      sum(when(col(variantCol) === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(col(variantCol) =!= 0, 1L).otherwise(0L)).as("n_b"),
      sum(when(col(variantCol) === 0, col(outcomeCol).cast("long"))
        .otherwise(0L)).as("x_a"),
      sum(when(col(variantCol) =!= 0, col(outcomeCol).cast("long"))
        .otherwise(0L)).as("x_b"))
    val pa = col("x_a") / col("n_a")
    val pb = col("x_b") / col("n_b")
    val pooled = (col("x_a") + col("x_b")) / (col("n_a") + col("n_b"))
    val se = sqrt(pooled * (lit(1.0) - pooled) *
      (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))
    val z = (pb - pa) / se
    // +1e-9: the repo's standing round-half-boundary nudge (rates are
    // exact rationals that can land ON a 6-dp half boundary)
    agg.select(
      lit(metric).as("metric"),
      col("n_a"), col("n_b"), col("x_a"), col("x_b"),
      round(pa + lit(1e-9), 6).as("rate_a"),
      round(pb + lit(1e-9), 6).as("rate_b"),
      round(pb - pa + lit(1e-9), 6).as("abs_lift"),
      round(z + lit(1e-9), 6).as("z"),
      (abs(z) > lit(Z95)).as("significant"))
  }
}
