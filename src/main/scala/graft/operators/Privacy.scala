package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tabular privacy gates `[EXT]`: k-anonymity and l-diversity over
  * quasi-identifier columns (Sweeney 2002; Machanavajjhala et al. 2007)
  * — the release-side complement to the text-side PII
  * redaction/pseudonymization already in [[TextAnalysis]]. A training
  * corpus with user metadata columns must not ship equivalence classes
  * small enough to re-identify (k) or sensitive-homogeneous enough to
  * disclose (l).
  *
  * Both checks are ONE aggregation keyed on the quasi-identifier tuple
  * plus one keyed join back — two shuffles on the same key, no window
  * over a giant partition, no driver-side state. Group-count tables are
  * bounded by quasi-identifier cardinality, so AQE broadcasts the join
  * when that is small and shuffles it when not — correct at every
  * scale.
  */
object Privacy {

  /** Annotate every row with its equivalence class's size and distinct
    * sensitive-value count, plus the pass/fail flags:
    * `grp_n` (bigint), `distinct_sens` (bigint),
    * `k_ok = grp_n >= k`, `l_ok = distinct_sens >= l`.
    *
    * `sensitive` is an expression (not a column name) so callers
    * generalize on the fly — e.g. `floor(col("balance") / 1000)` checks
    * diversity of the BUCKET, the usual l-diversity practice for
    * numeric attributes. */
  def annotate(df: DataFrame, quasiCols: Seq[String], sensitive: Column,
               k: Int, l: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1 && l >= 1, "k and l must be >= 1")
    val g = df.withColumn("_sens", sensitive)
      .groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("grp_n"),
        count_distinct(col("_sens")).as("distinct_sens"))
    df.join(g, quasiCols)
      .withColumn("k_ok", col("grp_n") >= k)
      .withColumn("l_ok", col("distinct_sens") >= l)
  }

  /** Suppression release: only rows whose equivalence class satisfies
    * BOTH gates survive (the standard suppression model — generalize
    * first via the `sensitive`/quasi expressions, then suppress what
    * still fails). */
  def suppress(df: DataFrame, quasiCols: Seq[String], sensitive: Column,
               k: Int, l: Int): DataFrame =
    annotate(df, quasiCols, sensitive, k, l)
      .where(col("k_ok") && col("l_ok"))
      .drop("grp_n", "distinct_sens", "k_ok", "l_ok")
}
