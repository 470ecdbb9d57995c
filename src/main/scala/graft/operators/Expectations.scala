package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the validation gate a corpus
  * passes before it ships to training (the public pattern is AWS Deequ /
  * Great Expectations: checks as data, results as a table). Every check
  * compiles to ONE aggregate over the input, and all checks for a table
  * evaluate in a SINGLE pass (one `agg(...)` with N expressions — no
  * per-check scans), so validating 100 TB costs one scan regardless of
  * how many expectations are attached.
  *
  * Results are a small table (check_name, observed, threshold, passed) —
  * joinable into run manifests, diffable across snapshots, and the
  * `passed` conjunction is the gate bit. */
object Expectations {

  /** One expectation: a named aggregate `observed` compared against
    * `threshold` under `op` ("<=", ">=", "=="). */
  final case class Check(name: String, observed: Column, op: String, threshold: Double) {
    require(Seq("<=", ">=", "==").contains(op), s"unsupported op '$op'")
  }

  /** Null-or-blank fraction of a string column. */
  def blankFraction(c: Column): Column =
    avg(when(c.isNull || length(trim(c)) === 0, 1.0).otherwise(0.0))

  /** Null fraction of any column. */
  def nullFraction(c: Column): Column =
    avg(when(c.isNull, 1.0).otherwise(0.0))

  /** Duplicate fraction of a key column: 1 - distinct/total. */
  def duplicateFraction(c: Column): Column =
    lit(1.0) - count_distinct(c).cast("double") / count(lit(1))

  /** Fraction of rows whose value falls OUTSIDE `allowed`. */
  def outOfSetFraction(c: Column, allowed: Seq[String]): Column =
    avg(when(c.isin(allowed.map(lit): _*), 0.0).otherwise(1.0))

  /** Fraction of rows outside [lo, hi]. */
  def outOfRangeFraction(c: Column, lo: Double, hi: Double): Column =
    avg(when(c.isNull || c < lo || c > hi, 1.0).otherwise(0.0))

  /** Evaluate all checks in one aggregate pass. Output: one row per
    * check — (check_name, observed, op, threshold, passed), in the given
    * order. Observed values round to 6 (engine-stable comparisons). */
  def evaluate(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "need at least one check")
    require(checks.map(_.name).distinct.size == checks.size, "check names must be unique")
    val aggs = checks.map(c => round(c.observed.cast("double"), 6).as(c.name))
    val one = df.agg(aggs.head, aggs.tail: _*)
    // pivot the single wide row into (check, observed, ...) rows via a
    // literal stack — no shuffle, the agg row is already tiny
    val rows = checks.map { c =>
      struct(lit(c.name).as("check_name"), col(c.name).as("observed"),
        lit(c.op).as("op"), lit(c.threshold).as("threshold"))
    }
    one.select(explode(array(rows: _*)).as("r"))
      .select(col("r.check_name"), col("r.observed"), col("r.op"), col("r.threshold"))
      .withColumn("passed",
        when(col("op") === "<=", col("observed") <= col("threshold"))
          .when(col("op") === ">=", col("observed") >= col("threshold"))
          .otherwise(col("observed") === col("threshold")))
  }

  /** The gate bit: true iff every check passed. */
  def allPassed(results: DataFrame): Boolean =
    results.agg(min(col("passed").cast("int"))).head().getInt(0) == 1
}
