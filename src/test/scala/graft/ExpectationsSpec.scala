package graft

import graft.operators.Expectations
import graft.operators.Expectations._
import org.apache.spark.sql.functions._

/** Declarative data-quality checks: observed math, pass/fail ops,
  * single-pass plan, and the gate bit. */
class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, "hello", "en", 10),
    (2L, "", "en", 20),
    (2L, "world", "xx", 999),
    (4L, null.asInstanceOf[String], "de", -5)
  ).toDF("id", "text", "lang", "len")

  test("observed fractions are exact and ops compare correctly") {
    val res = Expectations.evaluate(df, Seq(
      Check("blank", blankFraction(col("text")), "<=", 0.5),
      Check("dups", duplicateFraction(col("id")), "==", 0.0),
      Check("oos", outOfSetFraction(col("lang"), Seq("en", "de")), "<=", 0.2),
      Check("oor", outOfRangeFraction(col("len").cast("double"), 0, 100), ">=", 0.5)
    )).collect().map(r => r.getString(0) -> (r.getDouble(1), r.getBoolean(4))).toMap
    assert(res("blank") === ((0.5, true)), "empty + null = 2/4")
    assert(res("dups") === ((0.25, false)), "id 2 twice: 1 - 3/4")
    assert(res("oos") === ((0.25, false)), "xx is out of set")
    assert(res("oor") === ((0.5, true)), "999 and -5 out of [0,100]")
  }

  test("all checks evaluate in ONE aggregate pass (no per-check scans)") {
    val res = Expectations.evaluate(df, Seq(
      Check("a", blankFraction(col("text")), "<=", 1.0),
      Check("b", nullFraction(col("lang")), "<=", 1.0),
      Check("c", duplicateFraction(col("id")), "<=", 1.0)
    ))
    val scans = res.queryExecution.executedPlan.toString
      .linesIterator.count(l =>
        l.contains("LocalTableScan") || l.contains("Scan ExistingRDD") || l.contains("FileScan"))
    assert(scans === 1, "N checks must not mean N scans")
  }

  test("allPassed is the conjunction; validation rejects bad specs") {
    val good = Expectations.evaluate(df, Seq(
      Check("blank", blankFraction(col("text")), "<=", 1.0)))
    assert(Expectations.allPassed(good))
    val bad = Expectations.evaluate(df, Seq(
      Check("blank", blankFraction(col("text")), "<=", 1.0),
      Check("dups", duplicateFraction(col("id")), "==", 0.0)))
    assert(!Expectations.allPassed(bad))
    intercept[IllegalArgumentException] { Check("x", lit(1.0), "<", 0.0) }
    intercept[IllegalArgumentException] {
      Expectations.evaluate(df, Seq(
        Check("same", lit(1.0), "<=", 0.0), Check("same", lit(2.0), "<=", 0.0)))
    }
    intercept[IllegalArgumentException] { Expectations.evaluate(df, Seq.empty) }
  }
}
