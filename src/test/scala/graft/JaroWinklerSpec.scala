package graft

import graft.functions.JaroWinkler
import org.apache.spark.sql.functions._

class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  // reference values cross-checked against DuckDB's independent
  // implementation of the same published metric
  private val cases = Seq(
    ("MARTHA", "MARHTA", 0.9611111111111111),
    ("DIXON", "DICKSONX", 0.8133333333333332),
    ("JELLYFISH", "SMELLYFISH", 0.8962962962962964),
    ("DWAYNE", "DUANE", 0.8400000000000001),
    ("CRATE", "TRACE", 0.7333333333333334), // jaro > 0.7 but prefix 0
    ("aaapppp", "ap", 0.7857142857142857),
    ("abcdefgh", "abzzzzzz", 0.5), // prefix 2 but jaro <= 0.7: no boost
    ("prefixxx", "prefiyyy", 0.85), // 5-char prefix capped at 4
    ("abc", "abc", 1.0),
    ("abc", "", 0.0), ("", "", 0.0), ("a", "b", 0.0))

  test("reference values (driver-side)") {
    cases.foreach { case (a, b, want) =>
      assert(math.abs(JaroWinkler.similarity(a, b) - want) < 1e-12, s"jw($a, $b)")
      assert(math.abs(JaroWinkler.similarity(b, a) - want) < 1e-12, s"jw($b, $a) symmetric")
    }
  }

  test("expression path under codegen matches; null propagates; SQL registration") {
    val df = cases.map(c => (c._1, c._2)).toDF("a", "b")
    val got = df.select(JaroWinkler(col("a"), col("b")).as("jw"))
      .as[Double].collect()
    cases.map(_._3).zip(got).foreach { case (w, g) => assert(math.abs(w - g) < 1e-12) }
    val r = Seq((Some("x"), None: Option[String])).toDF("a", "b")
      .select(JaroWinkler(col("a"), col("b"))).collect()
    assert(r(0).isNullAt(0))
    graft.functions.GraftFunctions.registerAll(spark)
    assert(spark.sql("SELECT graft_jaro_winkler('MARTHA', 'MARHTA')")
      .head().getDouble(0) > 0.96)
  }
}
