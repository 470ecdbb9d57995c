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
    ("abc", "", 0.0), ("", "", 0.0), ("a", "b", 0.0),
    // ODD mismatch count: floored transpositions (t=3 -> T=1), the case
    // that distinguishes the rapidfuzz/DuckDB convention from the
    // fractional textbook form
    ("Customer#000000312", "Customer#000010320", 0.9888888888888889))

  test("reference values (driver-side)") {
    cases.foreach { case (a, b, want) =>
      assert(math.abs(JaroWinkler.similarity(a, b) - want) < 1e-12, s"jw($a, $b)")
      assert(math.abs(JaroWinkler.similarity(b, a) - want) < 1e-12, s"jw($b, $a) symmetric")
    }
  }

  test("Damerau-Levenshtein: unrestricted transpositions, reference values") {
    import graft.functions.DamerauLevenshtein.distance
    // CA->ABC = 2 distinguishes TRUE D-L from the restricted/OSA variant (3)
    assert(distance("CA", "ABC") === 2)
    assert(distance("abcdef", "abcfed") === 2)
    assert(distance("kitten", "sitting") === 3)
    assert(distance("", "abc") === 3 && distance("abc", "") === 3)
    assert(distance("ab", "ba") === 1)
    assert(distance("teh", "the") === 1)
    assert(distance("same", "same") === 0)
    // symmetry on random strings + upper bound by levenshtein semantics
    val rnd = new scala.util.Random(3)
    for (_ <- 1 to 200) {
      val a = rnd.alphanumeric.take(rnd.nextInt(8)).mkString
      val b = rnd.alphanumeric.take(rnd.nextInt(8)).mkString
      assert(distance(a, b) === distance(b, a), s"symmetry $a/$b")
      assert(distance(a, b) <= math.max(a.length, b.length))
    }
    // expression path
    val got = Seq(("CA", "ABC")).toDF("a", "b")
      .select(graft.functions.DamerauLevenshtein(col("a"), col("b"))).head().getInt(0)
    assert(got === 2)
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

  test("Damerau-Levenshtein: document-sized inputs fail loud, not OOM") {
    import graft.functions.DamerauLevenshtein
    // just under the cap is fine (bounded by max length, not quadratic blowup)
    assert(DamerauLevenshtein.distance("a" * 100, "a" * 100) === 0)
    val big = "x" * (DamerauLevenshtein.MaxLen + 1)
    val e = intercept[IllegalArgumentException](DamerauLevenshtein.distance(big, "x"))
    assert(e.getMessage.contains("exceed"), e.getMessage)
    val e2 = intercept[IllegalArgumentException](DamerauLevenshtein.distance("x", big))
    assert(e2.getMessage.contains("graft_damerau_levenshtein"))
  }

  test("Damerau-Levenshtein cap is session-configurable; malformed values fall back") {
    import graft.functions.DamerauLevenshtein
    import org.apache.spark.sql.functions.col
    val big = "y" * (DamerauLevenshtein.MaxLen + 1)
    try {
      // raised cap: a previously-rejected length computes (read at PLAN
      // time — the expression is built inside the conf window)
      spark.conf.set(DamerauLevenshtein.MaxLenKey, (DamerauLevenshtein.MaxLen * 2).toString)
      import spark.implicits._
      val d = Seq((big, big)).toDF("a", "b")
        .select(DamerauLevenshtein(col("a"), col("b"))).head().getInt(0)
      assert(d == 0)
      // malformed value: default cap again -> the same input fails loud
      spark.conf.set(DamerauLevenshtein.MaxLenKey, "not-a-number")
      assert(DamerauLevenshtein.configuredMaxLen == DamerauLevenshtein.MaxLen)
      val e = intercept[Exception](Seq((big, big)).toDF("a", "b")
        .select(DamerauLevenshtein(col("a"), col("b"))).head())
      assert(e.getMessage != null)
    } finally spark.conf.unset(DamerauLevenshtein.MaxLenKey)
  }

}
