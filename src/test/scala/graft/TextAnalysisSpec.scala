package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions.col

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](text: String, c: org.apache.spark.sql.Column): org.apache.spark.sql.Row =
    Seq(text).toDF("text").select(c.as("v")).collect()(0)

  test("tokenCount: blank is 0, whitespace runs collapse") {
    assert(one("", TextAnalysis.tokenCount(col("text"))).getInt(0) == 0)
    assert(one("   ", TextAnalysis.tokenCount(col("text"))).getInt(0) == 0)
    assert(one("a  b\t c\nd", TextAnalysis.tokenCount(col("text"))).getInt(0) == 4)
  }

  test("regexTokenCount splits letter runs, digit runs, symbols") {
    assert(one("ab12-cd", TextAnalysis.regexTokenCount(col("text"))).getInt(0) == 4)
  }

  test("fingerprint is invariant to case, punctuation, extra whitespace") {
    val df = Seq("Hello,  World!", "hello world", "HELLO   world.").toDF("text")
      .select(TextAnalysis.fingerprint(col("text")).as("fp")).as[String].collect()
    assert(df.distinct.length == 1)
  }

  test("langId picks the language with most marker hits") {
    assert(one("the cat is on the mat and happy", TextAnalysis.langId(col("text"))).getString(0) == "en")
    assert(one("der hund und die katze ist ein tier", TextAnalysis.langId(col("text"))).getString(0) == "de")
    assert(one("le chat est un animal et la mer", TextAnalysis.langId(col("text"))).getString(0) == "fr")
  }

  test("quality score stays in [0,1]") {
    val texts = Seq("", "a", "the a of to in is it and or", ("word " * 100).trim)
    val scores = texts.toDF("text")
      .select(TextAnalysis.qualityScore(col("text")).as("q")).as[Double].collect()
    scores.foreach(q => assert(q >= 0.0 && q <= 1.0))
  }
}
