package graft

import graft.functions.PorterStem
import org.apache.spark.sql.functions._

class PorterStemSpec extends SparkSpec {
  import spark.implicits._

  // full-pipeline outputs from the published reference vocabulary
  private val pairs = Seq(
    "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
    "caress" -> "caress", "cats" -> "cat", "feed" -> "feed",
    "agreed" -> "agre", "plastered" -> "plaster", "motoring" -> "motor",
    "sing" -> "sing", "hopping" -> "hop", "tanned" -> "tan",
    "falling" -> "fall", "hissing" -> "hiss", "fizzed" -> "fizz",
    "failing" -> "fail", "filing" -> "file", "happy" -> "happi",
    "sky" -> "sky", "sized" -> "size", "troubled" -> "troubl",
    "conflated" -> "conflat", "denied" -> "deni", "meetings" -> "meet",
    "owned" -> "own", "humbled" -> "humbl",
    "relational" -> "relat", "conditional" -> "condit",
    "rational" -> "ration", "valenci" -> "valenc",
    "hesitanci" -> "hesit", "digitizer" -> "digit",
    "radicalli" -> "radic", "differentli" -> "differ",
    "vileli" -> "vile", "analogousli" -> "analog",
    "vietnamization" -> "vietnam", "predication" -> "predic",
    "operator" -> "oper", "feudalism" -> "feudal",
    "decisiveness" -> "decis", "hopefulness" -> "hope",
    "callousness" -> "callous", "formaliti" -> "formal",
    "sensitiviti" -> "sensit", "sensibiliti" -> "sensibl",
    "triplicate" -> "triplic", "formative" -> "form",
    "formalize" -> "formal", "hopeful" -> "hope",
    "goodness" -> "good", "revival" -> "reviv",
    "allowance" -> "allow", "inference" -> "infer",
    "airliner" -> "airlin", "gyroscopic" -> "gyroscop",
    "adjustable" -> "adjust", "defensible" -> "defens",
    "irritant" -> "irrit", "replacement" -> "replac",
    "adjustment" -> "adjust", "dependent" -> "depend",
    "adoption" -> "adopt", "communism" -> "commun",
    "activate" -> "activ", "homologous" -> "homolog",
    "effective" -> "effect", "bowdlerize" -> "bowdler",
    "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
    "roll" -> "roll", "controll" -> "control")

  test("published vocabulary pairs (driver-side)") {
    pairs.foreach { case (w, want) =>
      assert(PorterStem.stem(w) === want, s"stem($w)")
    }
  }

  test("expression path matches the driver implementation (codegen on)") {
    val df = pairs.map(_._1).toDF("w")
    val got = df.select(col("w"), PorterStem(col("w")).as("s"))
      .as[(String, String)].collect().toMap
    pairs.foreach { case (w, want) => assert(got(w) === want, s"expr stem($w)") }
  }

  test("short, non-alpha, and non-ascii inputs pass through; null in null out") {
    for (w <- Seq("ab", "a", "", "x9ing", "don't", "Motoring", "héllo", "日本語", "stem2ming"))
      assert(PorterStem.stem(w) === w, s"passthrough($w)")
    val r = Seq[Option[String]](None, Some("motoring")).toDF("w")
      .select(PorterStem(col("w"))).collect()
    assert(r(0).isNullAt(0) && r(1).getString(0) == "motor")
  }

  test("stems never grow and are stable under the engine's token stream") {
    val stems = Seq("the quick brown foxes were jumping over several lazy dogs repeatedly")
      .toDF("text")
      .select(explode(graft.operators.TextAnalysis.tokens(lower(col("text")))).as("t"))
      .select(col("t"), PorterStem(col("t")).as("s"))
      .as[(String, String)].collect()
    stems.foreach { case (t, s) =>
      assert(s.length <= t.length && s.nonEmpty, s"$t -> $s")
    }
    val m = stems.toMap
    assert(m("foxes") == "fox" && m("jumping") == "jump" && m("repeatedly") == "repeatedli")
  }
}
