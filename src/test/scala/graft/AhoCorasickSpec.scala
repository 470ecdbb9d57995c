package graft

import graft.functions.{AcAutomaton, AcGazetteerNameCount, AcWholeWordCount}
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** The automaton forms must be EXACTLY the regex forms' semantics —
  * txt_pii_ner's production path runs the automaton while its DuckDB
  * twin replays the regex, so any divergence is an oracle red. The
  * randomized cases are the proof the equivalence argument (leftmost
  * consumption + prefix-free dictionary + boundary checks) holds
  * beyond the hand-picked fixtures. */
class AhoCorasickSpec extends SparkSpec {
  import spark.implicits._

  private val gaz = TextAnalysis.FirstNameGazetteer

  private def regexNameCount(texts: Seq[String]): Seq[Int] =
    texts.toDF("t")
      .select(regexp_count($"t", lit(TextAnalysis.NameRe)).cast("int"))
      .collect().map(_.getInt(0)).toSeq

  private def acNameCount(texts: Seq[String]): Seq[Int] = {
    import org.apache.spark.sql.GraftColumnBridge.{column => cc, expression => ee}
    texts.toDF("t").select(cc(AcGazetteerNameCount(ee($"t"), gaz)))
      .collect().map(_.getInt(0)).toSeq
  }

  test("countNames == regexp_count(NameRe) on the boundary/consumption corner cases") {
    val cases = Seq(
      "Alice Johnson met Peter Smith",            // two plain matches
      "Emma Alice Johnson",                        // surname is itself a name: ONE match (consumption)
      "XAlice Johnson",                            // leading boundary fails
      "Alice9 Johnson",                            // name not whole-word on the right
      "Alice JOhnson",                             // surname needs [A-Z][a-z]+
      "Alice J",                                   // single-letter surname fails
      "Alice Johnson8",                            // trailing boundary fails
      "alice johnson",                             // lowercase never fires
      "Alice  Johnson",                            // double space: no match
      "Alice Johnson Alice Johnson",               // two disjoint matches
      "Grace",                                     // name with no surname at end
      "Alice\nJohnson",                            // newline is not the literal space
      "Karen Page, Frank Castle; Maria Hill.",     // punctuation boundaries
      "")
    assert(acNameCount(cases) === regexNameCount(cases))
    // and the intended positives really are positive
    assert(acNameCount(Seq(cases.head)) === Seq(2))
    assert(acNameCount(Seq(cases(1))) === Seq(1))
  }

  test("countNames == regexp_count(NameRe) on 300 randomized texts") {
    val rnd = new scala.util.Random(20260816L)
    val vocab: Array[String] = (gaz ++ Seq("Johnson", "Smith", "the", "ran",
      "quick", "Zebra", "B", "x9", "alice", "OAlice", "42", ",", ".", "-",
      "Mc", "O", "st")).toArray
    val texts = (1 to 300).map { _ =>
      (1 to (2 + rnd.nextInt(18))).map(_ => vocab(rnd.nextInt(vocab.length)))
        .mkString(if (rnd.nextBoolean()) " " else rnd.nextInt(3) match {
          case 0 => " "
          case 1 => "  "
          case _ => ", "
        })
    }
    val got = acNameCount(texts)
    val want = regexNameCount(texts)
    val diffs = texts.zip(got.zip(want)).filter { case (_, (g, w)) => g != w }
    assert(diffs.isEmpty, s"first divergences: ${diffs.take(3)}")
    assert(want.sum > 50, "the generator must actually produce matches")
  }

  test("countWholeWords == regexp_count of the boundary-anchored alternation; overlap consumed") {
    val dict = Seq("ban", "banana", "nan") // deliberately NOT prefix-free: whole-word counting is still well-defined
    val ac = new AcAutomaton(dict.toArray)
    val re = "\\b(" + dict.mkString("|") + ")\\b"
    val cases = Seq(
      "ban banana nan", "a ban x", "banana", "bananan", "urban nan",
      "ban,banana", "", "nan nan nan")
    val want = cases.toDF("t").select(regexp_count($"t", lit(re)).cast("int"))
      .collect().map(_.getInt(0)).toSeq
    assert(cases.map(ac.countWholeWords) === want)
    // and through the expression (codegen path)
    import org.apache.spark.sql.GraftColumnBridge.{column => cc, expression => ee}
    val viaExpr = cases.toDF("t").select(cc(AcWholeWordCount(ee($"t"), dict)))
      .collect().map(_.getInt(0)).toSeq
    assert(viaExpr === want)
  }

  test("suffix-nested dictionary: a shorter suffix pattern rescues a boundary-failed longer one") {
    // the advisor's exact masking case: "free software" ends where
    // "software" ends; the longer candidate fails the left boundary in
    // "unfree software" but the regex still counts the shorter — a
    // longest-only output table returned 0 here
    val dict = Seq("free software", "software")
    val ac = new AcAutomaton(dict.toArray)
    val re = "\\b(" + dict.mkString("|") + ")\\b"
    val cases = Seq(
      "unfree software", "free software", "software", "the software is free",
      "unfree software and free software", "freesoftware", "unfree softwares")
    val want = cases.toDF("t").select(regexp_count($"t", lit(re)).cast("int"))
      .collect().map(_.getInt(0)).toSeq
    assert(cases.map(ac.countWholeWords) === want)
    assert(ac.countWholeWords("unfree software") === 1)
  }

  test("countWholeWords == regexp_count on 300 randomized texts over a suffix-nested multi-word dict") {
    val dict = Seq("free software", "software", "open source", "source",
      "data set", "set", "big data set")
    val ac = new AcAutomaton(dict.toArray)
    val re = "\\b(" + dict.sortBy(-_.length).mkString("|") + ")\\b"
    val rnd = new scala.util.Random(20260817L)
    val vocab = Array("free", "software", "open", "source", "data", "set",
      "big", "unfree", "softwares", "x", "reset", "sets", ",", "dataset")
    val texts = (1 to 300).map { _ =>
      (1 to (2 + rnd.nextInt(14))).map(_ => vocab(rnd.nextInt(vocab.length)))
        .mkString(" ")
    }
    val want = texts.toDF("t").select(regexp_count($"t", lit(re)).cast("int"))
      .collect().map(_.getInt(0)).toSeq
    val got = texts.map(ac.countWholeWords)
    val diffs = texts.zip(got.zip(want)).filter { case (_, (g, w)) => g != w }
    assert(diffs.isEmpty, s"first divergences: ${diffs.take(3)}")
    assert(want.sum > 100, "the generator must actually produce matches")
  }

  test("countNames: a suffix-nested gazetteer entry rescues a boundary-failed longer candidate") {
    // multi-token gazetteer names pass the prefix-free require; the scan
    // must still fall through to the shorter suffix candidate when the
    // longer one fails its left boundary (the same masking class)
    val gaz2 = Seq("Mary Ann", "Ann")
    import org.apache.spark.sql.GraftColumnBridge.{column => cc, expression => ee}
    def count(texts: Seq[String]): Seq[Int] =
      texts.toDF("t").select(cc(AcGazetteerNameCount(ee($"t"), gaz2)))
        .collect().map(_.getInt(0)).toSeq
    assert(count(Seq("XMary Ann Smith")) === Seq(1))  // "Ann Smith" still counts
    assert(count(Seq("Mary Ann Smith")) === Seq(1))   // longest wins once
    assert(count(Seq("xann Smith")) === Seq(0))       // lowercase+joined: neither
  }

  test("interpreted eval agrees with the DataFrame (codegen) path; prefix violations fail loud") {
    val ac = new AcAutomaton(gaz.toArray)
    val texts = Seq("Alice Johnson and Emma Stone", "nothing here", "Peter Parker")
    assert(texts.map(ac.countNames) === acNameCount(texts))
    val e = intercept[IllegalArgumentException] {
      import org.apache.spark.sql.GraftColumnBridge.{expression => ee}
      // EAGER: construction itself must throw (plan-build time), not the
      // first task that forces the lazy automaton
      AcGazetteerNameCount(ee(lit("x")), Seq("Ann", "Anna"))
    }
    assert(e.getMessage.contains("prefix-free"))
  }
}
