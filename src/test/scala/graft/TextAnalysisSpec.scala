package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions.{col, lit, md5, regexp_count}

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

  test("duplicateLineFraction: repeated lines counted, single-line is 0") {
    def f(t: String) = one(t, TextAnalysis.duplicateLineFraction(col("text"))).getDouble(0)
    assert(f("only one line") == 0.0)
    assert(f("a\nb\nc") == 0.0)
    assert(f("spam\nspam\nspam\nspam") == 0.75) // 4 lines, 1 distinct
    assert(f("a\nb\na\nb") == 0.5)
    assert(f("") == 0.0)
  }

  test("topBigramFraction: Gopher top-2-gram rule, exact on planted repetition") {
    def f(t: String) = one(t, TextAnalysis.topBigramFraction(col("text"))).getDouble(0)
    assert(f("") == 0.0)
    assert(f("single") == 0.0) // <2 tokens
    assert(f("click here click here click here") == 0.6) // 5 bigrams, "click here" x3
    assert(f("a b c d e") == 0.25) // 4 distinct bigrams, max run 1
    assert(f("x y x y x y x y") == math.floor(4.0 / 7.0 * 10000 + 0.5) / 10000) // "x y" 4 of 7
  }

  test("redactPii: planted email/IP/phone replaced; expected outputs cross-checked vs RE2") {
    def f(t: String) = one(t, TextAnalysis.redactPii(col("text"))).getString(0)
    // expected strings were produced by the SAME patterns under DuckDB's
    // RE2 — asserting them here pins the Java-regex/RE2 agreement the
    // oracle twin relies on
    assert(f("contact me at john.doe+x@example.co.uk or 192.168.1.4 now")
      == "contact me at [EMAIL] or [IP] now")
    assert(f("call 415-555-2671 or +1 415 555 2671 end")
      == "call [PHONE] or [PHONE] end")
    assert(f("v 1.2.3 2026-01-02 ok") == "v 1.2.3 2026-01-02 ok") // versions/dates untouched
    assert(f("big 123456789012 run") == "big 123456789012 run") // digit runs untouched
    assert(f("no pii at all") == "no pii at all")
  }

  test("piiCounts: per-class counts on original text, no double counting") {
    val (em, ip, ph) = TextAnalysis.piiCounts(col("text"))
    val r = Seq("a@b.com c@d.org 10.0.0.1 415-555-2671 x").toDF("text")
      .select(em.as("e"), ip.as("i"), ph.as("p")).collect()(0)
    assert((r.getInt(0), r.getInt(1), r.getInt(2)) == ((2, 1, 1)))
    // dotted digits inside an email must not count as an IP
    val r2 = Seq("user.1.2.3.4@host.com only").toDF("text")
      .select(em.as("e"), ip.as("i"), ph.as("p")).collect()(0)
    assert((r2.getInt(0), r2.getInt(1), r2.getInt(2)) == ((1, 0, 0)))
  }

  test("scriptCounts/dominantScript classify planted multilingual text; ties and none pinned") {
    def dom(t: String) = one(t, TextAnalysis.dominantScript(col("text"))).getString(0)
    assert(dom("hello world") === "latin")
    assert(dom("你好世界 ok") === "cjk")        // 4 CJK chars beat 2 latin
    assert(dom("привет hi") === "cyrillic")
    assert(dom("مرحبا") === "arabic")
    assert(dom("नमस्ते") === "devanagari")
    assert(dom("12345 !!! ...") === "none")
    assert(dom("") === "none")
    // tie goes to the earlier ScriptRanges class: 2 latin vs 2 cjk -> latin
    assert(dom("ab 你好") === "latin")
    val counts = Seq("a你пمन").toDF("text")
      .select(TextAnalysis.scriptCounts(col("text")).map { case (n, c) => c.as(n) }: _*)
      .collect()(0)
    assert((0 until 5).map(counts.getInt) === Seq(1, 1, 1, 1, 1))
  }

  test("ScriptProfile single-pass == the five regexp_counts it replaced") {
    // parity fuzz against the RE2-shared regex formulation, including
    // the chars that distinguish a char walk from a code-point regex:
    // supplementary plane (surrogate pairs — neither side counts them),
    // boundary code points of each range, and the multiplication sign
    // U+00D7 (inside latin's 00C0-024F block by design)
    val texts = Seq(
      "hello world", "你好 ok", "привет", "مرحبا", "नमस्ते", "", "12 !!",
      "😀 emoji 𪀀", // U+1F600, U+2A000 (CJK ext B — NOT counted)
      "Àɏɐ", "一鿿ꀀ", "぀ヿ㄀",
      "가힯ힰ", "ЀӿԀ", "؀ۿ܀",
      "ऀॿঀ", "a×b", "mixed 你 п م न text")
    val df = texts.toDF("text")
    val regexSide = TextAnalysis.ScriptRanges.map { case (n, re) =>
      regexp_count(col("text"), lit(re)).cast("int").as(n)
    }
    val walkSide = TextAnalysis.scriptCounts(col("text")).map { case (n, c) =>
      c.as(s"w_$n")
    }
    df.select(regexSide ++ walkSide: _*).collect().foreach { r =>
      (0 until 5).foreach(i => assert(r.getInt(i) === r.getInt(i + 5), r.toString))
    }
    // null text: counts null, label 'none' — the regex chain's
    // historical fallthrough, preserved by the coalesce
    val nr = Seq[Option[String]](None).toDF("text")
      .select(TextAnalysis.dominantScript(col("text")).as("s"),
        TextAnalysis.scriptCounts(col("text")).head._2.as("latin")).collect()(0)
    assert(nr.getString(0) === "none" && nr.isNullAt(1))
  }

  test("canonicalText: NFC unifies composed and decomposed forms; ASCII untouched") {
    val composed = "Caf\u00e9  CR\u00c8ME"       // precomposed e-acute / E-grave
    val decomposed = "Cafe\u0301  CRE\u0300ME"   // e + combining acute / grave
    val got = Seq((1L, composed), (2L, decomposed), (3L, "plain  ascii "))
      .toDF("id", "text")
      .select($"id", TextAnalysis.canonicalText($"text").as("c"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) === got(2L), "composed and decomposed must canonicalize identically")
    assert(got(1L) === "café crème")
    assert(got(3L) === "plain ascii")
    // and therefore fingerprints agree — the dedup-robustness point
    val fps = Seq((1L, composed), (2L, decomposed)).toDF("id", "text")
      .select(md5(TextAnalysis.canonicalText($"text").cast("binary")).as("fp"))
      .as[String].collect()
    assert(fps.distinct.length === 1)
    // null propagates
    val n = Seq(Option.empty[String]).toDF("text")
      .select(TextAnalysis.canonicalText($"text")).collect()(0)
    assert(n.isNullAt(0))
  }

  test("stripMarkup: subtrees die with content, tags/comments/entities resolve") {
    def strip(s: String): String =
      Seq(s).toDF("text").select(TextAnalysis.stripMarkup($"text")).as[String].collect().head
    assert(strip("<p>hello <b>world</b></p>") === "hello world")
    assert(strip("<SCRIPT>var hidden = 'secret';</SCRIPT>visible") === "visible",
      "script CONTENT is removed, case-insensitively")
    assert(strip("<style media=\"all\">p {\n  color: red\n}</style>kept") === "kept",
      "multiline style subtree with attributes dies")
    assert(strip("a<!-- note\nspanning lines -->b") === "a b")
    assert(strip("x &amp;&nbsp;&lt;tag&gt; &quot;q&quot; &#39;s&#39;") === "x & <tag> \"q\" 's'")
    assert(strip("  lots   of\n\n whitespace ") === "lots of whitespace")
  }

  test("dedupLines: first occurrence survives in order; CRLF equals LF; blanks structural") {
    def dl(s: String): String =
      Seq(s).toDF("text").select(TextAnalysis.dedupLines($"text")).as[String].collect().head
    assert(dl("nav\nbody one\nnav\nbody two\nnav") === "nav\nbody one\nbody two")
    assert(dl("line\r\nline\nother") === "line\nother",
      "a CRLF copy of an LF line is the same line")
    assert(dl("a\n\nb\n\nc") === "a\n\nb\n\nc",
      "blank lines are paragraph separators — every occurrence survives")
    assert(dl("a\n  \nb\n  \nc") === "a\n  \nb\n  \nc",
      "spaces-only lines are blank too")
    assert(dl("a\n\t\nb\n\t\nc") === "a\n\t\nb\nc", // tab is content, not blank
      "non-space whitespace lines still dedup (same key rule as stripBoilerplateLines)")
    assert(dl("") === "")
    assert(dl("single") === "single")
    val n = Seq(Option.empty[String]).toDF("text")
      .select(TextAnalysis.dedupLines($"text")).collect()(0)
    assert(n.isNullAt(0), "null propagates")
    // codegen and interpreted agree
    val df = Seq("x\ny\nx", "q").toDF("text")
    val gen = df.select(TextAnalysis.dedupLines($"text")).as[String].collect().toSeq
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interp = df.select(TextAnalysis.dedupLines($"text")).as[String].collect().toSeq
      assert(gen === interp)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("fixMojibake repairs real corruption and refuses lookalikes") {
    import graft.functions.FixMojibake
    def moji(s: String): String =
      new String(s.getBytes("UTF-8"), java.nio.charset.Charset.forName("windows-1252"))
    def fix1(s: String): String =
      Seq(s).toDF("t").select(TextAnalysis.fixMojibake($"t")).as[String].head()
    def mojiLatin1(s: String): String = new String(s.getBytes("UTF-8"), "ISO-8859-1")
    // the classic: é, curly open-quote, em-dash, € — each through the
    // REAL encode/mis-decode round-trip (cp1252 upstream)
    for (clean <- Seq("café au lait", "it’s “quoted — fine", "€99", "über señor"))
      assert(fix1(moji(clean)) === clean, s"repair of ${moji(clean)}")
    // latin-1 upstream: UTF-8 tail bytes land in the C1 control range
    // instead of cp1252 glyphs — the other common corruption, incl. ”
    // (whose 0x9D byte cp1252 cannot even represent)
    for (clean <- Seq("it’s “quoted” — fine", "naïve — résumé"))
      assert(fix1(mojiLatin1(clean)) === clean, s"latin-1 repair of $clean")
    // a cp1252-mis-decoded ” produced U+FFFD: information destroyed,
    // honestly unrepairable — must stay untouched, never guessed at
    val lossy = moji("“quoted”")
    assert(lossy.contains('�') && fix1(lossy) === lossy)
    // double-encoded repairs in two passes
    assert(fix1(moji(moji("café"))) === "café")
    // legitimate text is untouched: 'Ã'+consonant is invalid UTF-8
    for (legit <- Seq("São Paulo", "plain ascii", "café", "Ÿ alone", "年 CJK",
                      "emoji 😀 text"))
      assert(fix1(legit) === legit, s"must not touch '$legit'")
    // null propagates; empty unchanged
    val n = Seq(Option.empty[String]).toDF("t")
      .select(TextAnalysis.fixMojibake($"t")).collect()(0)
    assert(n.isNullAt(0))
    assert(fix1("") === "")
  }

  test("stripInvisible removes format controls, normalizes exotic spaces, leaves clean text") {
    def strip1(s: String): String =
      Seq(s).toDF("t").select(TextAnalysis.stripInvisible($"t")).as[String].head()
    assert(strip1("a​b‌c‍d﻿e­f") === "abcdef",
      "zero-widths, BOM, soft hyphen vanish")
    assert(strip1("a b c d　e") === "a b c d e",
      "NBSP, em-space, narrow NBSP, ideographic space -> plain space")
    assert(strip1("already clean text") === "already clean text")
    // the dedup consequence: invisibly-different strings now fingerprint equal
    val fp = Seq("same text", "same text​").toDF("t")
      .select(md5(TextAnalysis.stripInvisible($"t").cast("binary"))).as[String].collect()
    assert(fp(0) === fp(1))
  }

  test("trigram langId: trained rank profiles beat the marker heuristic on short marker-free text") {
    // training corpus: distinctive trigram distributions per language,
    // long enough to fill real profiles
    val train = Seq(
      ("en", "the shipping dock handles the heavy weather with the working crew on the long night watch"),
      ("en", "this thing that brings light through the things we think with strength and length"),
      ("de", "schmetterlinge flattern durch zwischen bluehenden wiesen waehrend schoene voegel zwitschern"),
      ("de", "schnell schreiben schoene schueler schwierige woerter zwischendurch mit schwung"),
      ("fr", "beaucoup de choses heureuses arrivent chaque jour aux gens qui cherchent toujours"),
      ("fr", "quelques oiseaux chantent joyeusement pres des eaux fraiches chaque matin")
    ).toDF("lang", "text")
    val model = TextAnalysis.trainTrigramLangId(train, col("text"), col("lang"),
      topK = 200, docTopK = 100)
    assert(model.langs.toSeq === Seq("de", "en", "fr"), "sorted tie-break order")
    // SHORT texts with ZERO marker words — the old heuristic's blind
    // spot: every marker intersection is 0, so it ties to 'en'
    val probes = Seq(
      (1L, "schwierige schmetterlinge zwischen", "de"),
      (2L, "chaque oiseau heureux cherche toujours", "fr"),
      (3L, "strength through thinking things", "en"))
    val df = probes.map { case (i, t, _) => (i, t) }.toDF("id", "text")
    val got = df.select(col("id"),
        TextAnalysis.langIdTrigram(col("text"), model).as("tri"),
        TextAnalysis.langId(col("text")).as("marker"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    probes.foreach { case (i, _, want) =>
      assert(got(i)._1 === want, s"trigram model must identify probe $i")
    }
    // the documented failure the upgrade exists for: marker heuristic
    // calls the de/fr probes 'en' (no markers -> 0-0-0 tie)
    assert(got(1L)._2 === "en" && got(2L)._2 === "en")
    // determinism edges: empty and sub-trigram texts -> first sorted lang
    val edge = Seq((1L, ""), (2L, "ab")).toDF("id", "text")
      .select(TextAnalysis.langIdTrigram(col("text"), model)).collect()
    assert(edge.forall(_.getString(0) == "de"))
    // codegen and interpreted agree (the repo-wide expression contract)
    val prev = spark.conf.getOption("spark.sql.codegen.wholeStage")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val interp = df.select(TextAnalysis.langIdTrigram(col("text"), model))
        .collect().map(_.getString(0))
      assert(interp.toSeq === probes.map(_._3))
    } finally prev.foreach(spark.conf.set("spark.sql.codegen.wholeStage", _))
  }

  test("trigram langId save/load: a loaded model predicts bit-identically") {
    val train = Seq(
      ("en", "the shipping dock handles the heavy weather with the working crew"),
      ("de", "schmetterlinge flattern zwischen bluehenden wiesen mit schwung"),
      ("fr", "beaucoup de choses heureuses arrivent chaque jour aux gens")
    ).toDF("lang", "text")
    val model = TextAnalysis.trainTrigramLangId(train, col("text"), col("lang"),
      topK = 150, docTopK = 80)
    val path = java.nio.file.Files.createTempDirectory("graft_langid").toString + "/model"
    TextAnalysis.saveTrigramLangId(spark, model, path)
    val loaded = TextAnalysis.loadTrigramLangId(spark, path)
    assert(loaded.langs.toSeq === model.langs.toSeq)
    assert(loaded.penalty === model.penalty && loaded.docTopK === model.docTopK)
    val probes = Seq((1L, "zwischen schmetterlinge"), (2L, "the working weather"),
      (3L, "chaque jour heureux"), (4L, ""), (5L, "xq")).toDF("id", "text")
    val a = probes.select(TextAnalysis.langIdTrigram(col("text"), model)).collect().map(_.getString(0))
    val b = probes.select(TextAnalysis.langIdTrigram(col("text"), loaded)).collect().map(_.getString(0))
    assert(a.toSeq === b.toSeq)
  }

  test("pseudonymizeEmails: stable linkable tokens, salt re-keys, non-matches untouched") {
    def run(t: String, salt: String = "s"): String =
      Seq(t).toDF("t").select(TextAnalysis.pseudonymizeEmails(col("t"), salt))
        .collect()(0).getString(0)
    // same identity -> same token, across positions and documents
    val one = run("write a@b.co or a@b.co again")
    val tok = "\\[EMAIL:[0-9a-f]{8}\\]".r.findAllIn(one).toSeq
    assert(tok.size === 2 && tok.distinct.size === 1, one)
    assert(one === s"write ${tok.head} or ${tok.head} again")
    // different identities -> different tokens
    val two = "\\[EMAIL:[0-9a-f]{8}\\]".r.findAllIn(run("a@b.co c@d.org")).toSeq
    assert(two.distinct.size === 2)
    // salt rotation re-keys the space
    assert(run("a@b.co", "s1") !== run("a@b.co", "s2"))
    // raw address never survives; text ending with a match reassembles
    assert(!run("end with a@b.co").contains("a@b.co"))
    // no-match text passes through unchanged
    assert(run("no pii here 1.2") === "no pii here 1.2")
  }

  test("chunkText: overlap reconstruction, boundary counts, short/empty docs") {
    val d = Seq(
      (1L, "a" * 1000),   // 1 + ceil(600/320) = 3 chunks
      (2L, "b" * 400),    // exactly size -> 1 chunk
      (3L, "c" * 401),    // one past size -> 2 chunks (second is 81 chars)
      (4L, "short"),      // under size -> 1 chunk
      (5L, "")            // empty -> 1 empty chunk
    ).toDF("doc_id", "text")
    val out = TextAnalysis.chunkText(d, "doc_id", "text", size = 400, overlap = 80)
      .orderBy("doc_id", "chunk_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(out.count(_._1 == 1L) === 3 && out.count(_._1 == 2L) === 1 &&
      out.count(_._1 == 3L) === 2 && out.count(_._1 == 4L) === 1 &&
      out.count(_._1 == 5L) === 1)
    // offsets stride by 320, end-exclusive, last chunk clipped to len
    assert(out.filter(_._1 == 1L).map(t => (t._3, t._4)).toSeq ===
      Seq((0L, 400L), (320L, 720L), (640L, 1000L)))
    assert(out.find(t => t._1 == 3L && t._2 == 1L).get._5 === "c" * 81)
    assert(out.find(_._1 == 4L).get._5 === "short")
    assert(out.find(_._1 == 5L).get match { case (_, i, s, e, c) =>
      i == 0L && s == 0L && e == 0L && c == "" })
    // every chunk's text is exactly the substring at its offsets, and
    // consecutive chunks overlap by exactly 80 where both are full
    out.filter(_._1 == 1L).foreach { case (_, _, s, e, c) =>
      assert(c === ("a" * 1000).substring(s.toInt, e.toInt)) }
  }

  test("classTopTerms: c-TF-IDF ranks class-exclusive terms above shared ones; " +
    "counts path agrees with the occurrence path") {
    // class A: 'apple' x3 exclusive, 'the' x4 shared; class B: 'boat' x2
    // exclusive, 'the' x1. Exclusive terms score ln(1+2/1)=ln 3 per hit,
    // shared 'the' only ln(1+2/2)=ln 2 — apple must outrank the in A.
    val toks = Seq(
      ("A", "apple"), ("A", "apple"), ("A", "apple"),
      ("A", "the"), ("A", "the"), ("A", "the"), ("A", "the"),
      ("B", "boat"), ("B", "boat"), ("B", "the")
    ).toDF("cls", "token")
    val out = TextAnalysis.classTopTerms(toks, "cls", "token", 2)
      .orderBy("cls", "rk").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getDouble(3)))
    assert(out.map(t => (t._1, t._2, t._3)).toSeq ===
      Seq(("A", 1, "apple"), ("A", 2, "the"), ("B", 1, "boat"), ("B", 2, "the")))
    assert(out(0)._4 === math.rint(3 * math.log(3.0) * 1e6) / 1e6)
    // pre-counted variant reproduces the same report exactly
    val tf = toks.groupBy($"cls", $"token").count().withColumnRenamed("count", "tf")
    val fromCounts = TextAnalysis.classTopTermsFromCounts(tf, "cls", "token", "tf", 2,
        toks.agg(org.apache.spark.sql.functions.count_distinct($"cls").as("n_classes")))
      .orderBy("cls", "rk").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getDouble(3)))
    assert(fromCounts.toSeq === out.toSeq)
  }

  test("piiNerCounts: checksum-valid entities count, one-digit-corrupted twins do not") {
    def counts(texts: Seq[String]): Seq[(Long, Long, Long, Long)] = {
      val (n, a, c, i) = TextAnalysis.piiNerCounts($"t")
      texts.toDF("t").select(n.cast("long"), a.cast("long"),
          c.cast("long"), i.cast("long")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    }
    val got = counts(Seq(
      "card 4111 1111 1111 1111 and card 5500-0000-0000-0004 on file",  // 2 Luhn-valid
      "card 4111 1111 1111 1112 rejected",                               // corrupt twin
      "send to DE89370400440532013000 or GB82WEST12345698765432",        // 2 valid ibans
      "send to DE89370400440532013001 instead",                          // corrupt twin
      "ask Alice Johnson or Peter Smith; grace period applies",          // 2 names; lowercase 'grace' not one
      "Ship to 742 Maple Street or 9 Old Mill Road"))                    // 2 addresses
    assert(got(0) === ((0L, 0L, 2L, 0L)))
    assert(got(1) === ((0L, 0L, 0L, 0L)), "Luhn must reject the corrupted card")
    assert(got(2) === ((0L, 0L, 0L, 2L)))
    assert(got(3) === ((0L, 0L, 0L, 0L)), "mod-97 must reject the corrupted iban")
    assert(got(4) === ((2L, 0L, 0L, 0L)))
    assert(got(5) === ((0L, 2L, 0L, 0L)))
  }

  test("piiNerCounts negatives: dates, versions, and digit runs survive untouched") {
    val (n, a, c, i) = TextAnalysis.piiNerCounts($"t")
    val got = Seq(
      "released 2026-01-02, updated 2026-08-16 09:30",
      "version 2.0.1 build 4711 at 1234 5678",     // too few digit groups for a card
      "serial 123456789012 and 12345678901234567890", // bare runs: no 4-4-4-n grouping
      "Emma went home; emma lowercase never fires alone",
      "42 is not an address; neither is 10 Downing")   // no street-suffix token
      .toDF("t")
      .select(n.cast("long") + a.cast("long") + c.cast("long") + i.cast("long"))
      .collect().map(_.getLong(0))
    assert(got.forall(_ === 0L), s"false positives: ${got.toSeq}")
  }

  test("detectLicense: every canonical header resolves to its id; SPDX tag beats header prose") {
    def detect(texts: Seq[String]): Seq[(String, String, String)] = {
      val (id, fam, via) = TextAnalysis.detectLicense($"t")
      texts.toDF("t").select(id.as("i"), fam.as("f"), via.as("v"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    }
    val headerCases = Seq(
      "Permission is hereby granted, free of charge, to any person obtaining a copy of this code." -> ("MIT", "permissive"),
      "licensed under the apache license, version 2.0 (the License)" -> ("Apache-2.0", "permissive"),
      "under the terms of the GNU General Public License, either version 3 of the License" -> ("GPL-3.0", "copyleft"),
      "under the GNU General Public License; version 2 applies" -> ("GPL-2.0", "copyleft"),
      "covered by the GNU Affero General Public License version 3" -> ("AGPL-3.0", "copyleft"),
      "the GNU Lesser General Public License version 2.1 applies" -> ("LGPL", "copyleft"),
      "Redistribution and use in source and binary forms are fine, but never to endorse or promote products." -> ("BSD-3-Clause", "permissive"),
      "Redistribution and use in source and binary forms, with or without modification." -> ("BSD-2-Clause", "permissive"),
      "subject to the Mozilla Public License, v. 2.0 as distributed" -> ("MPL-2.0", "copyleft"),
      "Permission to use, copy, modify, and distribute this software for any purpose" -> ("ISC", "permissive"),
      "this is free and unencumbered software released into the public domain" -> ("Unlicense", "permissive"),
      "the author has waived all copyright and related or neighboring rights" -> ("CC0-1.0", "permissive"))
    val got = detect(headerCases.map(_._1))
    headerCases.zip(got).foreach { case ((txt, (wantId, wantFam)), (i, f, v)) =>
      assert((i, f, v) === ((wantId, wantFam, "header")), s"for header: $txt")
    }
    // SPDX precedence: tag wins over a contradicting header; unknown
    // SPDX ids keep the id but classify unknown; variant ids hit the
    // prefix family rule
    val spdx = detect(Seq(
      "// SPDX-License-Identifier: GPL-3.0-or-later\nPermission is hereby granted, free of charge, to any person obtaining a copy.",
      "# SPDX-License-Identifier: MyCorp-1.0\nsome proprietary notice",
      "/* SPDX-License-Identifier: LGPL-2.1-only */",
      "SPDX-License-Identifier: 0BSD"))
    assert(spdx(0) === (("GPL-3.0-or-later", "copyleft", "spdx")))
    assert(spdx(1) === (("MyCorp-1.0", "unknown", "spdx")))
    assert(spdx(2) === (("LGPL-2.1-only", "copyleft", "spdx")))
    assert(spdx(3) === (("0BSD", "permissive", "spdx")))
  }

  test("detectLicense negatives: licence-adjacent prose never matches; NONE/unknown/none default") {
    val (id, fam, via) = TextAnalysis.detectLicense($"t")
    val got = Seq(
      "He obtained a driving license, version 2.0 of the form.",
      "the general public was granted free admission to the library",
      "redistribution of this article in any form requires permission",
      "public domain data from the census bureau",
      "SPDX-License-Identifier missing its colon MIT",
      "").toDF("t")
      .select(id.as("i"), fam.as("f"), via.as("v")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(got.forall(_ === (("NONE", "unknown", "none"))),
      s"false positives: ${got.toSeq}")
  }
}
