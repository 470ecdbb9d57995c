package graft

import graft.functions.{ByteBpeVocab, ByteCoder}
import graft.operators.Bpe
import org.apache.spark.sql.functions._
import scala.util.Random

/** Byte-level BPE: the GPT-2 properties — the byte↔unicode map is a
  * bijection, ANY byte sequence (incl. invalid UTF-8) round-trips
  * losslessly, no OOV exists by construction, training rides the
  * existing merge loop, and the Column path plugs the tokenizer seam. */
class ByteBpeSpec extends SparkSpec {
  import spark.implicits._

  test("ByteCoder is a bijection over all 256 bytes, image is printable BMP") {
    val chars = ByteCoder.byteToChar
    assert(chars.distinct.length === 256, "injective")
    chars.foreach { c =>
      assert(!Character.isISOControl(c) && !Character.isWhitespace(c),
        s"mapped char U+${c.toInt.toHexString} must be visually safe")
    }
    val all = (0 until 256).map(_.toByte).toArray
    assert(ByteCoder.decode(ByteCoder.encode(all)).toSeq === all.toSeq)
  }

  test("property: arbitrary byte strings (incl. invalid UTF-8) round-trip losslessly") {
    for (seed <- 1 to 12) {
      val rnd = new Random(seed)
      // train on random byte words — many are invalid UTF-8 on purpose
      val dictWords = (0 until 30).map { _ =>
        val b = new Array[Byte](1 + rnd.nextInt(12)); rnd.nextBytes(b); b
      }
      val dict = dictWords.map(b => (ByteCoder.encode(b), 1L + rnd.nextInt(50)))
        .groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toArray
      val vocab = new ByteBpeVocab(
        Bpe.trainOnDict(dict, numMerges = rnd.nextInt(80), minPairCount = 1))
      // trained words AND unseen random bytes: lossless, no empty tokens
      val probes = dictWords ++ (0 until 20).map { _ =>
        val b = new Array[Byte](rnd.nextInt(20)); rnd.nextBytes(b); b
      } :+ Array[Byte](0xC3.toByte) :+ Array[Byte](0xFF.toByte, 0xFE.toByte) // truncated/illegal UTF-8
      probes.foreach { bytes =>
        val toks = vocab.encodeBytes(bytes)
        assert(vocab.decodeTokens(toks.toSeq).toSeq === bytes.toSeq,
          s"seed=$seed bytes=${bytes.toSeq}")
        assert(toks.forall(_.nonEmpty))
      }
    }
  }

  test("no OOV: an untrained vocab still encodes everything as single bytes") {
    val vocab = new ByteBpeVocab(Array.empty)
    val bytes = Array[Byte](0, 1, 127, -1, -128, 65)
    val toks = vocab.encodeBytes(bytes)
    assert(toks.length === bytes.length, "one token per byte with no merges")
    assert(vocab.decodeTokens(toks.toSeq).toSeq === bytes.toSeq)
  }

  test("trainBytes + Column seam: counts match the JVM-side vocab per row") {
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "the the the lazy dog"),
      (3L, "naïve café 日本語テスト"),
      (4L, "")).toDF("id", "text")
    val model = Bpe.trainBytes(docs, col("text"), numMerges = 30, maxWords = 100)
    assert(model.merges.nonEmpty, "corpus repetition must yield merges")
    val got = docs.select(col("id"),
        Bpe.tokenCountBytes(col("text"), model).as("n"),
        graft.operators.TextAnalysis.regexTokens(col("text")).as("words"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[String](2)))
    got.foreach { case (id, n, words) =>
      val expect = words.map(w => model.vocab.encodeString(w).length).sum
      assert(n === expect, s"row $id: Column path $n vs JVM path $expect")
    }
    // codegen and interpreted agree (the repo-wide expression contract)
    val codegenOff = spark.conf.getOption("spark.sql.codegen.wholeStage")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val interp = docs.select(Bpe.tokenCountBytes(col("text"), model)).collect().map(_.getInt(0))
      assert(interp.toSeq === got.map(_._2).toSeq)
    } finally codegenOff.foreach(spark.conf.set("spark.sql.codegen.wholeStage", _))
  }

  test("frequent pairs merge: byte-level tokens compress repeated words") {
    val docs = (1 to 50).map(i => (i.toLong, "banana banana banana split")).toDF("id", "text")
    val model = Bpe.trainBytes(docs, col("text"), numMerges = 60, maxWords = 100)
    val toks = model.vocab.encodeString("banana")
    assert(toks.length < 6, s"'banana' must compress below its 6 bytes, got ${toks.toSeq}")
  }

  test("save/load: a loaded byte model encodes bit-identically") {
    val docs = Seq((1L, "alpha beta beta gamma gamma gamma")).toDF("id", "text")
    val model = Bpe.trainBytes(docs, col("text"), numMerges = 20, maxWords = 100)
    val path = java.nio.file.Files.createTempDirectory("graft_bbpe").toString + "/model"
    Bpe.saveByteModel(spark, model, path)
    val loaded = Bpe.loadByteModel(spark, path)
    assert(loaded.merges.toSeq === model.merges.toSeq)
    val probe = "gammagamma \u0000\u0007 payload"
    assert(loaded.vocab.encodeString(probe).toSeq === model.vocab.encodeString(probe).toSeq)
  }

  test("merges.txt import: a hand-built published-format file drives the expected merges") {
    // hand-built in the interchange format: header, then pairs in
    // priority order over the byte-mapped alphabet ('\u0120' = mapped space)
    val dir = java.nio.file.Files.createTempDirectory("graft_merges")
    val p = dir.resolve("merges.txt")
    java.nio.file.Files.writeString(p,
      "#version: 0.2\nh e\nl l\nhe ll\nhell o\n\u0120 w\n")
    val model = Bpe.importMergesTxt(spark, p.toString)
    assert(model.merges.length === 5)
    // "hello" merges h+e, l+l, he+ll, hell+o -> one token
    assert(model.vocab.encodeString("hello").toSeq === Seq("hello"))
    // partial application: "hell" stops at he+ll
    assert(model.vocab.encodeString("hell").toSeq === Seq("hell"))
    // the mapped-space merge fires on a leading space kept by the
    // GPT-2 pre-tokenizer convention
    assert(model.vocab.encodeString(" w").toSeq === Seq("\u0120w"))
    // blank lines / header skipped; malformed lines fail loud
    val bad = dir.resolve("bad.txt")
    java.nio.file.Files.writeString(bad, "a b c\n")
    intercept[IllegalArgumentException](Bpe.importMergesTxt(spark, bad.toString))
  }

  test("export/import round-trip: merges.txt + vocab.json reproduce the trained model exactly") {
    val docs = (1 to 40).map(i => (i.toLong, "the quick brown fox the quick the"))
      .toDF("id", "text")
    val trained = Bpe.trainBytes(docs, col("text"), numMerges = 30, maxWords = 100,
      tokenizer = Bpe.gpt2PreTokens)
    val dir = java.nio.file.Files.createTempDirectory("graft_interchange").toString
    Bpe.exportMergesTxt(spark, trained, s"$dir/merges.txt")
    Bpe.exportVocabJson(spark, trained, s"$dir/vocab.json")
    val model = Bpe.importMergesTxt(spark, s"$dir/merges.txt")
    assert(model.merges.toSeq === trained.merges.toSeq)
    val vocab = Bpe.importVocabJson(spark, s"$dir/vocab.json")
    // published id construction: 256 base bytes then 256+rank per merge
    assert(vocab === Bpe.vocabIds(trained))
    assert(vocab.size === 256 + trained.merges.length)
    // the released layout: base symbols ordered by mapped codepoint —
    // '!' (byte 33) is id 0; the mapped NUL ('\u0100') is id 188, the
    // same ids the public GPT-2 vocab.json assigns them
    assert(vocab("!") === 0)
    assert(vocab("\u0100") === 188)
    val byCp = (0 until 256).map(ByteCoder.byteToChar).sorted
    assert(byCp.zipWithIndex.forall { case (c, i) => vocab(c.toString) === i })
    trained.merges.zipWithIndex.foreach { case ((a, b), i) =>
      assert(vocab(a + b) === 256 + i)
    }
    // ids resolve and invert for every token of a probe incl. quotes,
    // backslash (JSON-escaping hazards) and multi-byte UTF-8
    val inverse = vocab.map(_.swap)
    val probe = "the \"quick\" \\ fox caf\u00e9"
    val toks = model.vocab.encodeString(probe)
    assert(toks.forall(vocab.contains))
    assert(toks.map(t => inverse(vocab(t))).toSeq === toks.toSeq)
  }

  test("tokenizer.json import: a hand-built HF file drives the expected merges and ids " +
    "(both published merge encodings); non-BPE types fail loud") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hf")
    // legacy encoding: merges as "left right" strings
    val legacy = dir.resolve("tokenizer_legacy.json")
    java.nio.file.Files.writeString(legacy,
      """{"version":"1.0","model":{"type":"BPE",
        |"vocab":{"h":0,"e":1,"l":2,"o":3,"he":4,"ll":5,"hell":6,"hello":7},
        |"merges":["h e","l l","he ll","hell o"]}}""".stripMargin)
    val (m1, v1) = Bpe.loadHuggingFace(spark, legacy.toString)
    assert(m1.merges.toSeq === Seq(("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o")))
    assert(m1.vocab.encodeString("hello").toSeq === Seq("hello"))
    assert(m1.vocab.encodeString("hell").toSeq === Seq("hell"))
    assert(v1("hello") === 7 && v1("h") === 0 && v1.size === 8)
    // modern encoding: merges as ["left","right"] pairs — same model
    val modern = dir.resolve("tokenizer_modern.json")
    java.nio.file.Files.writeString(modern,
      """{"model":{"type":"BPE",
        |"vocab":{"h":0,"e":1,"l":2,"o":3,"he":4,"ll":5,"hell":6,"hello":7},
        |"merges":[["h","e"],["l","l"],["he","ll"],["hell","o"]]}}""".stripMargin)
    val (m2, v2) = Bpe.loadHuggingFace(spark, modern.toString)
    assert(m2.merges.toSeq === m1.merges.toSeq && v2 === v1)
    // a WordPiece artifact must not load as an empty/garbled merge list
    val wp = dir.resolve("tokenizer_wp.json")
    java.nio.file.Files.writeString(wp,
      """{"model":{"type":"WordPiece","vocab":{"[UNK]":0},"merges":[]}}""")
    val e = intercept[IllegalArgumentException](Bpe.loadHuggingFace(spark, wp.toString))
    assert(e.getMessage.contains("BPE"))
    // not-a-tokenizer.json fails loud too
    val junk = dir.resolve("junk.json")
    java.nio.file.Files.writeString(junk, """{"weights":[1,2,3]}""")
    intercept[IllegalArgumentException](Bpe.loadHuggingFace(spark, junk.toString))
  }

  test("tokenizer.json export/import round-trip reproduces the trained model and ids exactly") {
    val docs = (1 to 40).map(i => (i.toLong, "the quick brown fox the quick the"))
      .toDF("id", "text")
    val trained = Bpe.trainBytes(docs, col("text"), numMerges = 30, maxWords = 100,
      tokenizer = Bpe.gpt2PreTokens)
    val dir = java.nio.file.Files.createTempDirectory("graft_hf_rt").toString
    Bpe.exportHuggingFace(spark, trained, s"$dir/tokenizer.json")
    val (model, vocab) = Bpe.loadHuggingFace(spark, s"$dir/tokenizer.json")
    assert(model.merges.toSeq === trained.merges.toSeq)
    assert(vocab === Bpe.vocabIds(trained))
    // encode equality on a probe with JSON-escaping hazards + multi-byte UTF-8
    val probe = "the \"quick\" \\ fox café"
    assert(model.vocab.encodeString(probe).toSeq === trained.vocab.encodeString(probe).toSeq)
    val inverse = vocab.map(_.swap)
    val toks = model.vocab.encodeString(probe)
    assert(toks.forall(vocab.contains))
    assert(toks.map(t => inverse(vocab(t))).toSeq === toks.toSeq)
  }

  test("gpt2PreTokens: published pre-tokenizer keeps one leading space per word and is lossless") {
    val df = Seq(
      (1L, "hello world"), (2L, "it's  twice-spaced"), (3L, "a1b2 99 !?"),
      (4L, "  leading and trailing  "), (5L, ""), (6L, "tab\tand\nnewline")
    ).toDF("id", "text")
    val got = df.select(col("id"), Bpe.gpt2PreTokens(col("text")).as("t"),
        col("text")).collect()
    got.foreach { r =>
      val toks = r.getSeq[String](1)
      // exact partition: concatenating matches reproduces the text
      assert(toks.mkString === r.getString(2), s"row ${r.getLong(0)}")
    }
    val m = got.map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(m(1L) === Seq("hello", " world"))
    // contraction splits; double space: first space splits alone, the
    // second sticks to the word (the (?!\S) lookahead)
    assert(m(2L) === Seq("it", "'s", " ", " twice", "-", "spaced"))
    // letter/digit alternation splits; punctuation run sticks together
    assert(m(3L) === Seq("a", "1", "b", "2", " 99", " !?"))
    assert(m(4L) === Seq(" ", " leading", " and", " trailing", "  "))
    assert(m(5L) === Seq.empty)
  }

  test("added_tokens: specials import, match atomically pre-BPE, and extend the id space") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hf_added")
    val f = dir.resolve("tokenizer.json")
    java.nio.file.Files.writeString(f,
      """{"version":"1.0",
        |"added_tokens":[{"id":100,"content":"<|eot|>","special":true},
        |                {"id":101,"content":"<|eot|>x","special":true}],
        |"normalizer":null,
        |"model":{"type":"BPE",
        |"vocab":{"h":0,"e":1,"l":2,"o":3,"x":4,"he":5,"ll":6,"hell":7,"hello":8},
        |"merges":[["h","e"],["l","l"],["he","ll"],["hell","o"]]}}""".stripMargin)
    val tok = Bpe.loadHuggingFaceFull(spark, f.toString)
    assert(tok.specials === Seq(("<|eot|>", 100), ("<|eot|>x", 101)))
    assert(tok.vocab.size === 9 && tok.model.merges.length === 4)
    def ids(texts: String*): Seq[Seq[Int]] =
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
        .select(col("id"), Bpe.encodeIdsWithSpecials(col("text"), tok,
          Bpe.gpt2PreTokens).as("ids"))
        .orderBy("id").collect().toSeq.map(_.getSeq[Int](1).toSeq)
    // the special never byte-BPEs: one atomic id wherever it occurs
    assert(ids("hello<|eot|>hello") === Seq(Seq(8, 100, 8)))
    assert(ids("<|eot|>") === Seq(Seq(100)))
    assert(ids("<|eot|>hello") === Seq(Seq(100, 8)))
    assert(ids("hello<|eot|>") === Seq(Seq(8, 100)))
    // LONGEST special wins at a shared position (alternation is
    // longest-first): "<|eot|>x" is one token 101, never 100 then "x"
    assert(ids("<|eot|>x") === Seq(Seq(101)))
    assert(ids("<|eot|>xhello<|eot|>") === Seq(Seq(101, 8, 100)))
    // adjacent specials, repeated specials
    assert(ids("<|eot|><|eot|>") === Seq(Seq(100, 100)))
    // no specials present == the plain encodeIds path
    assert(ids("hellohello") === Seq(Seq(8, 8)))
    assert(ids("hell") === Seq(Seq(7)))
    // empty text
    assert(ids("") === Seq(Seq.empty))
  }

  test("added_tokens fail-loud: unsupported normalizer, vocab id conflict, duplicate content") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hf_added_bad")
    val norm = dir.resolve("norm.json")
    java.nio.file.Files.writeString(norm,
      """{"normalizer":{"type":"BertNormalizer","lowercase":true},"model":{"type":"BPE","vocab":{"a":0},"merges":[]}}""")
    val e1 = intercept[IllegalArgumentException](Bpe.loadHuggingFaceFull(spark, norm.toString))
    assert(e1.getMessage.contains("normalizer") && e1.getMessage.contains("BertNormalizer"))
    // a supported normalizer type now imports as parsed steps
    val nfc = dir.resolve("nfc.json")
    java.nio.file.Files.writeString(nfc,
      """{"normalizer":{"type":"NFC"},"model":{"type":"BPE","vocab":{"a":0},"merges":[]}}""")
    assert(Bpe.loadHuggingFaceFull(spark, nfc.toString).norms === Seq(Bpe.NormUnicode("NFC")))
    // Replace with a Regex pattern refuses (HF regex flavor is not Java's)
    val rex = dir.resolve("rex.json")
    java.nio.file.Files.writeString(rex,
      """{"normalizer":{"type":"Replace","pattern":{"Regex":" {2,}"},"content":" "},
        |"model":{"type":"BPE","vocab":{"a":0},"merges":[]}}""".stripMargin)
    val eRex = intercept[IllegalArgumentException](Bpe.loadHuggingFaceFull(spark, rex.toString))
    assert(eRex.getMessage.contains("Regex"))
    // an added token explicitly normalized=true under a live normalizer
    // refuses (match order would diverge from the atomic-on-raw contract)
    val nt = dir.resolve("nt.json")
    java.nio.file.Files.writeString(nt,
      """{"normalizer":{"type":"Lowercase"},
        |"added_tokens":[{"id":9,"content":"<s>","special":true,"normalized":true}],
        |"model":{"type":"BPE","vocab":{"a":0},"merges":[]}}""".stripMargin)
    val eNt = intercept[IllegalArgumentException](Bpe.loadHuggingFaceFull(spark, nt.toString))
    assert(eNt.getMessage.contains("normalized=true"))
    // ... but normalized=true with NO normalizer is harmless and loads
    val ntOk = dir.resolve("nt_ok.json")
    java.nio.file.Files.writeString(ntOk,
      """{"added_tokens":[{"id":9,"content":"<s>","special":true,"normalized":true}],
        |"model":{"type":"BPE","vocab":{"a":0},"merges":[]}}""".stripMargin)
    assert(Bpe.loadHuggingFaceFull(spark, ntOk.toString).specials === Seq(("<s>", 9)))
    // a special that ALSO sits in the vocab must agree on the id
    val conflict = dir.resolve("conflict.json")
    java.nio.file.Files.writeString(conflict,
      """{"added_tokens":[{"id":9,"content":"a"}],
        |"model":{"type":"BPE","vocab":{"a":0},"merges":[]}}""".stripMargin)
    val e2 = intercept[IllegalArgumentException](Bpe.loadHuggingFaceFull(spark, conflict.toString))
    assert(e2.getMessage.contains("vocab maps it to"))
    // agreement is fine (GPT-2 lists <|endoftext|> in BOTH tables)
    val agree = dir.resolve("agree.json")
    java.nio.file.Files.writeString(agree,
      """{"added_tokens":[{"id":0,"content":"a"}],
        |"model":{"type":"BPE","vocab":{"a":0},"merges":[]}}""".stripMargin)
    assert(Bpe.loadHuggingFaceFull(spark, agree.toString).specials === Seq(("a", 0)))
    val dup = dir.resolve("dup.json")
    java.nio.file.Files.writeString(dup,
      """{"added_tokens":[{"id":7,"content":"<s>"},{"id":8,"content":"<s>"}],
        |"model":{"type":"BPE","vocab":{"a":0},"merges":[]}}""".stripMargin)
    val e3 = intercept[IllegalArgumentException](Bpe.loadHuggingFaceFull(spark, dup.toString))
    assert(e3.getMessage.contains("duplicate"))
    // missing id / empty content fail loud
    val noid = dir.resolve("noid.json")
    java.nio.file.Files.writeString(noid,
      """{"added_tokens":[{"content":"<s>"}],
        |"model":{"type":"BPE","vocab":{"a":0},"merges":[]}}""".stripMargin)
    intercept[IllegalArgumentException](Bpe.loadHuggingFaceFull(spark, noid.toString))
  }

  test("normalizer: steps apply in artifact order, specials match on raw text") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hf_norm")
    val f = dir.resolve("tokenizer.json")
    java.nio.file.Files.writeString(f,
      """{"version":"1.0",
        |"added_tokens":[{"id":100,"content":"<|eot|>","special":true}],
        |"normalizer":{"type":"Sequence","normalizers":[
        |  {"type":"NFKC"},
        |  {"type":"Lowercase"},
        |  {"type":"Replace","pattern":{"String":"x"},"content":"he"},
        |  {"type":"Strip","strip_left":true,"strip_right":true}]},
        |"model":{"type":"BPE",
        |"vocab":{"h":0,"e":1,"l":2,"o":3,"x":4,"he":5,"ll":6,"hell":7,"hello":8},
        |"merges":[["h","e"],["l","l"],["he","ll"],["hell","o"]]}}""".stripMargin)
    val tok = Bpe.loadHuggingFaceFull(spark, f.toString)
    assert(tok.norms === Seq(Bpe.NormUnicode("NFKC"), Bpe.NormLowercase,
      Bpe.NormReplace("x", "he"), Bpe.NormStrip(left = true, right = true)))
    def ids(texts: String*): Seq[Seq[Int]] =
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
        .select(col("id"), Bpe.encodeIdsWithSpecials(col("text"), tok,
          Bpe.gpt2PreTokens).as("ids"))
        .orderBy("id").collect().toSeq.map(_.getSeq[Int](1).toSeq)
    // Lowercase
    assert(ids("HELLO") === Seq(Seq(8)))
    // NFKC: fullwidth letters fold to ASCII before everything else
    assert(ids("ＨＥＬＬＯ") === Seq(Seq(8))) // ＨＥＬＬＯ
    // ORDER pins: Replace runs AFTER Lowercase, so "X" -> "x" -> "he";
    // reversed order would leave "x" (id 4)
    assert(ids("X") === Seq(Seq(5)))
    // Strip: without it " hello " pre-tokenizes to " hello" (no vocab hit)
    assert(ids("  hello  ") === Seq(Seq(8)))
    // specials match the RAW text; the surrounding segments normalize
    assert(ids("HELLO<|eot|>X") === Seq(Seq(8, 100, 5)))
    // ... and a case-mangled special is NOT a special: it normalizes as
    // ordinary text (lowercases to "<|eot|>", which BPE-chews; the 'e'
    // (1), 'o' (3), 'he' after x-replace etc. resolve, punctuation
    // misses the toy vocab -> nulls are fine — just NOT id 100)
    assert(!ids("<|EOT|>").head.contains(100))
    // no-specials path normalizes too (encodeIds ∘ preTokens ∘ normalize)
    val tokNoSp = tok.copy(specials = Seq.empty)
    val noSp = Seq((1L, "HELLO")).toDF("id", "text")
      .select(Bpe.encodeIdsWithSpecials(col("text"), tokNoSp,
        Bpe.gpt2PreTokens).as("ids"))
      .collect().head.getSeq[Int](0).toSeq
    assert(noSp === Seq(8))
  }

  test("exportHuggingFace(norms) round-trips the normalizer section both shapes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hf_norm_rt")
    val docs = Seq((1L, "hello hello")).toDF("id", "text")
    val model = Bpe.trainBytes(docs, col("text"), numMerges = 3,
      maxWords = 100, tokenizer = Bpe.gpt2PreTokens)
    val norms = Seq(Bpe.NormUnicode("NFKC"), Bpe.NormLowercase,
      Bpe.NormReplace(" ", "▁"), Bpe.NormStrip(left = true, right = false))
    val multi = dir.resolve("multi.json").toString
    Bpe.exportHuggingFace(spark, model, multi, norms = norms)
    assert(Bpe.loadHuggingFaceFull(spark, multi).norms === norms)
    // single step exports inline (no Sequence wrapper) and re-imports
    val single = dir.resolve("single.json").toString
    Bpe.exportHuggingFace(spark, model, single, norms = Seq(Bpe.NormPrepend("▁")))
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(java.nio.file.Files.readString(java.nio.file.Paths.get(single)))
    assert(m.path("normalizer").path("type").asText() === "Prepend")
    assert(Bpe.loadHuggingFaceFull(spark, single).norms === Seq(Bpe.NormPrepend("▁")))
  }

  test("exportHuggingFace(specials) round-trips added_tokens and writes normalizer:null") {
    val docs = (1 to 30).map(i => (i.toLong, "pack my box with five dozen jugs"))
      .toDF("id", "text")
    val trained = Bpe.trainBytes(docs, col("text"), numMerges = 20, maxWords = 100,
      tokenizer = Bpe.gpt2PreTokens)
    val n = Bpe.vocabIds(trained).size
    val specials = Seq(("<|doc|>", n), ("<|end|>", n + 1))
    val dir = java.nio.file.Files.createTempDirectory("graft_hf_sp_rt").toString
    Bpe.exportHuggingFace(spark, trained, s"$dir/tokenizer.json", specials)
    val tok = Bpe.loadHuggingFaceFull(spark, s"$dir/tokenizer.json")
    assert(tok.model.merges.toSeq === trained.merges.toSeq)
    assert(tok.vocab === Bpe.vocabIds(trained))
    assert(tok.specials === specials)
    val txt = java.nio.file.Files.readString(java.nio.file.Paths.get(s"$dir/tokenizer.json"))
    assert(txt.contains("\"normalizer\":null"))
  }
}
