package graft

import graft.functions.WordPieceVocab
import graft.operators.{Pack, TextAnalysis, WordPiece}
import org.apache.spark.sql.functions._

/** Trainable WordPiece tokenizer: likelihood-gain merge rule vs a
  * hand-worked dictionary (where it diverges from BPE's frequency
  * rule), greedy longest-match-first segmentation with `##`
  * continuations, whole-word [UNK] semantics, determinism, persistence,
  * codegen parity, and the tokenizer-seam plumbing. */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  test("merge rule is likelihood gain, not raw pair frequency") {
    // The worked example from the published WordPiece expositions:
    //   hug:10  pug:5  pun:12  bun:4  hugs:5
    // decomposed h ##u ##g / p ##u ##g / p ##u ##n / b ##u ##n /
    // h ##u ##g ##s. Pair (##u,##g) is the most FREQUENT (20 — BPE
    // would merge it first), but every pair containing ##u scores
    // pc/(ca*cb) = 1/36 because ##u occurs 36 times; (##g,##s) scores
    // 5/(20*5) = 1/20 and must win the first merge.
    val dict = Array(("hug", 10L), ("pug", 5L), ("pun", 12L),
      ("bun", 4L), ("hugs", 5L))
    val m = WordPiece.trainOnDict(dict, numMerges = 1, minPairCount = 1, unkToken = "[UNK]")
    assert(m.tokens.contains("##gs"), "first merge joins ##g + ##s")
    assert(!m.tokens.contains("##ug"), "the BPE-frequency pair is NOT merged")
    // base alphabet is always present (greedy coverage of trained words)
    for (t <- Seq("h", "p", "b", "##u", "##g", "##n", "##s"))
      assert(m.tokens.contains(t), s"alphabet symbol $t")
  }

  test("greedy longest-match-first with ## continuations") {
    // the canonical BERT doc example
    val v = new WordPieceVocab(Array("un", "##aff", "##able", "u", "##n",
      "##a", "##f", "##b", "##l", "##e"), "[UNK]")
    assert(v.encode("unaffable").toSeq === Seq("un", "##aff", "##able"))
    // longest match wins over an equally-valid shorter chain
    val v2 = new WordPieceVocab(Array("ab", "a", "##b", "##c"), "[UNK]")
    assert(v2.encode("abc").toSeq === Seq("ab", "##c"))
    assert(v2.encode("") === Array.empty[String])
  }

  test("unmatchable words emit ONE unknown token (published semantics)") {
    val v = new WordPieceVocab(Array("un", "##aff", "##able"), "[UNK]")
    // 'x' has no word-initial token -> whole word is [UNK], not a
    // partial prefix + fallback
    assert(v.encode("xunaffable").toSeq === Seq("[UNK]"))
    // match fails MID-word -> still the whole word
    assert(v.encode("unaffordable").toSeq === Seq("[UNK]"))
    // astral code points are single units: vocab with the emoji matches,
    // without it the word is unknown — never a split surrogate
    val ve = new WordPieceVocab(Array("a", "##😀"), "[UNK]")
    assert(ve.encode("a😀").toSeq === Seq("a", "##😀"))
    assert(ve.encode("b😀").toSeq === Seq("[UNK]"))
  }

  test("training on a DataFrame is deterministic; trained words round-trip") {
    val docs = Seq(
      (1L, "the lower newest widest low low low"),
      (2L, "newest newest lowest low the the"),
      (3L, "widest newest low the lower")
    ).toDF("doc_id", "text")
    val m1 = WordPiece.train(docs, col("text"), numMerges = 20, maxWords = 100)
    val m2 = WordPiece.train(docs, col("text"), numMerges = 20, maxWords = 100)
    assert(m1.tokens.toSeq === m2.tokens.toSeq, "same corpus -> same model")
    // every trained-on word segments without [UNK] (alphabet coverage)
    // and its pieces concatenate back to the word after ## stripping
    for (w <- Seq("newest", "widest", "lower", "lowest", "the")) {
      val toks = m1.vocab.encode(w)
      assert(!toks.contains("[UNK]"), s"'$w' is covered")
      assert(toks.head + toks.tail.map(_.stripPrefix("##")).mkString === w,
        s"round-trip of '$w'")
      assert(toks.tail.forall(_.startsWith("##")), "continuations carry ##")
    }
    // a word with an untrained character is unknown as a whole
    assert(m1.vocab.encode("zq7").toSeq === Seq("[UNK]"))
  }

  test("interpreted and codegen paths agree") {
    val docs = Seq((1L, "sort merge join sort merge scan scan sort")).toDF("id", "text")
    val m = WordPiece.train(docs, col("text"), numMerges = 15, maxWords = 50)
    val df = Seq(Seq("sorting", "merges", "scanner"), Seq("zz")).toDF("w")
    val withCodegen = df.select(WordPiece.encodeTokens($"w", m).as("t"))
      .as[Seq[String]].collect().toSeq
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interp = df.select(WordPiece.encodeTokens($"w", m).as("t"))
        .as[Seq[String]].collect().toSeq
      assert(withCodegen === interp)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    val n = Seq((1L, Option.empty[Seq[String]])).toDF("id", "w")
      .select(WordPiece.encodeTokens($"w", m).as("t")).collect()(0)
    assert(n.isNullAt(0), "null array propagates")
  }

  test("model save/load round-trips to identical encodings (custom unk)") {
    val docs = Seq((1L, "alpha beta alpha beta gamma alpha")).toDF("id", "text")
    val m0 = WordPiece.train(docs, col("text"), numMerges = 10, maxWords = 50,
      unkToken = "<unk>")
    val dir = java.nio.file.Files.createTempDirectory("graft_wordpiece").toString
    WordPiece.saveModel(spark, m0, dir)
    val loaded = WordPiece.loadModel(spark, dir)
    assert(loaded.tokens.sorted.toSeq === m0.tokens.sorted.toSeq)
    assert(loaded.unkToken === "<unk>")
    val words = Seq(Seq("alphabet", "betagamma", "delta")).toDF("w")
    val a = words.select(WordPiece.encodeTokens($"w", m0).as("t")).as[Seq[String]].collect()
    val b = words.select(WordPiece.encodeTokens($"w", loaded).as("t")).as[Seq[String]].collect()
    assert(a.toSeq === b.toSeq, "loaded model encodes identically")
    assert(b.flatten.count(_ == "<unk>") >= 1, "delta's 'd' is untrained -> unk")
  }

  test("plugs into the tokenizer seam: chunking and token counts") {
    val docs = Seq(
      (1L, "alpha beta alpha beta alpha beta alpha beta"),
      (2L, "")
    ).toDF("doc_id", "text")
    val m = WordPiece.train(docs, col("text"), numMerges = 4, maxWords = 100)
    val tok = WordPiece.tokenizer(m)
    val counts = docs.select($"doc_id",
      TextAnalysis.tokenCount($"text", tok).as("c")).as[(Long, Int)].collect().toMap
    assert(counts(1L) >= 8, "wordpiece count >= word count")
    assert(counts(2L) === 0)
    val chunks = Pack.chunkTokens(docs, "doc_id", "text", window = 4, stride = 4,
      tokenizer = tok)
    assert(chunks.count() > 0, "seam-driven chunking runs end to end")
  }

  test("vocab.txt import: a hand-built published-format file drives the expected " +
    "vocabulary and line-index ids; duplicates and missing [UNK] fail loud") {
    val dir = java.nio.file.Files.createTempDirectory("graft_wp_vocab")
    val f = dir.resolve("vocab.txt")
    java.nio.file.Files.writeString(f,
      "[PAD]\n[UNK]\n[CLS]\n[SEP]\nhe\n##ll\n##o\nhello\n")
    val (m, ids) = WordPiece.importVocabTxt(spark, f.toString)
    assert(m.unkToken === "[UNK]")
    assert(ids === Map("[PAD]" -> 0, "[UNK]" -> 1, "[CLS]" -> 2, "[SEP]" -> 3,
      "he" -> 4, "##ll" -> 5, "##o" -> 6, "hello" -> 7))
    // greedy longest-prefix + ## continuations under the imported set
    assert(m.vocab.encode("hello").toSeq === Seq("hello"))
    assert(m.vocab.encode("hell").toSeq === Seq("he", "##ll"))
    assert(m.vocab.encode("xyz").toSeq === Seq("[UNK]"))
    // duplicates make ids ambiguous -> loud
    val dup = dir.resolve("dup.txt")
    java.nio.file.Files.writeString(dup, "[UNK]\na\na\n")
    intercept[IllegalArgumentException](WordPiece.importVocabTxt(spark, dup.toString))
    // no [UNK] -> not a WordPiece vocab
    val nounk = dir.resolve("nounk.txt")
    java.nio.file.Files.writeString(nounk, "a\nb\n")
    intercept[IllegalArgumentException](WordPiece.importVocabTxt(spark, nounk.toString))
  }

  test("vocab.txt export/import round-trip reproduces the trained model exactly") {
    val docs = (1 to 30).map(i => (i.toLong, "the quick brown fox the quick the"))
      .toDF("id", "text")
    val trained = WordPiece.train(docs, col("text"), numMerges = 25, maxWords = 100)
    val dir = java.nio.file.Files.createTempDirectory("graft_wp_rt").toString
    WordPiece.exportVocabTxt(spark, trained, s"$dir/vocab.txt")
    val (m, ids) = WordPiece.importVocabTxt(spark, s"$dir/vocab.txt")
    assert(m.unkToken === trained.unkToken)
    assert(m.tokens.sorted.toSeq === trained.tokens.sorted.toSeq)
    assert(ids.size === trained.tokens.length + 1)
    val probe = Seq("the", "quick", "unseen")
    probe.foreach { w =>
      assert(m.vocab.encode(w).toSeq === trained.vocab.encode(w).toSeq, s"encode($w)")
    }
  }
}
