package graft

import graft.functions.UnigramVocab
import graft.operators.{Pack, TextAnalysis, Unigram}
import org.apache.spark.sql.functions._

/** Trainable unigram-LM tokenizer: EM + prune vs hand-worked
  * dictionaries, Viterbi-beats-greedy segmentation, structural
  * round-trip (unknowns included), determinism, persistence, codegen
  * parity, and the tokenizer-seam plumbing. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  test("EM prunes the useless candidate, keeps the dominant piece") {
    // "abab" x10, maxTokenCp=2: candidates a, b, ab, ba. "ab" appears in
    // every high-probability segmentation, "ba" only in a-ba-b — its
    // expected count is a fraction of ab's, so the prune to vocabSize=3
    // must drop "ba" and keep coverage singles {a, b} plus "ab".
    val m = Unigram.trainOnDict(Array(("abab", 10L)), vocabSize = 3,
      maxTokenCp = 2, emIters = 2, pruneFraction = 0.5)
    val toks = m.tokens.map(_._1).toSet
    assert(toks === Set("a", "b", "ab"))
    assert(m.vocab.encode("abab").toSeq === Seq("ab", "ab"),
      "the learned model segments into the dominant piece")
  }

  test("single code points survive any prune — coverage beats budget") {
    val m = Unigram.trainOnDict(Array(("xyz", 5L), ("zyx", 3L)), vocabSize = 1,
      maxTokenCp = 3, emIters = 1, pruneFraction = 0.5)
    val toks = m.tokens.map(_._1).toSet
    assert(Set("x", "y", "z").subsetOf(toks), "singles are never pruned")
    assert(m.vocab.encode("zzxxyy").mkString === "zzxxyy")
  }

  test("Viterbi beats greedy longest-match when probabilities say so") {
    // greedy longest-first on "abcd" takes "abc"+"d" (low prob); the
    // max-likelihood segmentation is "ab"+"cd".
    val v = new UnigramVocab(Array(
      ("ab", math.log(0.4)), ("abc", math.log(0.05)),
      ("cd", math.log(0.4)), ("a", math.log(0.02)), ("b", math.log(0.02)),
      ("c", math.log(0.02)), ("d", math.log(0.02))), unkLogProb = -20.0)
    assert(v.encode("abcd").toSeq === Seq("ab", "cd"))
  }

  test("ties prefer the longer token; unknowns emit losslessly") {
    // p(ab) == p(a)*p(b) exactly -> tie; the longer token wins.
    val v = new UnigramVocab(Array(
      ("ab", math.log(0.25)), ("a", math.log(0.5)), ("b", math.log(0.5))),
      unkLogProb = -20.0)
    assert(v.encode("ab").toSeq === Seq("ab"))
    // unknown code points (incl. NUL and an astral emoji) pass through
    // as single-cp tokens — concatenation always reproduces the word
    val w = "a\u0000b😀ab"
    assert(v.encode(w).mkString === w)
    assert(v.encode(w).contains("😀"), "surrogate pair is ONE token")
    assert(v.encode("") === Array.empty[String])
  }

  test("training on a DataFrame is deterministic; round-trip on real text") {
    val docs = Seq(
      (1L, "the lower newest widest low low low"),
      (2L, "newest newest lowest low the the"),
      (3L, "widest newest low the lower")
    ).toDF("doc_id", "text")
    val m1 = Unigram.train(docs, col("text"), vocabSize = 30, maxWords = 100)
    val m2 = Unigram.train(docs, col("text"), vocabSize = 30, maxWords = 100)
    assert(m1.tokens.toSeq === m2.tokens.toSeq, "same corpus -> same model")
    assert(m1.unkLogProb === m2.unkLogProb)
    // every trained-on word round-trips; so does an unseen one
    for (w <- Seq("newest", "widest", "lower", "zzq", "don't"))
      assert(m1.vocab.encode(w).mkString === w, s"round-trip of '$w'")
  }

  test("interpreted and codegen paths agree") {
    val docs = Seq((1L, "sort merge join sort merge scan scan sort")).toDF("id", "text")
    val m = Unigram.train(docs, col("text"), vocabSize = 25, maxWords = 50)
    val df = Seq(Seq("sorting", "merges", "scanner"), Seq("zz")).toDF("w")
    val withCodegen = df.select(Unigram.encodeTokens($"w", m).as("t"))
      .as[Seq[String]].collect().toSeq
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interp = df.select(Unigram.encodeTokens($"w", m).as("t"))
        .as[Seq[String]].collect().toSeq
      assert(withCodegen === interp)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    val n = Seq((1L, Option.empty[Seq[String]])).toDF("id", "w")
      .select(Unigram.encodeTokens($"w", m).as("t")).collect()(0)
    assert(n.isNullAt(0), "null array propagates")
  }

  test("model save/load round-trips to identical encodings") {
    val docs = Seq((1L, "alpha beta alpha beta gamma alpha")).toDF("id", "text")
    val m = Unigram.train(docs, col("text"), vocabSize = 20, maxWords = 50)
    val dir = java.nio.file.Files.createTempDirectory("graft_unigram").toString
    Unigram.saveModel(spark, m, dir)
    val loaded = Unigram.loadModel(spark, dir)
    assert(loaded.tokens.toSeq === m.tokens.toSeq)
    assert(loaded.unkLogProb === m.unkLogProb)
    val words = Seq(Seq("alphabet", "betagamma", "delta")).toDF("w")
    val a = words.select(Unigram.encodeTokens($"w", m).as("t")).as[Seq[String]].collect()
    val b = words.select(Unigram.encodeTokens($"w", loaded).as("t")).as[Seq[String]].collect()
    assert(a.toSeq === b.toSeq, "loaded model encodes bit-identically")
  }

  test("plugs into the tokenizer seam: chunking and token counts") {
    val docs = Seq(
      (1L, "alpha beta alpha beta alpha beta alpha beta"),
      (2L, "")
    ).toDF("doc_id", "text")
    val m = Unigram.train(docs, col("text"), vocabSize = 12, maxWords = 100)
    val tok = Unigram.tokenizer(m)
    val counts = docs.select($"doc_id",
      TextAnalysis.tokenCount($"text", tok).as("c")).as[(Long, Int)].collect().toMap
    assert(counts(1L) >= 8, "unigram count >= word count")
    assert(counts(2L) === 0)
    val chunks = Pack.chunkTokens(docs, "doc_id", "text", window = 4, stride = 4,
      tokenizer = tok)
    val joined = chunks.orderBy("doc_id", "chunk_idx")
      .agg(concat_ws("", collect_list(regexp_replace(col("chunk_text"), " ", ""))).as("all"))
      .as[String].collect().head
    assert(joined === "alphabetaalphabetaalphabetaalphabeta",
      "chunk coverage at stride==window is exact in unigram space")
  }

  test("SentencePiece import: a HAND-BUILT .model binary drives the expected pieces; " +
    "control pieces stay out of the table; unknown fields skip") {
    // wire-format bytes assembled by hand (protobuf encoding is public):
    // ModelProto { repeated SentencePiece pieces = 1 }
    // SentencePiece { piece=1 string, score=2 float(fixed32), type=3 enum }
    val out = new java.io.ByteArrayOutputStream()
    def piece(p: String, score: Float, tpe: Int, extraField: Boolean = false): Unit = {
      val b = new java.io.ByteArrayOutputStream()
      val pb = p.getBytes("UTF-8")
      b.write(0x0a); b.write(pb.length); b.write(pb)
      b.write(0x15)
      val bits = java.lang.Float.floatToIntBits(score)
      b.write(bits & 0xff); b.write((bits >>> 8) & 0xff)
      b.write((bits >>> 16) & 0xff); b.write((bits >>> 24) & 0xff)
      b.write(0x18); b.write(tpe)
      if (extraField) { b.write(0x22); b.write(3); b.write('x'); b.write('y'); b.write('z') } // unknown field 4
      val body = b.toByteArray
      out.write(0x0a); out.write(body.length); out.write(body)
    }
    piece("<unk>", -9.5f, 2)           // UNKNOWN
    piece("<s>", 0.0f, 3)              // CONTROL: must not segment text
    piece("▁he", -1.0f, 1)        // NORMAL
    piece("▁hello", -1.5f, 1, extraField = true)
    piece("l", -2.0f, 1)
    piece("o", -2.5f, 1)
    // an unknown top-level field (trainer_spec=2, length-delimited) must skip
    out.write(0x12); out.write(2); out.write(1); out.write(1)
    val dir = java.nio.file.Files.createTempDirectory("graft_sp")
    val f = dir.resolve("m.model")
    java.nio.file.Files.write(f, out.toByteArray)
    val m = Unigram.loadSentencePiece(spark, f.toString)
    assert(m.tokens.map(_._1).toSeq === Seq("▁he", "▁hello", "l", "o"))
    assert(m.tokens.map(_._2.toFloat).toSeq === Seq(-1.0f, -1.5f, -2.0f, -2.5f))
    assert(m.unkLogProb.toFloat === -9.5f)
    // Viterbi under the hand-built scores: one ▁hello piece (-1.5) beats
    // ▁he+l+l+o (-7.0... wait -1-2-2-2.5=-7.5)
    assert(m.vocab.encode("▁hello").toSeq === Seq("▁hello"))
    assert(m.vocab.encode("▁hell").toSeq === Seq("▁he", "l", "l"))
    // a real model's <unk> ships score 0.0 — the import must floor it,
    // never hand out FREE unknowns
    val out2 = new java.io.ByteArrayOutputStream()
    val save = out.toByteArray
    def pieceTo(o: java.io.ByteArrayOutputStream)(p: String, score: Float, tpe: Int): Unit = {
      val b = new java.io.ByteArrayOutputStream()
      val pb = p.getBytes("UTF-8")
      b.write(0x0a); b.write(pb.length); b.write(pb)
      b.write(0x15)
      val bits = java.lang.Float.floatToIntBits(score)
      b.write(bits & 0xff); b.write((bits >>> 8) & 0xff)
      b.write((bits >>> 16) & 0xff); b.write((bits >>> 24) & 0xff)
      b.write(0x18); b.write(tpe)
      val body = b.toByteArray
      o.write(0x0a); o.write(body.length); o.write(body)
    }
    pieceTo(out2)("<unk>", 0.0f, 2)
    pieceTo(out2)("a", -3.0f, 1)
    val f2 = dir.resolve("m2.model")
    java.nio.file.Files.write(f2, out2.toByteArray)
    val m2 = Unigram.loadSentencePiece(spark, f2.toString)
    assert(m2.unkLogProb < -3.0, s"unk must be floored below the worst piece: ${m2.unkLogProb}")
    assert(save.nonEmpty) // silence unused warning
    // not-a-model fails loud
    val f3 = dir.resolve("junk.model")
    java.nio.file.Files.write(f3, Array[Byte](0x12, 1, 0))
    intercept[IllegalArgumentException](Unigram.loadSentencePiece(spark, f3.toString))
  }

  test("SentencePiece export/import round-trip reproduces the trained model at float32 precision") {
    val docs = (1 to 30).map(i => (i.toLong, "the quick brown fox the quick the"))
      .toDF("id", "text")
    val trained = Unigram.train(docs, col("text"), vocabSize = 30, maxWords = 100,
      tokenizer = Unigram.spPreTokens)
    val dir = java.nio.file.Files.createTempDirectory("graft_sp_rt").toString
    Unigram.exportSentencePiece(spark, trained, s"$dir/sp.model")
    val m = Unigram.loadSentencePiece(spark, s"$dir/sp.model")
    assert(m.tokens.map { case (t, p) => (t, p.toFloat) }.toSeq ===
      trained.tokens.map { case (t, p) => (t, p.toFloat) }.toSeq)
    assert(m.unkLogProb.toFloat === trained.unkLogProb.toFloat)
    // ▁-convention pre-tokens segment losslessly under the loaded model
    val words = Seq("▁the", "▁quick", "▁zebra!")
    words.foreach { w =>
      assert(m.vocab.encode(w).mkString("") === w, s"lossless on $w")
    }
  }

  test("spPreTokens: whitespace split, one ▁ prefix per word, blanks drop") {
    val got = Seq((1L, " the  quick\tfox\n"), (2L, ""), (3L, "solo"))
      .toDF("id", "t")
      .select(Unigram.spPreTokens(col("t")).as("w"))
      .collect().map(_.getSeq[String](0).toSeq).toSeq
    assert(got === Seq(
      Seq("▁the", "▁quick", "▁fox"), Seq.empty, Seq("▁solo")))
  }
}
