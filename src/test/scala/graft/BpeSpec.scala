package graft

import graft.operators.{Bpe, Pack, TextAnalysis}
import org.apache.spark.sql.functions._

/** Trainable BPE: merge learning vs a hand-worked dictionary, greedy
  * encode priorities, round-trip, determinism, persistence, and the
  * tokenizer-seam plumbing into chunking/budget operators. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // Sennrich's classic toy dictionary (no end-of-word marker variant).
  // low:5 lower:2 newest:6 widest:3
  private val toyDict: Array[(String, Long)] =
    Array(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("merge loop reproduces the hand-worked Sennrich example") {
    val merges = Bpe.trainOnDict(toyDict, numMerges = 4, minPairCount = 2)
    // pair counts round 1: es=9 (newest 6 + widest 3), st=9, lo=7, we=8? no:
    //   l-o 5+2=7, o-w 7, w-e 2+6=8... hand-check: newest = n e w e s t
    //   (n,e)=6 (e,w)=6 (w,e)=6+2=8 (e,s)=9 (s,t)=9 (l,o)=7 (o,w)=7
    //   (wider ties: (e,s) vs (s,t) both 9 -> lexicographically (e,s) first
    assert(merges(0) === ("e", "s"), "ties at 9 break to the smaller pair")
    assert(merges(1) === ("es", "t"), "es+t = 9 dominates round 2")
    assert(merges(2) === ("w", "est") || merges(2) === ("l", "o"))
    // all four merges exist (minPairCount=2 not hit in 4 rounds)
    assert(merges.length === 4)
  }

  test("greedy encode follows merge priority and round-trips the word") {
    val merges = Bpe.trainOnDict(toyDict, numMerges = 6, minPairCount = 1)
    val m = Bpe.Model(merges)
    val enc = m.vocab.encode("newest")
    assert(enc.mkString === "newest", "concatenating tokens reproduces the word")
    assert(enc.length < "newest".length, "training compressed the symbol count")
    // an unseen word still encodes (falls back toward characters)
    val unseen = m.vocab.encode("zzq")
    assert(unseen.mkString === "zzq")
    assert(m.vocab.encode("") === Array.empty[String])
  }

  test("NUL and ':' inside symbols cannot alias pair keys") {
    // Two dictionaries whose pairs would collide under a NUL-joined key:
    // ("a\u0000b","c") vs ("a","\u0000bc") both join to "a\u0000b\u0000c"
    // when the separator is NUL. Length-prefixed keys keep them apart.
    import graft.functions.BpeVocab
    assert(BpeVocab.pairKey("a\u0000b", "c") !== BpeVocab.pairKey("a", "\u0000bc"))
    assert(BpeVocab.pairKey("1:", "x") !== BpeVocab.pairKey("1", ":x"))
    // end-to-end: a vocab whose merges involve NUL-bearing symbols still
    // ranks/encodes correctly (NUL is an ordinary code point)
    val m = Bpe.Model(Array(("a", "\u0000"), ("a\u0000", "b")))
    assert(m.vocab.encode("a\u0000b").toSeq === Seq("a\u0000b"))
    assert(m.vocab.encode("a\u0000b").mkString === "a\u0000b", "round-trip holds")
  }

  test("training on a DataFrame is deterministic and respects maxWords") {
    val docs = Seq(
      (1L, "the lower newest widest low low low"),
      (2L, "newest newest lowest low the the"),
      (3L, "widest newest low the lower")
    ).toDF("doc_id", "text")
    val m1 = Bpe.train(docs, col("text"), numMerges = 10, maxWords = 100)
    val m2 = Bpe.train(docs, col("text"), numMerges = 10, maxWords = 100)
    assert(m1.merges.toSeq === m2.merges.toSeq, "same corpus -> same merges")
    assert(m1.merges.nonEmpty)
    // capping the dictionary changes only which words feed the counts
    val capped = Bpe.train(docs, col("text"), numMerges = 10, maxWords = 2)
    assert(capped.merges.nonEmpty)
  }

  test("encodeTokens expands a word array in order; nulls and blanks are safe") {
    val m = Bpe.Model(Array(("l", "o"), ("lo", "w")))
    val out = Seq(Seq("low", "lower"), Seq.empty[String])
      .toDF("w").select(Bpe.encodeTokens($"w", m).as("t"))
      .as[Seq[String]].collect()
    assert(out(0) === Seq("low", "low", "e", "r"))
    assert(out(1) === Seq.empty)
    val n = Seq((1L, Option.empty[Seq[String]])).toDF("id", "w")
      .select(Bpe.encodeTokens($"w", m).as("t")).collect()(0)
    assert(n.isNullAt(0), "null array propagates")
  }

  test("interpreted and codegen paths agree") {
    val m = Bpe.Model(Array(("l", "o"), ("lo", "w"), ("e", "s"), ("es", "t")))
    val df = Seq(Seq("lowest", "low", "don't"), Seq("zz")).toDF("w")
    val withCodegen = df.select(Bpe.encodeTokens($"w", m).as("t")).as[Seq[String]].collect().toSeq
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interp = df.select(Bpe.encodeTokens($"w", m).as("t")).as[Seq[String]].collect().toSeq
      assert(withCodegen === interp)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("model save/load round-trips to identical encodings") {
    val docs = Seq((1L, "sort merge join sort merge scan scan sort")).toDF("id", "text")
    val m = Bpe.train(docs, col("text"), numMerges = 8, maxWords = 50)
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe").toString
    Bpe.saveModel(spark, m, dir)
    val loaded = Bpe.loadModel(spark, dir)
    assert(loaded.merges.toSeq === m.merges.toSeq)
    val words = Seq(Seq("sorting", "merges", "scanner")).toDF("w")
    val a = words.select(Bpe.encodeTokens($"w", m).as("t")).as[Seq[String]].collect()
    val b = words.select(Bpe.encodeTokens($"w", loaded).as("t")).as[Seq[String]].collect()
    assert(a.toSeq === b.toSeq, "loaded model encodes bit-identically")
  }

  test("plugs into the tokenizer seam: chunking and token counts in BPE units") {
    val docs = Seq(
      (1L, "alpha beta alpha beta alpha beta alpha beta"),
      (2L, "")
    ).toDF("doc_id", "text")
    val m = Bpe.train(docs, col("text"), numMerges = 20, maxWords = 100, minPairCount = 1)
    val tok = Bpe.tokenizer(m)
    // counts are in subword units: at least the word count, at most chars
    val counts = docs.select($"doc_id",
      TextAnalysis.tokenCount($"text", tok).as("c")).as[(Long, Int)].collect().toMap
    assert(counts(1L) >= 8, "BPE count >= word count")
    assert(counts(2L) === 0)
    // chunking under the BPE tokenizer: windows are counted in bpe tokens
    val chunks = Pack.chunkTokens(docs, "doc_id", "text", window = 4, stride = 4, tokenizer = tok)
    val joined = chunks.orderBy("doc_id", "chunk_idx")
      .agg(concat_ws("", collect_list(regexp_replace(col("chunk_text"), " ", ""))).as("all"))
      .as[String].collect().head
    assert(joined === "alphabetaalphabetaalphabetaalphabeta",
      "chunk coverage at stride==window is exact in BPE space")
  }
}
