package graft

import graft.functions.{BigramKeys, LmVocab}
import graft.operators.LangModel
import org.apache.spark.sql.functions._

/** Bigram-LM perplexity (CCNet-style quality filter): bigram-key
  * emission, hand-worked probability math, junk-vs-reference
  * separation, and engine edge cases. */
class LangModelSpec extends SparkSpec {
  import spark.implicits._

  test("BigramKeys emits BOS-prefixed vocab-mapped keys; blanks emit nothing") {
    val v = new LmVocab(Array("a", "b"))
    val out = Seq(Seq("a", "b", "z", "a"), Seq.empty[String], Seq(""))
      .toDF("w").select(BigramKeys($"w", v).as("k")).as[Seq[String]].collect()
    assert(out(0) === Seq("<s> a", "a b", "b <unk>", "<unk> a"),
      "OOV maps to <unk> on BOTH sides of subsequent keys")
    assert(out(1) === Seq.empty)
    assert(out(2) === Seq.empty, "empty-string token (split of blank) is skipped")
  }

  test("interpreted and codegen paths agree") {
    val v = new LmVocab(Array("x"))
    val df = Seq(Seq("x", "y", "x"), Seq("q")).toDF("w")
    val gen = df.select(BigramKeys($"w", v).as("k")).as[Seq[String]].collect().toSeq
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interp = df.select(BigramKeys($"w", v).as("k")).as[Seq[String]].collect().toSeq
      assert(gen === interp)
    } finally prev match {
      case Some(x) => spark.conf.set("spark.sql.codegen.factoryMode", x)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("perplexity reproduces the hand-worked bigram math") {
    // reference: one doc "a b a b". vocab (maxVocab=10) = {a, b}; V = 3.
    // bigrams: <s> a:1, a b:2, b a:1  -> contexts <s>:1, a:2, b:1
    val ref = Seq((1L, "a b a b")).toDF("id", "text")
    val lm = LangModel.train(ref, col("text"), maxVocab = 10, alpha = 0.5)
    assert(lm.vSize === 3)
    // target "a b": lp1 = ln((1+.5)/(1+1.5)) = ln(0.6)
    //               lp2 = ln((2+.5)/(2+1.5)) = ln(2.5/3.5)
    val h = -(math.log(1.5 / 2.5) + math.log(2.5 / 3.5)) / 2
    val row = LangModel.perplexity(Seq((7L, "a b")).toDF("id", "text"), "id", "text", lm)
      .collect().head
    assert(row.getInt(1) === 2)
    assert(row.getDouble(2) === BigDecimal(h).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(row.getDouble(3) === BigDecimal(math.exp(h)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("unseen bigrams fall back to the smoothed floor (left-join nulls)") {
    val ref = Seq((1L, "a b a b")).toDF("id", "text")
    val lm = LangModel.train(ref, col("text"), maxVocab = 10, alpha = 0.5)
    // "z z": both tokens OOV. "<s> <unk>" is unseen (cb=0) but its
    // CONTEXT was trained (cw(<s>)=1) -> lp1 = ln(0.5/2.5); "<unk> <unk>"
    // has neither (cb=0, cw=0) -> lp2 = ln(0.5/1.5)
    val h = -(math.log(0.5 / 2.5) + math.log(0.5 / 1.5)) / 2
    val row = LangModel.perplexity(Seq((9L, "z z")).toDF("id", "text"), "id", "text", lm)
      .collect().head
    assert(row.getDouble(2) === BigDecimal(h).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("reference-like text scores far below shuffled junk (the filter signal)") {
    val sent = "the cat sat on the mat and the dog sat on the rug"
    val ref = (1L to 20L).map(i => (i, sent)).toDF("id", "text")
    val lm = LangModel.train(ref, col("text"), maxVocab = 100, alpha = 0.5)
    val target = Seq(
      (100L, "the cat sat on the rug"),           // reference-like
      (101L, "rug the on mat sat dog cat the")    // same words, junk order
    ).toDF("id", "text")
    val ppl = LangModel.perplexity(target, "id", "text", lm)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(ppl(100L) * 3 < ppl(101L),
      s"junk should score >=3x reference-like, got $ppl")
  }

  test("Kneser–Ney reproduces the hand-worked interpolation math") {
    // ref "a b a b": bigrams {<s> a:1, a b:2, b a:1}; contexts <s>:1,
    // a:2, b:1; followers all 1; continuation a:2 (<s>,b), b:1 (a);
    // NB=3 types, V=3 -> Pcont denominator 6. D=0.75.
    val ref = Seq((1L, "a b a b")).toDF("id", "text")
    val lm = LangModel.trainKn(ref, col("text"), maxVocab = 10)
    assert(lm.nBigramTypes === 3 && lm.vSize === 3)
    // "a b": p(<s> a) = (1-.75 + .75*1*(3/6))/1 = .625
    //        p(a b)  = (2-.75 + .75*1*(2/6))/2 = .75
    val h = -(math.log(0.625) + math.log(0.75)) / 2
    val row = LangModel.perplexityKn(Seq((7L, "a b")).toDF("id", "text"), "id", "text", lm)
      .collect().head
    assert(row.getInt(1) === 2)
    assert(row.getDouble(2) === BigDecimal(h).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // "z z": seen context <s> -> .75*1*(1/6)=.125; unseen context -> 1/6
    val h2 = -(math.log(0.125) + math.log(1.0 / 6)) / 2
    val row2 = LangModel.perplexityKn(Seq((9L, "z z")).toDF("id", "text"), "id", "text", lm)
      .collect().head
    assert(row2.getDouble(2) === BigDecimal(h2).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("KN continuation: versatile-context words beat one-context words where add-α is blind") {
    // francisco and cat occur equally often (3x), but francisco only
    // ever follows san (1 predecessor) while cat follows the/a/my (3).
    val ref = Seq((1L,
      "san francisco san francisco san francisco the cat a cat my cat"))
      .toDF("id", "text")
    val kn = LangModel.trainKn(ref, col("text"), maxVocab = 20)
    def pplKn(t: String) = LangModel
      .perplexityKn(Seq((1L, t)).toDF("id", "text"), "id", "text", kn)
      .collect().head.getDouble(3)
    // after an unseen context, KN backs off to the continuation
    // distribution: cat (3 predecessors) must be cheaper than francisco
    assert(pplKn("zzz cat") < pplKn("zzz francisco"),
      "continuation counts must discriminate")
    // add-α scores both identically (unseen context + unseen bigram is
    // unigram-blind) — the exact gap KN exists to close
    val add = LangModel.train(ref, col("text"), maxVocab = 20, alpha = 0.5)
    def pplAdd(t: String) = LangModel
      .perplexity(Seq((1L, t)).toDF("id", "text"), "id", "text", add)
      .collect().head.getDouble(3)
    assert(pplAdd("zzz cat") === pplAdd("zzz francisco"))
  }

  test("KN separates reference-like from junk at least as sharply as add-α") {
    val sent = "the cat sat on the mat and the dog sat on the rug"
    val ref = (1L to 20L).map(i => (i, sent)).toDF("id", "text")
    val lm = LangModel.trainKn(ref, col("text"), maxVocab = 100)
    val target = Seq(
      (100L, "the cat sat on the rug"),
      (101L, "rug the on mat sat dog cat the")).toDF("id", "text")
    val ppl = LangModel.perplexityKn(target, "id", "text", lm)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(ppl(100L) * 3 < ppl(101L), s"junk should score >=3x, got $ppl")
  }

  test("perplexityBuckets: per-group terciles, ties to the lower bucket") {
    val scored = ((1 to 9).map(i => (i.toLong, "en", i.toDouble)) ++
      (1 to 6).map(i => (100L + i, "de", 10.0 * i))).toDF("id", "lang", "perplexity")
    val b = LangModel.perplexityBuckets(scored, Seq("lang"))
      .select("id", "bucket").as[(Long, String)].collect().toMap
    // en: 9 values 1..9 -> t1 at idx (9-1)/3 ~ 3.67, t2 ~ 6.33
    assert((1L to 3L).forall(b(_) == "head"))
    assert((4L to 6L).forall(b(_) == "middle"))
    assert((7L to 9L).forall(b(_) == "tail"))
    // de thresholds are independent of en's scale
    assert(b(101L) === "head" && b(106L) === "tail")
    intercept[IllegalArgumentException] {
      LangModel.perplexityBuckets(scored, Seq("lang"), q1 = 0.8, q2 = 0.2)
    }
  }

  test("zero-token docs emit nothing; output is deterministic") {
    val ref = Seq((1L, "a b")).toDF("id", "text")
    val lm = LangModel.train(ref, col("text"), maxVocab = 10)
    val t = Seq((1L, "a"), (2L, "   "), (3L, "")).toDF("id", "text")
    val out = LangModel.perplexity(t, "id", "text", lm).orderBy("id")
    assert(out.select("id").as[Long].collect().toSeq === Seq(1L),
      "blank docs have no bigrams to score")
    val again = LangModel.perplexity(t, "id", "text", lm).orderBy("id")
    assert(out.collect().toSeq === again.collect().toSeq)
  }

  test("save/load round-trip: a loaded bigram LM scores bit-identically") {
    val ref = Seq("a b a b c", "a b c a", "b c b a").toDF("text")
    val t = Seq((1, "a b c"), (2, "c b a z"), (3, "a a a")).toDF("id", "text")
    val lm = LangModel.train(ref, col("text"), maxVocab = 3)
    val path = java.nio.file.Files.createTempDirectory("graft_lm_rt").toString
    LangModel.save(spark, lm, path)
    val loaded = LangModel.load(spark, path)
    assert(loaded.vocab.tokens.toSeq === lm.vocab.tokens.toSeq,
      "vocabulary content and ORDER survive the round trip")
    assert(loaded.alpha === lm.alpha)
    val fresh = LangModel.perplexity(t, "id", "text", lm).orderBy("id").collect().toSeq
    val again = LangModel.perplexity(t, "id", "text", loaded).orderBy("id").collect().toSeq
    assert(fresh === again, "loaded-model scores differ from the trainer's")
  }

  test("saveKn/loadKn round-trip: loaded KN model scores bit-identically, cross-input") {
    // train on one corpus, score ANOTHER through both the in-memory and
    // the reloaded model — the train-once / score-every-snapshot contract
    val ref = Seq("a b a b c d", "a b c a d b", "b c b a a d").toDF("text")
    val lm = LangModel.trainKn(ref, col("text"), maxVocab = 4)
    val path = java.nio.file.Files.createTempDirectory("graft_knlm_rt").toString
    LangModel.saveKn(spark, lm, path)
    val loaded = LangModel.loadKn(spark, path)
    assert(loaded.nBigramTypes === lm.nBigramTypes)
    assert(loaded.discount === lm.discount)
    val other = Seq((1, "a b d c"), (2, "z z a b"), (3, "d a c b a")).toDF("id", "text")
    val fresh = LangModel.perplexityKn(other, "id", "text", lm).orderBy("id").collect().toSeq
    val again = LangModel.perplexityKn(other, "id", "text", loaded).orderBy("id").collect().toSeq
    assert(fresh === again, "loaded KN model scores differ from the trainer's")
  }
}
