package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{UnigramEncodeWords, UnigramVocab}

/** Trainable unigram-LM subword tokenizer (Kudo 2018, the SentencePiece
  * unigram model) — the other half of real-world tokenization next to
  * [[Bpe]]: where BPE grows a vocab bottom-up by merging, unigram
  * starts from an over-complete candidate set and PRUNES it down under
  * an EM-estimated token probability model, then encodes by Viterbi
  * (max-likelihood segmentation) instead of greedy merges.
  *
  * Same two-phase scale shape as [[Bpe.train]] — ONLY phase 1 sees the
  * corpus:
  *
  *  1. DISTRIBUTED word-frequency table: one `groupBy(word).count()`
  *     with map-side combine, top `maxWords` by (count desc, word asc)
  *     planned as a TakeOrderedAndProject heap. The driver holds at
  *     most `maxWords` (word, count) pairs, never corpus text.
  *  2. DRIVER EM + prune loop over that bounded dictionary:
  *     - seed: every substring of dictionary words up to `maxTokenCp`
  *       code points, scored by frequency-weighted occurrence, top
  *       `seedSize` kept — PLUS every single code point (coverage is
  *       structural, every dictionary word stays segmentable);
  *     - EM: forward-backward over each word's segmentation lattice
  *       (log-space, O(len x maxTokenCp) per word) gives expected token
  *       counts; M-step renormalizes token probabilities;
  *     - prune: drop the lowest-expected-count multi-char tokens
  *       (`pruneFraction` per round — the established expected-count
  *       ranking simplification of SentencePiece's leave-one-out loss)
  *       until `vocabSize` remains, then a final EM polish.
  *     Cost is O(emRounds x totalDictChars x maxTokenCp), bounded by
  *     `maxWords`, independent of corpus size.
  *
  * Training is deterministic: every ordering ties to (count desc,
  * token asc), so a given corpus yields byte-identical models.
  *
  * Encoding ([[UnigramEncodeWords]]) is a narrow codegen'd map with the
  * (token -> logp) table riding as a reference object — no shuffle, no
  * UDF. Unknown code points emit as themselves at `unkLogProb`, so
  * concatenating a word's tokens always reproduces the word.
  */
object Unigram {

  /** (token, log-probability) table + the unknown-code-point penalty;
    * ALL encode behavior derives from it. */
  final case class Model(tokens: Array[(String, Double)], unkLogProb: Double) {
    @transient lazy val vocab: UnigramVocab = new UnigramVocab(tokens, unkLogProb)
  }

  /** Train on `textCol` under `tokenizer` (default: the same
    * subword-friendly pre-tokenizer BPE trains under — punctuation
    * splits from words before the subword model sees it). */
  def train(df: DataFrame, textCol: Column, vocabSize: Int,
            maxWords: Int = 50000, maxTokenCp: Int = 8,
            emIters: Int = 2, pruneFraction: Double = 0.2,
            tokenizer: Column => Column = TextAnalysis.regexTokens): Model = {
    require(vocabSize > 0, "vocabSize must be > 0")
    require(maxWords > 0, "maxWords must be > 0")
    require(maxTokenCp >= 1, "maxTokenCp must be >= 1")
    require(pruneFraction > 0 && pruneFraction < 1, "pruneFraction in (0,1)")
    val wc = df.select(explode(tokenizer(textCol)).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc)
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    trainOnDict(wc, vocabSize, maxTokenCp, emIters, pruneFraction)
  }

  /** The driver EM + prune loop, exposed for spec-level verification
    * against hand-worked dictionaries. */
  private[graft] def trainOnDict(wordCounts: Array[(String, Long)], vocabSize: Int,
                                 maxTokenCp: Int, emIters: Int,
                                 pruneFraction: Double): Model = {
    if (wordCounts.isEmpty) return Model(Array.empty, -20.0)

    // words as code-point boundary arrays (surrogate-safe)
    val words = wordCounts.map(_._1)
    val counts = wordCounts.map(_._2.toDouble)
    val bounds: Array[Array[Int]] = words.map { w =>
      val b = scala.collection.mutable.ArrayBuffer.empty[Int]
      var i = 0
      b += 0
      while (i < w.length) { i += Character.charCount(w.codePointAt(i)); b += i }
      b.toArray
    }

    // ---- seed: substring candidates + all single code points ----
    val seedCounts = scala.collection.mutable.HashMap.empty[String, Double]
    var wi = 0
    while (wi < words.length) {
      val w = words(wi); val b = bounds(wi); val c = counts(wi)
      val n = b.length - 1
      var j = 0
      while (j < n) {
        var i = j + 1
        while (i <= n && i - j <= maxTokenCp) {
          val sub = w.substring(b(j), b(i))
          seedCounts.update(sub, seedCounts.getOrElse(sub, 0.0) + c)
          i += 1
        }
        j += 1
      }
      wi += 1
    }
    val singles: Set[String] = seedCounts.keysIterator.filter { t =>
      t.codePointCount(0, t.length) == 1
    }.toSet
    val seedSize = math.max(vocabSize * 4, singles.size + vocabSize)
    // top seedSize by (count desc, token asc); singles always in
    val multis = seedCounts.iterator.filter { case (t, _) => !singles.contains(t) }
      .toArray.sortBy { case (t, c) => (-c, t) }
      .take(math.max(0, seedSize - singles.size))
    var vocab: Array[String] =
      (singles.toArray.sorted ++ multis.map(_._1)).distinct
    var logp: collection.Map[String, Double] = {
      val tot = vocab.iterator.map(seedCounts).sum
      vocab.iterator.map(t => t -> math.log(seedCounts(t) / tot)).toMap
    }

    def logsumexp(a: Double, b: Double): Double =
      if (a == Double.NegativeInfinity) b
      else if (b == Double.NegativeInfinity) a
      else { val m = math.max(a, b); m + math.log(math.exp(a - m) + math.exp(b - m)) }

    /** One EM pass: expected token counts under current logp. */
    def eStep(): scala.collection.mutable.HashMap[String, Double] = {
      val lp = logp
      val exp = scala.collection.mutable.HashMap.empty[String, Double]
      var wi = 0
      while (wi < words.length) {
        val w = words(wi); val b = bounds(wi); val c = counts(wi)
        val n = b.length - 1
        val la = new Array[Double](n + 1)
        val lb = new Array[Double](n + 1)
        java.util.Arrays.fill(la, Double.NegativeInfinity)
        java.util.Arrays.fill(lb, Double.NegativeInfinity)
        la(0) = 0.0; lb(n) = 0.0
        var i = 1
        while (i <= n) {
          var j = math.max(0, i - maxTokenCp)
          while (j < i) {
            lp.get(w.substring(b(j), b(i))) match {
              case Some(s) => la(i) = logsumexp(la(i), la(j) + s)
              case None =>
            }
            j += 1
          }
          i += 1
        }
        var j2 = n - 1
        while (j2 >= 0) {
          var i2 = j2 + 1
          while (i2 <= n && i2 - j2 <= maxTokenCp) {
            lp.get(w.substring(b(j2), b(i2))) match {
              case Some(s) => lb(j2) = logsumexp(lb(j2), s + lb(i2))
              case None =>
            }
            i2 += 1
          }
          j2 -= 1
        }
        val z = la(n)
        if (z != Double.NegativeInfinity) {
          var j3 = 0
          while (j3 < n) {
            var i3 = j3 + 1
            while (i3 <= n && i3 - j3 <= maxTokenCp) {
              val sub = w.substring(b(j3), b(i3))
              lp.get(sub) match {
                case Some(s) =>
                  val post = math.exp(la(j3) + s + lb(i3) - z)
                  if (post > 0) exp.update(sub, exp.getOrElse(sub, 0.0) + c * post)
                case None =>
              }
              i3 += 1
            }
            j3 += 1
          }
        }
        wi += 1
      }
      exp
    }

    def mStep(exp: collection.Map[String, Double]): Unit = {
      val tot = vocab.iterator.map(t => exp.getOrElse(t, 0.0)).sum
      logp = vocab.iterator.map { t =>
        val e = exp.getOrElse(t, 0.0)
        // floor: a token never expected still needs a finite score while
        // it remains in the vocab (it may be a coverage single)
        t -> (if (e > 0) math.log(e / tot) else math.log(0.5 / tot))
      }.toMap
    }

    // ---- EM + prune until the vocab fits, then a final polish ----
    var iter = 0
    while (iter < emIters) { mStep(eStep()); iter += 1 }
    while (vocab.length > vocabSize) {
      val exp = eStep()
      mStep(exp)
      val multisNow = vocab.filter(t => !singles.contains(t))
      if (multisNow.isEmpty) {
        // singles alone exceed vocabSize — coverage wins over budget
        // (vocabSize is a target, losslessness is a guarantee)
        return finish(vocab, logp)
      }
      val dropN = math.min(
        math.max(1, (multisNow.length * pruneFraction).toInt),
        vocab.length - vocabSize)
      val dropped = multisNow
        .map(t => (exp.getOrElse(t, 0.0), t))
        .sortBy { case (e, t) => (e, t) } // lowest expected count first
        .take(dropN)
        .map(_._2)
        .toSet
      vocab = vocab.filter(t => !dropped.contains(t))
      mStep(eStep())
    }
    iter = 0
    while (iter < emIters) { mStep(eStep()); iter += 1 }
    finish(vocab, logp)
  }

  private def finish(vocab: Array[String],
                     logp: collection.Map[String, Double]): Model = {
    val toks = vocab.map(t => (t, logp(t))).sortBy(_._1)
    val minLp = if (toks.isEmpty) -10.0 else toks.iterator.map(_._2).min
    Model(toks, minLp - 10.0)
  }

  /** Subword tokens of a word-array column (Viterbi per word). */
  def encodeTokens(words: Column, model: Model): Column =
    UnigramEncodeWords(words, model.vocab)

  /** A `tokenizer: Column => Column` for the engine-wide seam — drop-in
    * for the `tokenizer` parameter of [[Pack.chunkTokens]],
    * [[TextAnalysis.tokenCount]], quality scores, etc. */
  def tokenizer(model: Model,
                base: Column => Column = TextAnalysis.regexTokens): Column => Column =
    text => encodeTokens(base(text), model)

  /** Per-row unigram token count — the budget knob for
    * [[Pack.byTokenBudget]]'s `tokenCol` seam. */
  def tokenCount(text: Column, model: Model,
                 base: Column => Column = TextAnalysis.regexTokens): Column =
    size(encodeTokens(base(text), model))

  /** Persist as parquet (token, logp); the unknown penalty rides as a
    * reserved empty-token row (real tokens are never empty — training
    * filters `length > 0`). A loaded model encodes bit-identically. */
  def saveModel(spark: SparkSession, model: Model, path: String): Unit = {
    import spark.implicits._
    (model.tokens.toSeq :+ ("", model.unkLogProb))
      .toDF("token", "logp")
      .repartition(1).write.mode("overwrite").parquet(path)
  }

  def loadModel(spark: SparkSession, path: String): Model = {
    // vocabSize rows of one short string + one double — driver-bounded
    val rows = spark.read.parquet(path)
      .select(col("token"), col("logp")).orderBy(col("token"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val (unk, real) = rows.partition(_._1.isEmpty)
    Model(real, unk.headOption.map(_._2).getOrElse(-20.0))
  }
}
