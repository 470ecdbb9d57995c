package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{WordPieceEncodeWords, WordPieceVocab}

/** Trainable WordPiece subword tokenizer (Schuster & Nakajima 2012; the
  * BERT vocabulary, Devlin et al. 2019) — the third production subword
  * model behind the engine-wide tokenizer seam, completing the family:
  * [[Bpe]] merges by raw pair FREQUENCY, [[Unigram]] prunes under an EM
  * likelihood, WordPiece merges by LIKELIHOOD GAIN — the pair whose
  * merge most increases a unigram LM's corpus likelihood, i.e. the one
  * maximizing `count(ab) / (count(a) * count(b))` (the published
  * training rule). High-frequency-but-predictable pairs (both halves
  * common everywhere) rank below rarer pairs that almost always occur
  * together — the practical difference from BPE.
  *
  * Same two-phase scale shape as [[Bpe.train]]/[[Unigram.train]] — ONLY
  * phase 1 sees the corpus:
  *
  *  1. DISTRIBUTED word-frequency table: one `groupBy(word).count()`
  *     with map-side combine, top `maxWords` by (count desc, word asc)
  *     planned as a TakeOrderedAndProject heap. The driver holds at
  *     most `maxWords` (word, count) pairs, never corpus text.
  *  2. DRIVER merge loop over that bounded dictionary, scored by
  *     likelihood gain; ties break to the lexicographically smallest
  *     pair — training is deterministic for a given corpus. Cost
  *     O(numMerges x total symbols), independent of corpus size.
  *
  * Word-internal symbols carry the `##` continuation prefix from the
  * start (BERT convention), so the final vocabulary is directly the
  * greedy matcher's alphabet: bare tokens match word-initially, `##`
  * tokens word-internally. Encoding ([[WordPieceEncodeWords]]) is
  * greedy longest-match-first — vocab SET semantics, no merge ranks at
  * encode time (the published WordpieceTokenizer behavior, and why a
  * WordPiece vocab is portable as a plain token list).
  */
object WordPiece {

  /** Token set + unknown token; ALL encode behavior derives from it. */
  final case class Model(tokens: Array[String], unkToken: String = "[UNK]") {
    @transient lazy val vocab: WordPieceVocab = new WordPieceVocab(tokens, unkToken)
  }

  /** Train on `textCol` under `tokenizer` (default: the same
    * subword-friendly pre-tokenizer the other two models train under —
    * punctuation splits from words before the subword model sees it). */
  def train(df: DataFrame, textCol: Column, numMerges: Int,
            maxWords: Int = 50000, minPairCount: Long = 2,
            unkToken: String = "[UNK]",
            tokenizer: Column => Column = TextAnalysis.regexTokens): Model = {
    require(numMerges >= 0, "numMerges must be >= 0")
    require(maxWords > 0, "maxWords must be > 0")
    val wc = df.select(explode(tokenizer(textCol)).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc)
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    trainOnDict(wc, numMerges, minPairCount, unkToken)
  }

  /** The driver merge loop, exposed for spec-level verification against
    * hand-worked dictionaries. */
  private[graft] def trainOnDict(wordCounts: Array[(String, Long)], numMerges: Int,
                                 minPairCount: Long, unkToken: String): Model = {
    // each word as its symbol sequence: first code point bare, the rest
    // ##-prefixed — the BERT decomposition, so merges and the final
    // vocab live directly in the matcher's alphabet
    val words: Array[scala.collection.mutable.ArrayBuffer[String]] =
      wordCounts.map { case (w, _) =>
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < w.length) {
          val cp = w.codePointAt(i)
          val n = Character.charCount(cp)
          buf += (if (i == 0) w.substring(i, i + n) else "##" + w.substring(i, i + n))
          i += n
        }
        buf
      }
    val counts = wordCounts.map(_._2)

    // base alphabet: every symbol of the initial decomposition — greedy
    // encode then covers every trained word end-to-end by construction
    val vocabSet = scala.collection.mutable.LinkedHashSet.empty[String]
    words.foreach(_.foreach(vocabSet += _))
    val alphabet = vocabSet.toArray.sorted
    val merged = scala.collection.mutable.ArrayBuffer.empty[String]

    /** merging `a` with continuation `b` concatenates a's text with b's
      * body; the result inherits a's word position (bare or ##) */
    def join(a: String, b: String): String =
      a + (if (b.startsWith("##")) b.substring(2) else b)

    var iter = 0
    var done = false
    while (iter < numMerges && !done) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      val symCounts = scala.collection.mutable.HashMap.empty[String, Long]
      var wi = 0
      while (wi < words.length) {
        val syms = words(wi)
        val c = counts(wi)
        var i = 0
        while (i < syms.length) {
          symCounts.update(syms(i), symCounts.getOrElse(syms(i), 0L) + c)
          if (i < syms.length - 1) {
            val k = (syms(i), syms(i + 1))
            pairCounts.update(k, pairCounts.getOrElse(k, 0L) + c)
          }
          i += 1
        }
        wi += 1
      }
      // best likelihood gain: count(ab) / (count(a)*count(b)); ties ->
      // higher pair count, then lexicographically smallest (a, b) —
      // fully deterministic
      var best: (String, String) = null
      var bestScore = Double.NegativeInfinity
      var bestCount = Long.MinValue
      pairCounts.foreach { case (k, pc) =>
        if (pc >= minPairCount) {
          val s = pc.toDouble / (symCounts(k._1).toDouble * symCounts(k._2).toDouble)
          val better = s > bestScore ||
            (s == bestScore && (pc > bestCount ||
              (pc == bestCount && (best == null ||
                k._1 < best._1 || (k._1 == best._1 && k._2 < best._2)))))
          if (better) { best = k; bestScore = s; bestCount = pc }
        }
      }
      if (best == null) done = true
      else {
        val (a, b) = best
        val ab = join(a, b)
        merged += ab
        var wj = 0
        while (wj < words.length) {
          val syms = words(wj)
          if (syms.length >= 2) {
            val next = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
                next += ab; i += 2
              } else { next += syms(i); i += 1 }
            }
            words(wj) = next
          }
          wj += 1
        }
        iter += 1
      }
    }
    Model((alphabet ++ merged).distinct, unkToken)
  }

  /** Subword tokens of a word-array column (greedy longest match per
    * word; `##` marks continuations, unmatchable words emit the unknown
    * token). */
  def encodeTokens(words: Column, model: Model): Column =
    WordPieceEncodeWords(words, model.vocab)

  /** A `tokenizer: Column => Column` for the engine-wide seam — drop-in
    * for the `tokenizer` parameter of [[Pack.chunkTokens]],
    * [[TextAnalysis.tokenCount]], quality scores, etc. */
  def tokenizer(model: Model,
                base: Column => Column = TextAnalysis.regexTokens): Column => Column =
    text => encodeTokens(base(text), model)

  /** Per-row WordPiece token count — the budget knob for
    * [[Pack.byTokenBudget]]'s `tokenCol` seam. */
  def tokenCount(text: Column, model: Model,
                 base: Column => Column = TextAnalysis.regexTokens): Column =
    size(encodeTokens(base(text), model))

  /** Persist as parquet (token, kind) — `kind` separates the unknown
    * token from real vocabulary rows, so any unk spelling round-trips.
    * A loaded model encodes bit-identically (vocab-set semantics: no
    * ranks to preserve). */
  def saveModel(spark: SparkSession, model: Model, path: String): Unit = {
    import spark.implicits._
    (model.tokens.toSeq.map((_, "token")) :+ (model.unkToken, "unk"))
      .toDF("token", "kind")
      .repartition(1).write.mode("overwrite").parquet(path)
  }

  def loadModel(spark: SparkSession, path: String): Model = {
    // vocabSize rows of one short string — driver-bounded by construction
    val rows = spark.read.parquet(path)
      .select(col("token"), col("kind")).orderBy(col("token"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val (unk, real) = rows.partition(_._2 == "unk")
    Model(real.map(_._1), unk.headOption.map(_._1).getOrElse("[UNK]"))
  }

  // ---- published vocab.txt interchange (BERT) ----------------------------

  /** Load a BERT-style `vocab.txt` — the published WordPiece artifact
    * (one token per line; the LINE INDEX is the token id; `##` marks
    * continuations; `[UNK]` is the unknown token; other `[...]` control
    * tokens — [PAD]/[CLS]/[SEP]/[MASK] — are protocol ids that stay in
    * the id table but, like every vocab entry, only ever match their
    * literal spelling in text). Loads into the existing [[Model]] seam
    * so token budgets count in the production encoder's units; returns
    * (model, token → id) — ids are what a training pipeline ships.
    * Driver-bounded: a vocab.txt is ≤ ~100k short lines. */
  def importVocabTxt(spark: SparkSession, path: String): (Model, Map[String, Int]) = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val lines = try {
      val r = new java.io.BufferedReader(
        new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))
      val b = Array.newBuilder[String]
      var line = r.readLine()
      while (line != null) { b += line; line = r.readLine() }
      b.result()
    } finally in.close()
    // ids are LINE indexes, so even a trailing blank line must not shift
    // them — published files end with a newline; only fully trailing
    // blanks drop (an INTERIOR blank line is a real, if odd, token slot)
    val trimmed = lines.reverse.dropWhile(_.isEmpty).reverse
    require(trimmed.nonEmpty, s"$path is empty — not a vocab.txt")
    require(trimmed.distinct.length == trimmed.length,
      s"$path has duplicate tokens — ids would be ambiguous")
    val ids = trimmed.zipWithIndex.toMap
    require(trimmed.contains("[UNK]"),
      s"$path carries no [UNK] token — not a WordPiece vocab.txt?")
    (Model(trimmed.filter(_ != "[UNK]"), "[UNK]"), ids)
  }

  /** Write the published layout: `[UNK]` then the vocabulary in array
    * order, one token per line — the companion of [[importVocabTxt]],
    * so round-trip fixtures take the exact artifact path a checkpoint
    * directory would. */
  def exportVocabTxt(spark: SparkSession, model: Model, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try {
      val w = new java.io.OutputStreamWriter(out, java.nio.charset.StandardCharsets.UTF_8)
      w.write(model.unkToken); w.write('\n')
      model.tokens.foreach { t => w.write(t); w.write('\n') }
      w.flush()
    } finally out.close()
  }
}
