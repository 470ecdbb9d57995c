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

  // ---- SentencePiece .model interchange ---------------------------------

  /** SentencePiece piece types (public: sentencepiece_model.proto —
    * NORMAL=1, UNKNOWN=2, CONTROL=3, USER_DEFINED=4, UNUSED=5, BYTE=6).
    * NORMAL/USER_DEFINED/BYTE pieces carry segmentation probability;
    * CONTROL pieces (<s>, </s>, …) are the caller's protocol tokens and
    * never segment text, so the import keeps them OUT of the Viterbi
    * table. */
  private val SpNormal = 1
  private val SpUnknown = 2
  private val SpControl = 3
  private val SpUserDefined = 4
  private val SpByte = 6

  /** SentencePiece's word-boundary convention for the pre-tokenizer
    * seam: whitespace-split, each word prefixed with '▁' (U+2581 — the
    * add_dummy_prefix + treat-space-as-piece-prefix behavior every
    * published unigram .model assumes). Segmenting per ▁-word equals
    * whole-sentence Viterbi whenever pieces carry '▁' only as a prefix
    * — which is how published models are trained; a piece with an
    * INTERIOR '▁' could span words and would diverge. Budgets counted
    * under an imported model are only comparable to the production
    * tokenizer when this pre-tokenization matches — same contract as
    * [[Bpe.gpt2PreTokens]]. */
  def spPreTokens(text: Column): Column =
    transform(
      filter(split(text, "\\s+"), w => length(w) > 0),
      w => concat(lit("▁"), w))

  /** Load a SentencePiece `.model` file (the published protobuf
    * artifact next to every SentencePiece/Unigram checkpoint — T5,
    * Llama-family, mT5 all ship one) into the existing [[Model]] seam,
    * so [[Pack.byTokenBudget]]/token counts run in the PRODUCTION
    * model's units. The wire format is public (protobuf encoding +
    * sentencepiece_model.proto): ModelProto field 1 = repeated
    * SentencePiece{piece=1 string, score=2 float, type=3 enum,
    * default NORMAL}; scores are log probabilities — exactly this
    * Model's table. Parsed with a ~40-line varint/length-delimited
    * reader because the environment ships no protobuf library; unknown
    * fields skip by wire type, so real files (which also carry
    * trainer_spec etc.) load cleanly. Driver-bounded: a .model is the
    * vocab table, megabytes at most. */
  def loadSentencePiece(spark: SparkSession, path: String): Model = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val bytes = try {
      val len = fs.getFileStatus(p).getLen
      require(len <= (64L << 20), s".model file suspiciously large: $len bytes")
      val b = new Array[Byte](len.toInt)
      in.readFully(b)
      b
    } finally in.close()
    var pos = 0
    def varint(): Long = {
      var shift = 0; var v = 0L
      var more = true
      while (more) {
        require(pos < bytes.length && shift < 64, s"truncated varint at $pos")
        val b = bytes(pos); pos += 1
        v |= (b & 0x7fL) << shift
        shift += 7
        more = (b & 0x80) != 0
      }
      v
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint(); ()
      case 1 => pos += 8
      case 2 =>
        // read the length FIRST: `pos += varint()` would capture the left
        // operand before varint() advances pos past the length bytes
        val n = varint().toInt
        pos += n
      case 5 => pos += 4
      case w => throw new IllegalArgumentException(s"unsupported wire type $w at $pos")
    }
    val pieces = Array.newBuilder[(String, Double, Int)]
    def parsePiece(end: Int): Unit = {
      var piece: String = null
      var score = 0.0
      var tpe = SpNormal // proto3 default when the field is omitted… spec default is NORMAL(=1)
      while (pos < end) {
        val tag = varint()
        val (fld, wt) = ((tag >>> 3).toInt, (tag & 7).toInt)
        (fld, wt) match {
          case (1, 2) =>
            val n = varint().toInt
            piece = new String(bytes, pos, n, java.nio.charset.StandardCharsets.UTF_8)
            pos += n
          case (2, 5) =>
            score = java.lang.Float.intBitsToFloat(
              (bytes(pos) & 0xff) | ((bytes(pos + 1) & 0xff) << 8) |
                ((bytes(pos + 2) & 0xff) << 16) | ((bytes(pos + 3) & 0xff) << 24)).toDouble
            pos += 4
          case (3, 0) => tpe = varint().toInt
          case (_, w) => skip(w)
        }
      }
      require(piece != null, "SentencePiece entry without a piece string")
      pieces += ((piece, score, tpe))
    }
    while (pos < bytes.length) {
      val tag = varint()
      val (fld, wt) = ((tag >>> 3).toInt, (tag & 7).toInt)
      if (fld == 1 && wt == 2) {
        val n = varint().toInt
        val end = pos + n
        parsePiece(end)
        require(pos == end, s"SentencePiece submessage overran at $pos != $end")
      } else skip(wt)
    }
    val all = pieces.result()
    require(all.nonEmpty, s"$path carries no pieces — not a SentencePiece model?")
    val segmentable = all.filter(t =>
      t._3 == SpNormal || t._3 == SpUserDefined || t._3 == SpByte)
    require(segmentable.nonEmpty, s"$path has no segmentable (NORMAL) pieces")
    val unk = all.find(_._3 == SpUnknown).map(_._2.toDouble)
      // real models carry <unk> score 0 with segmentation handled by the
      // library's unk penalty; a 0.0 log-prob would make unknowns FREE —
      // floor it below the worst real piece like the trainer does
      .map(s => if (s >= 0.0) segmentable.map(_._2).min - 10.0 else s)
      .getOrElse(-20.0)
    Model(segmentable.map(t => (t._1, t._2)), unk)
  }

  /** Write `model` as a minimal SentencePiece `.model` protobuf (one
    * UNKNOWN piece then the table as NORMAL pieces) — the companion of
    * [[loadSentencePiece]], so round-trip fixtures exercise the exact
    * artifact path a published checkpoint takes. */
  def exportSentencePiece(spark: SparkSession, model: Model, path: String): Unit = {
    val out = new java.io.ByteArrayOutputStream(model.tokens.length * 16 + 64)
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    def pieceBytes(piece: String, score: Float, tpe: Int): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream(piece.length + 16)
      val pb = piece.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      b.write(0x0a); // field 1, wire 2
      { var v = pb.length.toLong
        while ((v & ~0x7fL) != 0) { b.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
        b.write(v.toInt) }
      b.write(pb)
      b.write(0x15) // field 2, wire 5 (fixed32)
      val bits = java.lang.Float.floatToIntBits(score)
      b.write(bits & 0xff); b.write((bits >>> 8) & 0xff)
      b.write((bits >>> 16) & 0xff); b.write((bits >>> 24) & 0xff)
      b.write(0x18) // field 3, wire 0
      b.write(tpe)
      b.toByteArray
    }
    def writePiece(bytes: Array[Byte]): Unit = {
      out.write(0x0a) // ModelProto field 1, wire 2
      varint(bytes.length.toLong)
      out.write(bytes)
    }
    writePiece(pieceBytes("<unk>", model.unkLogProb.toFloat, SpUnknown))
    model.tokens.foreach { case (tok, logp) =>
      writePiece(pieceBytes(tok, logp.toFloat, SpNormal))
    }
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val os = fs.create(p, true)
    try os.write(out.toByteArray) finally os.close()
  }
}
